"""exon-tpu: a TPU-native vectorized query engine for bioinformatics data.

Brand-new engine with the capabilities of wheretrue/exon (SQL access to
FASTA/FASTQ/VCF/BAM/GFF/mzML/… data), redesigned TPU-first: host decoders
stage fixed-shape device columns; filter / aggregate / sort / join execute
as JAX/XLA/Pallas kernels; multi-host scaling uses jax.sharding meshes with
all_to_all shuffles (see exon_tpu.parallel).
"""

import os as _os

import jax as _jax

# Engine-wide requirement: schemas carry Int64 positions/counts (Arrow
# parity); enable 64-bit types before any jnp use. Hot kernels still use
# int32 internally where it matters for TPU speed.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: TPU kernel compiles are expensive
# (10-40s each on some runtimes); caching makes every query shape pay that
# once per machine, not once per process.
def _machine_tag() -> str:
    # key the cache by CPU feature set: XLA:CPU AOT artifacts compiled on
    # a different microarchitecture fail to load (cpu_aot_loader "machine
    # type doesn't match" errors) and can even SIGILL
    import hashlib
    import platform as _pf

    tag = _pf.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += hashlib.md5(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    return tag


_cache_dir = _os.environ.get(
    "EXON_TPU_XLA_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache",
                  "exon_tpu_xla_" + _machine_tag()))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from . import tracing  # EXON_LOG-configured logger
from .batch import Batch, Schema, DEFAULT_BATCH_SIZE
from .config import SessionConfig, new_exon_config
from .dataframe import DataFrame
from .errors import ExonError
from .plan.expressions import AggregateCall, col, lit

__version__ = "0.1.0"


def count(child=None):
    return AggregateCall("count", child)


def sum_(child):
    return AggregateCall("sum", child)


def min_(child):
    return AggregateCall("min", child)


def max_(child):
    return AggregateCall("max", child)


def avg(child):
    return AggregateCall("avg", child)


from .session import ExonSession  # noqa: E402  (after helpers to avoid cycles)

__all__ = [
    "ExonSession", "DataFrame", "SessionConfig", "new_exon_config",
    "Batch", "Schema", "col", "lit", "count", "sum_", "min_", "max_", "avg",
    "ExonError", "DEFAULT_BATCH_SIZE",
]
