"""exon-tpu: a TPU-native vectorized query engine for bioinformatics data.

Brand-new engine with the capabilities of wheretrue/exon (SQL access to
FASTA/FASTQ/VCF/BAM/GFF/mzML/… data), redesigned TPU-first: host decoders
stage fixed-shape device columns; filter / aggregate / sort / join execute
as JAX/XLA/Pallas kernels; multi-host scaling uses jax.sharding meshes with
all_to_all shuffles (see exon_tpu.parallel).
"""

import jax as _jax

# Engine-wide requirement: schemas carry Int64 positions/counts (Arrow
# parity); enable 64-bit types before any jnp use. Hot kernels still use
# int32 internally where it matters for TPU speed.
_jax.config.update("jax_enable_x64", True)

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
