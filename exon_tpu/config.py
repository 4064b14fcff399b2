"""Session configuration (reference: exon-core/src/config/mod.rs:24-78).

``SessionConfig`` carries the engine knobs; the ``exon.``-prefixed flags are
settable at runtime through ``SET exon.<flag> = <bool>`` in SQL, mirroring
ExonConfigExtension (config/mod.rs:65-78,130-137).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class SessionConfig:
    batch_size: int = 8192                     # DEFAULT_BATCH_SIZE (output granularity)
    # rows per *device* batch on the scan path: large batches amortize
    # host→device transfer + dispatch latency (the TPU analog of the
    # reference's 8192-row Arrow batches; results are identical either way)
    device_batch_size: int = 1 << 17
    target_partitions: int = 0                 # 0 → device/host-parallel default
    catalog: str = "public"
    schema: str = "exon"

    # exon.* extension flags (config/mod.rs:65-78)
    vcf_parse_info: bool = False
    vcf_parse_formats: bool = False
    sam_parse_tags: bool = False
    bam_parse_tags: bool = False
    cram_parse_tags: bool = False

    def __post_init__(self):
        if self.target_partitions <= 0:
            self.target_partitions = os.cpu_count() or 1

    _EXON_FLAGS = ("vcf_parse_info", "vcf_parse_formats", "sam_parse_tags",
                   "bam_parse_tags", "cram_parse_tags")

    def set_option(self, key: str, value: str) -> None:
        if key.startswith("exon."):
            flag = key[len("exon."):]
            if flag not in self._EXON_FLAGS:
                raise KeyError(f"unknown exon option {key}")
            setattr(self, flag, str(value).lower() in ("true", "1", "yes"))
        elif key in ("batch_size", "target_partitions"):
            setattr(self, key, int(value))
        else:
            raise KeyError(f"unknown option {key}")


def new_exon_config(**kwargs) -> SessionConfig:
    return SessionConfig(**kwargs)
