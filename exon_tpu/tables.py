"""Table providers: tie format decoders + object store into scannable tables.

Mirrors the reference's Listing<FMT>Table family
(exon-core/src/datasources/<fmt>/table_provider.rs): a table is a URL
(file or directory), per-format options, and a ``scan(projection, filters)``
that yields a physical plan. Filter pushdown hooks (regions, hive partition
pruning) are resolved here before execution.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import numpy as np

from . import datatypes as dt
from .batch import Batch, Schema
from .errors import PlanError
from .io import resolve_table_files
from .io.compression import decompress, infer_compression
from .plan.expressions import Expr
from .plan.physical import PhysicalPlan, ScanExec


class TableProvider:
    def schema(self) -> Schema:
        raise NotImplementedError

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        raise NotImplementedError

    def supports_filter_pushdown(self, expr: Expr) -> str:
        """'exact' | 'inexact' | 'none' — mirrors DataFusion
        supports_filters_pushdown (e.g. vcf/table_provider.rs:299-320)."""
        return "none"


@dataclasses.dataclass
class FileTable(TableProvider):
    """Generic listing table over files decoded by a per-format module."""

    url: str
    fmt: "FormatSpec"
    options: object  # per-format options dataclass

    def schema(self) -> Schema:
        return self.fmt.schema(self.options)

    def files(self) -> list:
        ext = getattr(self.options, "file_extension", None)
        files = resolve_table_files(self.url, ext)
        if not files:
            # retry without extension filter for directly-named files
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection=None, filters=(), limit=None,
             prefix_hints=None, host_batches=False) -> PhysicalPlan:
        schema = self.schema()
        if projection is not None:
            schema = schema.project(projection)
        files = self.files()
        fmt, options = self.fmt, self.options
        if prefix_hints and hasattr(options, "prefix_hints"):
            options = dataclasses.replace(options, prefix_hints=dict(prefix_hints))

        import os as _os

        use_device = (fmt.device_decode is not None
                      and not prefix_hints
                      and not host_batches
                      and not _os.environ.get("EXON_TPU_HOST_DECODE"))
        decode = fmt.device_decode if use_device else fmt.decode

        def decode_file(store, meta) -> list:
            from .io.compression import Compression, decompress_view
            from .tracing import logger as _log

            _log.debug("scan open fmt=%s path=%s size=%d", fmt.name,
                       meta.path, meta.size)
            _stem, comp = infer_compression(meta.path)
            if fmt.supports_view and hasattr(store, "get_view"):
                # zero-copy mmap view; compressed files decompress natively
                # (parallel BGZF / libdeflate) straight into a uint8 array
                data = decompress_view(store.get_view(meta.path), comp)
            else:
                data = decompress(store.get(meta.path), comp)
            return list(decode(data, options, projection))

        def stream_file(store, meta) -> Iterator[Batch]:
            """Bounded-memory path: decompress + decode in record-aligned
            chunks (the reference's streaming BatchReader analog,
            exon-fasta/src/batch_reader.rs:72-111). Peak RSS is
            O(chunk), not O(file)."""
            from .io import streaming as _st

            _stem, comp = infer_compression(meta.path)
            src = store.get_view(meta.path) if hasattr(store, "get_view") \
                else store.get(meta.path)
            boundary, hdr = fmt.stream
            chunks = _st.stream_record_chunks(
                src, comp, boundary, hdr, chunk_size=_st.DEFAULT_CHUNK)
            # decompress chunk k+1 while decoding chunk k
            for chunk in _st.prefetch(chunks, depth=1):
                yield from decode(chunk, options, projection)

        n_workers = _scan_workers()

        def source() -> Iterator[Batch]:
            from .io.compression import Compression
            from .parallel.mesh import iter_scan_files

            produced = 0
            my_files = iter_scan_files(files)  # multi-host: this process's shard
            if not my_files:
                return
            # single compressed file whose DECOMPRESSED size would blow the
            # memory budget → chunked bounded-memory scan; otherwise
            # whole-file native decompress (faster: one-shot libdeflate /
            # parallel BGZF) with per-file parallel decode
            use_stream = False
            if fmt.stream is not None and len(my_files) == 1:
                store0, meta0 = my_files[0]
                comp = infer_compression(meta0.path)[1]
                if comp != Compression.NONE:
                    est_out = _estimate_decompressed(store0, meta0, comp)
                    budget = int(_os.environ.get(
                        "EXON_TPU_STREAM_THRESHOLD", 1 << 30))
                    use_stream = est_out > budget
            gen = (stream_file(*my_files[0]) if use_stream else
                   parallel_file_batches(my_files, decode_file, n_workers))
            for b in gen:
                yield b
                if limit is not None:
                    produced += b.num_rows_host()
                    if produced >= limit:
                        return

        return ScanExec(schema, source, to_device=not use_device)


def _estimate_decompressed(store, meta, comp) -> int:
    """Decompressed-size estimate for the stream-vs-materialize decision.

    Plain single-member gzip: exact trailing ISIZE (4 bytes, one range
    read; valid under 4 GiB). Everything else: a conservative 10x — text
    genomics routinely compresses far better than the old 4x guess, which
    let multi-GB decompressions materialize in RAM."""
    from .io.compression import Compression as _C

    if comp in (_C.GZIP, _C.BGZF):
        try:
            if hasattr(store, "get_range"):
                tail = store.get_range(meta.path, meta.size - 4, 4)
            else:
                tail = bytes(store.get_view(meta.path)[-4:]) \
                    if hasattr(store, "get_view") else store.get(meta.path)[-4:]
            import struct as _struct

            isize = _struct.unpack("<I", bytes(tail))[0]
            if comp == _C.GZIP and isize >= meta.size:
                # single-member exact; a wrapped ISIZE (>4 GiB stream) or
                # multi-member file reads smaller than the compressed size
                # and falls through to the conservative estimate
                return isize
        except Exception:
            pass
    return meta.size * 10


def _scan_workers() -> int:
    """Intra-query file-level parallelism width (the reference's
    target_partitions / regroup_files_by_size analog,
    exon_file_scan_config.rs:79-110). EXON_TPU_PARTITIONS overrides."""
    import os as _os

    env = _os.environ.get("EXON_TPU_PARTITIONS")
    if env:
        return max(1, int(env))
    return max(1, _os.cpu_count() or 1)


def parallel_file_batches(files: list, decode_file, n_workers: int
                          ) -> Iterator[Batch]:
    """Decode files concurrently (decoders are numpy/C-heavy and release
    the GIL) while EMITTING in file order, so result ordering matches the
    sequential scan. Lookahead is bounded to n_workers files."""
    if n_workers <= 1 or len(files) <= 1:
        for store, meta in files:
            yield from decode_file(store, meta)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        pending = []
        it = iter(files)
        for _ in range(n_workers):
            nxt = next(it, None)
            if nxt is None:
                break
            pending.append(pool.submit(decode_file, *nxt))
        i = 0
        while i < len(pending):
            batches = pending[i].result()
            nxt = next(it, None)
            if nxt is not None:
                pending.append(pool.submit(decode_file, *nxt))
            yield from batches
            pending[i] = None  # free
            i += 1


@dataclasses.dataclass
class FormatSpec:
    """Adapter hooks each format module provides."""

    name: str
    schema: callable  # (options) -> Schema
    decode: callable  # (bytes, options, projection) -> Iterator[host Batch]
    default_options: callable  # () -> options
    extension: str
    # optional on-device decode: (bytes, options, projection) -> Iterator of
    # *device* Batches (see formats/fasta_device.py). Preferred when present.
    device_decode: Optional[callable] = None
    # decode accepts a zero-copy uint8 mmap view instead of bytes
    supports_view: bool = False
    # bounded-memory streaming: (boundary_kind, header_prefixes) — see
    # io/streaming.py. None → whole-file decode only.
    stream: Optional[tuple] = None


_FORMATS: dict[str, FormatSpec] = {}


def register_format(spec: FormatSpec) -> None:
    _FORMATS[spec.name.upper()] = spec


# STORED AS aliases: amino-acid / nucleotide FASTA and short FASTQ names
# map to the base format with their own default extension
# (exon-core/src/session_context/exon_context_ext.rs:134-140,
#  exon_file_type.rs get_base_file_extension)
FORMAT_ALIASES = {"FA": ("FASTA", ".fa"), "FAA": ("FASTA", ".faa"),
                  "FNA": ("FASTA", ".fna"), "FQ": ("FASTQ", ".fq")}


def get_format(name: str) -> FormatSpec:
    key = name.upper()
    key = FORMAT_ALIASES.get(key, (key,))[0]
    if key not in _FORMATS:
        raise PlanError(f"unknown format {name!r}; registered: {sorted(_FORMATS)}")
    return _FORMATS[key]


def alias_extension(name: str):
    """Default file extension for a STORED AS alias, or None."""
    entry = FORMAT_ALIASES.get(name.upper())
    return entry[1] if entry else None


def registered_formats() -> list[str]:
    return sorted(_FORMATS)


def _register_builtin_formats() -> None:
    from .formats import fasta as fasta_mod
    from .formats import fasta_device as fasta_dev

    def fasta_decode(data: bytes, options, projection):
        opts = dataclasses.replace(options, projection=projection)
        yield from fasta_mod.read_fasta_bytes(data, opts)

    register_format(FormatSpec(
        name="FASTA",
        schema=fasta_mod.fasta_schema,
        decode=fasta_decode,
        default_options=fasta_mod.FastaOptions,
        extension=".fasta",
        device_decode=fasta_dev.decode_fasta_device,
        supports_view=True,
        stream=("fasta", ()),
    ))

    from .formats import fastq as fastq_mod

    register_format(FormatSpec(
        name="FASTQ",
        schema=fastq_mod.fastq_schema,
        decode=fastq_mod.decode_host,
        default_options=fastq_mod.FastqOptions,
        extension=".fastq",
        device_decode=fastq_mod.decode_device,
        stream=("fastq", ()),
    ))

    from .formats import bed as bed_mod
    from .formats import gff as gff_mod

    register_format(FormatSpec(
        name="GFF",
        schema=gff_mod.gff_schema,
        decode=gff_mod.decode_host,
        default_options=gff_mod.GffOptions,
        extension=".gff",
        stream=("line", ()),
    ))
    register_format(FormatSpec(
        name="GTF",
        schema=gff_mod.gtf_schema,
        decode=gff_mod.decode_host,
        default_options=gff_mod.GtfOptions,
        extension=".gtf",
        stream=("line", ()),
    ))
    register_format(FormatSpec(
        name="BED",
        schema=bed_mod.bed_schema,
        decode=bed_mod.decode_host,
        default_options=bed_mod.BedOptions,
        extension=".bed",
        stream=("line", ()),
    ))

    from .formats import vcf as vcf_mod

    register_format(FormatSpec(
        name="VCF",
        schema=vcf_mod.vcf_schema,
        decode=vcf_mod.decode_host,
        default_options=vcf_mod.VcfOptions,
        extension=".vcf",
        stream=("line", (b"#",)),
    ))

    from .formats import bcf as bcf_mod

    def bcf_decode(data: bytes, options, projection):
        from .io.bgzf import decompress_all

        raw = decompress_all(data) if data[:2] == b"\x1f\x8b" else data
        yield from bcf_mod.decode_host(raw, options, projection)

    register_format(FormatSpec(
        name="BCF",
        schema=bcf_mod.vcf_schema,
        decode=bcf_decode,
        default_options=bcf_mod.BcfOptions,
        extension=".bcf",
    ))

    from .formats import hmmdomtab as hmm_mod
    from .formats import sam as sam_mod

    register_format(FormatSpec(
        name="SAM",
        schema=sam_mod.sam_schema,
        decode=sam_mod.decode_host,
        default_options=sam_mod.SamOptions,
        extension=".sam",
        stream=("line", (b"@",)),
    ))
    from .formats import sdf as sdf_mod

    register_format(FormatSpec(
        name="SDF",
        schema=lambda o: sdf_mod.sdf_schema(o, o.data_keys or ("canonical_smiles",)),
        decode=sdf_mod.decode_host,
        default_options=sdf_mod.SdfOptions,
        extension=".sdf",
        stream=("sdf", ()),
    ))

    from .formats import fcs as fcs_mod
    from .formats import genbank as gb_mod
    from .formats import mzml as mzml_mod

    register_format(FormatSpec(
        name="MZML",
        schema=mzml_mod.mzml_schema,
        decode=mzml_mod.decode_host,
        default_options=mzml_mod.MzmlOptions,
        extension=".mzML",
    ))
    register_format(FormatSpec(
        name="GENBANK",
        schema=gb_mod.genbank_schema,
        decode=gb_mod.decode_host,
        default_options=gb_mod.GenbankOptions,
        extension=".gb",
    ))
    register_format(FormatSpec(
        name="FCS",
        schema=fcs_mod.fcs_schema,
        decode=fcs_mod.decode_host,
        default_options=fcs_mod.FcsOptions,
        extension=".fcs",
    ))

    from .formats import bam as bam_fmt

    def bam_decode(data: bytes, options, projection):
        from .io.bgzf import decompress_all

        raw = decompress_all(data) if data[:2] == b"\x1f\x8b" else data
        yield from bam_fmt.decode_host(raw, options, projection)

    register_format(FormatSpec(
        name="BAM",
        schema=bam_fmt.bam_schema,
        decode=bam_decode,
        default_options=bam_fmt.BamOptions,
        extension=".bam",
    ))

    register_format(FormatSpec(
        name="HMMDOMTAB",
        schema=hmm_mod.hmmdomtab_schema,
        decode=hmm_mod.decode_host,
        default_options=hmm_mod.HmmDomTabOptions,
        extension=".hmmdomtab",
        stream=("line", (b"#",)),
    ))

    from .formats import cram as cram_mod

    register_format(FormatSpec(
        name="CRAM",
        schema=cram_mod.cram_schema,
        decode=cram_mod.decode_host,
        default_options=cram_mod.CramOptions,
        extension=".cram",
    ))

    from .formats import bigwig as bw_mod

    register_format(FormatSpec(
        name="BIGWIG_VALUE",
        schema=bw_mod.bigwig_value_schema,
        decode=bw_mod.decode_value_host,
        default_options=bw_mod.BigWigValueOptions,
        extension=".bw",
    ))
    register_format(FormatSpec(
        name="BIGWIG_ZOOM",
        schema=bw_mod.bigwig_zoom_schema,
        decode=bw_mod.decode_zoom_host,
        default_options=bw_mod.BigWigZoomOptions,
        extension=".bw",
    ))


_register_builtin_formats()
