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
    # True when scan() routes its file list through iter_scan_files, so a
    # multi-host run decodes disjoint per-process shards. Multi-host
    # distributed operators REQUIRE this — a non-sharding provider would
    # contribute its full row set from every process and duplicate rows.
    shards_files = False

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


def _prefix_like_pred(schema: Schema, expr: Expr):
    """(col, prefix bytes, case_insensitive) when ``expr`` is
    ``col [I]LIKE 'prefix%'`` over a utf8 column — the predicate class the
    scan can evaluate EXACTLY at decode time (host, vectorized), the way
    the reference's CPU engine does. None otherwise."""
    from .plan.expressions import ColumnRef, Like

    if not isinstance(expr, Like) or expr.negated:
        return None
    if not isinstance(expr.child, ColumnRef):
        return None
    if getattr(expr, "escape", None) is not None:
        return None  # escaped patterns: evaluate on the general path
    pat = expr.pattern
    if not pat.endswith("%") or "\\" in pat:
        return None
    prefix = pat[:-1]
    if "%" in prefix or "_" in prefix:
        return None
    name = expr.child.name
    if not schema.has_field(name):
        return None
    f = schema.all_fields[schema.index_of(name)]
    if f.dtype.kind.value not in ("utf8", "large_utf8", "dictionary"):
        return None
    return name, prefix.encode(), expr.case_insensitive


def _lower_u8(x: np.ndarray) -> np.ndarray:
    return np.where((x >= 65) & (x <= 90), x + 32, x).astype(np.uint8)


def _prefix_mask(col, prefix: bytes, ci: bool):
    """bool mask of rows whose value starts with ``prefix`` (NULL → False).
    None when the column layout can't answer (caller falls back)."""
    from .batch import DictColumn, PrefixColumn, VarColumn

    k = len(prefix)
    pat = np.frombuffer(prefix, np.uint8)
    patc = _lower_u8(pat) if ci else pat
    if isinstance(col, PrefixColumn):
        valid = np.asarray(col.validity)
        if k == 0:
            return valid.copy()
        pre = np.asarray(col.prefix)
        if pre.shape[1] < k:
            return None
        sub = pre[:, :k]
        subc = _lower_u8(sub) if ci else sub
        return valid & (np.asarray(col.lengths) >= k) & \
            (subc == patc).all(axis=1)
    if isinstance(col, DictColumn):
        def starts(v: str) -> bool:
            b = v.encode()
            return (b.lower() if ci else b).startswith(
                bytes(patc) if ci else prefix)

        vocab_ok = np.asarray([starts(v) for v in col.vocab] or [False])
        codes = np.clip(np.asarray(col.codes), 0,
                        max(len(col.vocab) - 1, 0))
        return vocab_ok[codes] & np.asarray(col.validity)
    if isinstance(col, VarColumn):
        vals = np.asarray(col.values)
        if vals.dtype != np.uint8:
            return None
        offs = np.asarray(col.offsets).astype(np.int64)
        starts_ = offs[:-1]
        lens = offs[1:] - starts_
        ok = (lens >= k) & np.asarray(col.validity)
        if k:
            idx = np.minimum(starts_[:, None] + np.arange(k),
                             max(len(vals) - 1, 0))
            sub = vals[idx] if len(vals) else np.zeros((len(lens), k),
                                                       np.uint8)
            subc = _lower_u8(sub) if ci else sub
            ok = ok & (subc == patc).all(axis=1)
        return ok
    return None


def _host_take_column(col, keep: np.ndarray):
    from .batch import DictColumn, FixedColumn, PrefixColumn, VarColumn
    from .formats.textutil import gather_slices

    if isinstance(col, FixedColumn):
        return FixedColumn(np.asarray(col.values)[keep],
                           np.asarray(col.validity)[keep])
    if isinstance(col, DictColumn):
        return DictColumn(np.asarray(col.codes)[keep],
                          np.asarray(col.validity)[keep], col.vocab)
    if isinstance(col, PrefixColumn):
        return PrefixColumn(np.asarray(col.prefix)[keep],
                            np.asarray(col.lengths)[keep],
                            np.asarray(col.validity)[keep])
    if isinstance(col, VarColumn):
        offs = np.asarray(col.offsets).astype(np.int64)
        v, o = gather_slices(np.asarray(col.values), offs[:-1][keep],
                             offs[1:][keep])
        return VarColumn(v, o.astype(np.int32),
                         np.asarray(col.validity)[keep])
    return None


@dataclasses.dataclass
class FileTable(TableProvider):
    """Generic listing table over files decoded by a per-format module."""

    shards_files = True

    url: str
    fmt: "FormatSpec"
    options: object  # per-format options dataclass

    def schema(self) -> Schema:
        return self.fmt.schema(self.options)

    def supports_filter_pushdown(self, expr: Expr) -> str:
        # prefix-LIKE evaluates exactly at decode time (host vector
        # compare) — the CPU-side filter evaluation the reference engine
        # does anyway, minus the device round-trip
        if _prefix_like_pred(self.schema(), expr) is not None:
            return "exact"
        return "none"

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
        full_schema = self.schema()
        preds = [p for p in (_prefix_like_pred(full_schema, f)
                             for f in filters) if p is not None]
        schema = full_schema
        decode_proj = projection
        if projection is not None:
            schema = full_schema.project(projection)
            if preds:
                # decode the filter columns too; they drop after masking
                decode_proj = list(projection) + [
                    nm for nm, _p, _c in preds if nm not in projection]
        files = self.files()
        fmt, options = self.fmt, self.options
        if preds and prefix_hints is None and \
                hasattr(options, "prefix_hints"):
            # filter-only columns can stage as bounded prefixes even when
            # the planner didn't annotate (COUNT plans project [] so the
            # hint walk never sees the column)
            proj_set = set(full_schema.names) if projection is None \
                else set(projection)
            auto = {nm: max(len(pb), 1) for nm, pb, _c in preds
                    if nm not in proj_set}
            if auto:
                prefix_hints = auto
        if prefix_hints and hasattr(options, "prefix_hints"):
            options = dataclasses.replace(options, prefix_hints=dict(prefix_hints))

        import os as _os

        use_device = (fmt.device_decode is not None
                      and not prefix_hints
                      and not preds
                      and not host_batches
                      and not _os.environ.get("EXON_TPU_HOST_DECODE"))
        decode = fmt.device_decode if use_device else fmt.decode
        projection = decode_proj

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
                if preds:
                    b = _apply_prefix_preds(b, preds, schema)
                    if b is None or int(b.length) == 0:
                        continue
                yield b
                if limit is not None:
                    produced += b.num_rows_host()
                    if produced >= limit:
                        return

        return ScanExec(schema, source, to_device=not use_device)


def _apply_prefix_preds(b: Batch, preds: list, out_schema: Schema):
    """Row-filter a decoded host batch by the pushed prefix-LIKE
    predicates, then project to the scan's output schema (filter-only
    columns drop). Falls back through Arrow for exotic column layouts."""
    mask = None
    for name, prefix, ci in preds:
        m = _prefix_mask(b.column(name), prefix, ci)
        if m is None:
            # exotic layout: evaluate via Arrow strings (exact, slower)
            import pyarrow.compute as pc

            rb = b.to_arrow()
            col = rb.column(b.schema.index_of(name))
            pat = prefix.decode("utf-8", "replace")
            m = np.asarray(pc.starts_with(
                pc.utf8_lower(col) if ci else col,
                pat.lower() if ci else pat).fill_null(False))
        mask = m if mask is None else (mask & m)
    n = int(b.length)
    mask = mask[:n]
    out_names = out_schema.names
    if mask.all():
        if list(b.schema.names) == list(out_names):
            return b
        return b.project(list(out_names))
    keep = np.flatnonzero(mask)
    cols = []
    for nm in out_names:
        c = _host_take_column(b.column(nm), keep)
        if c is None:
            # Arrow fallback for the whole batch
            import pyarrow as pa

            rb = b.to_arrow().filter(pa.array(mask))
            sub = Batch.from_arrow(rb, b.schema)
            return sub.project(list(out_names))
        cols.append(c)
    return Batch(out_schema, cols, np.int32(len(keep)))


def _estimate_decompressed(store, meta, comp) -> int:
    """Decompressed-size estimate for the stream-vs-materialize decision.

    Plain single-member gzip: exact trailing ISIZE (4 bytes, one range
    read; valid under 4 GiB). Everything else: a conservative 10x — text
    genomics routinely compresses far better than the old 4x guess, which
    let multi-GB decompressions materialize in RAM."""
    from .io.compression import Compression as _C

    if comp == _C.ZSTD:
        try:
            head = store.get_range(meta.path, 0, 18) \
                if hasattr(store, "get_range") else bytes(
                    memoryview(store.get_view(meta.path))[:18])
            fcs = _zstd_frame_content_size(bytes(head))
            if fcs is not None and fcs >= 0:
                return fcs
            # no frame-content-size (streamed encoder): decompress a 4 MiB
            # probe and extrapolate the ratio with 30% slack
            from . import native

            probe_n = min(meta.size, 4 << 20)
            probe = store.get_range(meta.path, 0, probe_n) \
                if hasattr(store, "get_range") else bytes(
                    memoryview(store.get_view(meta.path))[:probe_n])
            out = native.zstd_decompress(probe)
            if out is not None and len(out) > 0:
                return int(meta.size * (len(out) / probe_n) * 1.3)
        except Exception:
            pass
        return meta.size * 10
    if comp in (_C.GZIP, _C.BGZF):
        try:
            if hasattr(store, "get_range"):
                tail = store.get_range(meta.path, meta.size - 4, meta.size)
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


def _zstd_frame_content_size(head: bytes):
    """Frame-content-size from a zstd frame header (RFC 8878 §3.1.1), or
    None when the frame omits it (the encoder streamed without a size)."""
    import struct as _struct

    if len(head) < 6 or head[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = head[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    dict_flag = fhd & 3
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_flag]
    if fcs_flag == 0:
        if not single_segment:
            return None  # FCS absent
        return head[pos] if pos < len(head) else None
    if fcs_flag == 1:
        if pos + 2 > len(head):
            return None
        return 256 + _struct.unpack_from("<H", head, pos)[0]
    if fcs_flag == 2:
        if pos + 4 > len(head):
            return None
        return _struct.unpack_from("<I", head, pos)[0]
    if pos + 8 > len(head):
        return None
    return _struct.unpack_from("<Q", head, pos)[0]


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
