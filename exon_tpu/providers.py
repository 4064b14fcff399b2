"""Indexed table providers: region-aware scans with index-driven pruning.

The engine analog of the reference's Listing<FMT>Table providers with
ExonIndexedListingOptions (exon-core/src/datasources/exon_listing_table_options.rs):
a provider declares region-filter markers Exact, extracts regions at scan
time, consults .tbi/.fai/.bai indexes for byte ranges, and wraps the scan
in an on-device residual region predicate.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import numpy as np

from . import datatypes as dt
from .batch import Batch, Schema
from .errors import InvalidRegionError
from .io import bgzf
from .io.compression import Compression, infer_compression
from .io.indexes import Chunk, Region, TabixIndex, parse_tabix
from .io.object_store import ObjectStore, get_store, resolve_table_files
from .plan import regions as R
from .parallel.mesh import iter_scan_files
from .plan.expressions import Expr, conjoin
from .plan.physical import FilterExec, PhysicalPlan, ProjectExec, ScanExec
from .tables import TableProvider


def read_bgzf_chunk(store: ObjectStore, path: str, chunk: Chunk,
                    file_size: int) -> bytes:
    """Range-read + decompress one tabix chunk (virtual positions)."""
    lo = bgzf.coffset(chunk.vstart)
    hi = min(bgzf.coffset(chunk.vend) + (1 << 17), file_size)
    buf = store.get_range(path, lo, hi)
    vstart = bgzf.make_vpos(0, bgzf.uoffset(chunk.vstart))
    vend = bgzf.make_vpos(bgzf.coffset(chunk.vend) - lo, bgzf.uoffset(chunk.vend))
    return bgzf.decompress_range(buf, vstart, vend)


@dataclasses.dataclass
class VcfTable(TableProvider):
    """VCF listing table with tabix region pruning
    (exon-core/src/datasources/vcf/table_provider.rs)."""

    shards_files = True

    url: str
    options: object
    config: object = None

    def schema(self) -> Schema:
        from .formats.vcf import parse_header_only, vcf_schema

        if getattr(self.options, "parse_info", False) or \
                getattr(self.options, "parse_formats", False):
            from .io.compression import infer_compression

            store, meta = self.files()[0]
            _stem, comp = infer_compression(meta.path)
            header = parse_header_only(
                _decompress_header_prefix(store, meta, comp))
            return vcf_schema(self.options, header)
        return vcf_schema(self.options)

    def supports_filter_pushdown(self, expr: Expr) -> str:
        if R.is_region_filter(expr):
            return "exact"
        return "none"

    def files(self):
        files = resolve_table_files(self.url, getattr(self.options, "file_extension", ".vcf"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        from .formats.vcf import decode_host

        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        if getattr(options, "indexed", False) and not regions:
            raise InvalidRegionError(
                "An indexed VCF table type requires a region filter. "
                "See the 'vcf_region_filter' function.")

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_proj = list(proj)
        # indexed chunks are row-filtered exactly host-side; only the
        # unindexed fallback needs chrom/pos in the scan for a residual
        # FilterExec
        all_indexed = bool(regions) and all(
            infer_compression(meta.path)[1] in (Compression.BGZF,
                                                Compression.GZIP)
            and store.exists(meta.path + ".tbi")
            for store, meta in self.files())
        if regions and not all_indexed:
            for need in ("chrom", "pos"):
                if need not in scan_proj:
                    scan_proj.append(need)
        scan_schema = schema.project(scan_proj)
        files = self.files()

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                _stem, comp = infer_compression(meta.path)
                if regions and comp in (Compression.BGZF, Compression.GZIP) \
                        and store.exists(meta.path + ".tbi"):
                    tbi = parse_tabix(store.get(meta.path + ".tbi"))
                    for region in regions:
                        for chunk in _coalesce_chunks(tbi.query(region)):
                            text = read_bgzf_chunk(store, meta.path, chunk,
                                                   meta.size)
                            # exact host row filter after the index seek —
                            # no residual device filter needed
                            yield from decode_host(text, options, scan_proj,
                                                   region=region)
                else:
                    from .io.compression import decompress

                    data = decompress(store.get(meta.path), comp)
                    yield from decode_host(data, options, scan_proj)

        plan: PhysicalPlan = ScanExec(scan_schema, source)
        if regions and not all_indexed:
            exprs = [R.region_to_point_expr(r, "chrom", "pos") for r in regions]
            pred = exprs[0]
            for e in exprs[1:]:
                from .plan.expressions import BinaryOp

                pred = BinaryOp("or", pred, e)
            plan = FilterExec(pred, plan)
            if scan_proj != proj and proj:
                from .plan.expressions import col

                plan = ProjectExec([col(n) for n in proj],
                                   schema.project(proj), plan)
        return plan


@dataclasses.dataclass
class BamTable(TableProvider):
    """BAM listing table with .bai region pruning
    (exon-core/src/datasources/bam/table_provider.rs)."""

    shards_files = True

    url: str
    options: object
    config: object = None

    def schema(self) -> Schema:
        from .formats.bam import bam_schema

        if getattr(self.options, "parse_tags", False):
            from .formats.bam import first_record_tags, parse_bam_header
            from .formats.samtags import infer_tag_fields
            from .io.bgzf import decompress_all

            store, meta = self.files()[0]
            data = decompress_all(store.get(meta.path))
            header = parse_bam_header(data)
            return bam_schema(self.options,
                              infer_tag_fields(first_record_tags(data,
                                                                 header)))
        return bam_schema(self.options)

    def supports_filter_pushdown(self, expr: Expr) -> str:
        return "exact" if R.is_region_filter(expr) else "none"

    def files(self):
        files = resolve_table_files(self.url, getattr(self.options, "file_extension", ".bam"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        from .formats.bam import (decode_records, parse_bam_header,
                                  scan_record_offsets)
        from .io.bgzf import decompress_all
        from .io.indexes import parse_bai

        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_schema = schema.project(proj)
        files = self.files()

        def source() -> Iterator[Batch]:
            from .formats.bam import (read_header_prefix,
                                      region_intersect_mask)
            from .io.bgzf import decompress_all_view

            for store, meta in iter_scan_files(files):
                raw = store.get_view(meta.path) \
                    if hasattr(store, "get_view") else store.get(meta.path)
                if regions and store.exists(meta.path + ".bai"):
                    bai = parse_bai(store.get(meta.path + ".bai"))
                    from .io import bgzf as bgzf_mod

                    header = read_header_prefix(raw)
                    for region in regions:
                        try:
                            rid = header.ref_names.index(region.name)
                        except ValueError:
                            continue
                        for chunk in _coalesce_chunks(bai.query(rid, region)):
                            vs = bgzf_mod.make_vpos(
                                0, bgzf_mod.uoffset(chunk.vstart))
                            ve = bgzf_mod.make_vpos(
                                bgzf_mod.coffset(chunk.vend)
                                - bgzf_mod.coffset(chunk.vstart),
                                bgzf_mod.uoffset(chunk.vend))
                            buf = raw[bgzf_mod.coffset(chunk.vstart):]
                            if not isinstance(buf, (bytes, np.ndarray)):
                                buf = bytes(buf)
                            data = bgzf_mod.decompress_range_view(buf, vs, ve)
                            offsets = scan_record_offsets(data, 0)
                            # exact row filter HOST-side after the index
                            # seek (indexed_async_batch_stream.rs:66-88);
                            # downstream sees only matching rows, so
                            # COUNT(*) needs no device program at all
                            keep = region_intersect_mask(
                                data, offsets, rid, region.start, region.end)
                            yield from decode_records(data, offsets[keep],
                                                      header, options, proj)
                else:
                    data = decompress_all_view(raw)
                    header = parse_bam_header(data)
                    offsets = scan_record_offsets(data, header.header_end)
                    if regions:
                        # no .bai for this file: the planner dropped the
                        # region predicate (pushdown reported "exact"), so
                        # the decode-time intersect mask must still apply
                        keep = np.zeros(len(offsets), bool)
                        for region in regions:
                            try:
                                rid = header.ref_names.index(region.name)
                            except ValueError:
                                continue
                            keep |= region_intersect_mask(
                                data, offsets, rid, region.start, region.end)
                        offsets = offsets[keep]
                    yield from decode_records(data, offsets, header,
                                              options, proj)

        return ScanExec(scan_schema, source)


def make_bam_provider(url: str, options, config):
    if config is not None:
        options = dataclasses.replace(
            options, parse_tags=getattr(config, "bam_parse_tags", False))
    return BamTable(url, options, config)


@dataclasses.dataclass
class SamTable(TableProvider):
    """SAM listing table; in parse_tags mode the tags struct schema is
    inferred from the first record (exon-sam schema_builder.rs:70-349)."""

    shards_files = True

    url: str
    options: object
    config: object = None
    _schema: object = None

    def files(self):
        files = resolve_table_files(
            self.url, getattr(self.options, "file_extension", ".sam"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def schema(self) -> Schema:
        from .formats.sam import sam_schema

        if not getattr(self.options, "parse_tags", False):
            return sam_schema(self.options)
        if self._schema is None:
            from .formats.sam import parse_text_tags
            from .formats.samtags import infer_tag_fields
            from .io.compression import decompress, infer_compression

            store, meta = self.files()[0]
            _stem, comp = infer_compression(meta.path)
            data = decompress(store.get(meta.path), comp)
            first = []
            for line in data.split(b"\n"):
                if line and not line.startswith(b"@"):
                    parts = line.split(b"\t", 11)
                    if len(parts) == 12:
                        arr = np.frombuffer(parts[11], np.uint8)
                        first = parse_text_tags(arr, 0, len(arr))
                    break
            self._schema = sam_schema(self.options, infer_tag_fields(first))
        return self._schema

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        from .formats.sam import decode_host
        from .io.compression import decompress, infer_compression

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        files = self.files()
        options = self.options

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                _stem, comp = infer_compression(meta.path)
                data = decompress(store.get(meta.path), comp)
                yield from decode_host(data, options, proj)

        return ScanExec(schema.project(proj), source)


def make_sam_provider(url: str, options, config):
    if config is not None:
        options = dataclasses.replace(
            options, parse_tags=getattr(config, "sam_parse_tags", False))
    return SamTable(url, options, config)


def make_vcf_provider(url: str, options, config):
    if config is not None:
        options = dataclasses.replace(
            options,
            parse_info=getattr(config, "vcf_parse_info", False),
            parse_formats=getattr(config, "vcf_parse_formats", False))
    return VcfTable(url, options, config)


def _decompress_header_prefix(store, meta, comp) -> bytes:
    """Decompress only enough of a '#'-headered text file to cover its
    header lines (the schema pass must not inflate a multi-GB file)."""
    from .io.streaming import _iter_decompressed

    src = store.get_view(meta.path) if hasattr(store, "get_view") \
        else store.get(meta.path)
    buf = bytearray()
    for piece in _iter_decompressed(src, comp, read_size=1 << 20):
        buf += piece
        # complete non-header line present? (header lines start with '#')
        start = 0
        done = False
        while True:
            nl = buf.find(b"\n", start)
            if nl < 0:
                break
            if buf[start:start + 1] != b"#":
                done = True
                break
            start = nl + 1
        if done or len(buf) > (256 << 20):
            break
    return bytes(buf)


def _coalesce_chunks(chunks, max_gap: int = 1 << 20):
    """Merge index chunks whose compressed ranges are within ``max_gap``
    bytes — one decompress_range + one decode per run instead of one per
    bin chunk. Safe only when the caller row-filters exactly afterwards
    (records in the gaps are dropped by the intersect mask)."""
    from .io.indexes import Chunk

    out: list = []
    for c in sorted(chunks, key=lambda c: c.vstart):
        if out and (c.vstart >> 16) - (out[-1].vend >> 16) <= max_gap:
            if c.vend > out[-1].vend:
                out[-1] = Chunk(out[-1].vstart, c.vend)
        else:
            out.append(Chunk(c.vstart, c.vend))
    return out


@dataclasses.dataclass
class SdfTable(TableProvider):
    """SDF table with data-struct schema inference (keys scanned from the
    file, exon-sdf schema_builder.rs add_field usage)."""

    shards_files = True

    url: str
    options: object
    config: object = None
    _keys: Optional[tuple] = None

    def _infer_keys(self) -> tuple:
        """Data-struct keys from the FIRST record of the first file — the
        reference's behavior (sdf/table_provider.rs:146-181 reads one
        record into SDFSchemaBuilder). Only a prefix of the file is
        decompressed."""
        if self._keys is None:
            import re

            from .io.compression import infer_compression
            from .io.streaming import _iter_decompressed

            keys: list[str] = []
            rx = re.compile(rb"^>\s*<(.*?)>", re.M)
            store, meta = self.files()[0]
            _stem, comp = infer_compression(meta.path)
            head = bytearray()
            src = store.get_view(meta.path) if hasattr(store, "get_view") \
                else store.get(meta.path)
            for piece in _iter_decompressed(src, comp, read_size=1 << 20):
                head += piece
                if b"$$$$" in head or len(head) > (64 << 20):
                    break
            cut = head.find(b"$$$$")
            first_rec = bytes(head[:cut if cut >= 0 else len(head)])
            seen = set()
            for m in rx.finditer(first_rec):
                k = m.group(1).decode("utf-8", "replace")
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
            self._keys = tuple(keys) or ("canonical_smiles",)
        return self._keys

    def files(self):
        files = resolve_table_files(self.url, getattr(self.options, "file_extension", ".sdf"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def schema(self) -> Schema:
        from .formats.sdf import sdf_schema

        return sdf_schema(self.options, self._infer_keys())

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        from .formats.sdf import decode_host
        from .io.compression import decompress_view, infer_compression

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_schema = schema.project(proj)
        files = self.files()
        options = self.options

        options = dataclasses.replace(options, data_keys=self._infer_keys())

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                _stem, comp = infer_compression(meta.path)
                src = store.get_view(meta.path) \
                    if hasattr(store, "get_view") else store.get(meta.path)
                data = decompress_view(src, comp)
                yield from decode_host(data, options, proj)

        return ScanExec(scan_schema, source)


def make_sdf_provider(url: str, options, config):
    return SdfTable(url, options, config)


@dataclasses.dataclass
class FcsTable(TableProvider):
    """FCS table: schema = one Float32 column per channel, from the file's
    TEXT segment (exon-fcs/src/reader/mod.rs)."""

    shards_files = True

    url: str
    options: object
    config: object = None

    def files(self):
        files = resolve_table_files(self.url, getattr(self.options, "file_extension", ".fcs"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def schema(self) -> Schema:
        from .formats.fcs import fcs_schema_from_bytes
        from .io.compression import decompress, infer_compression

        store, meta = self.files()[0]
        _stem, comp = infer_compression(meta.path)
        return fcs_schema_from_bytes(decompress(store.get(meta.path), comp))

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        from .formats.fcs import decode_host
        from .io.compression import decompress, infer_compression

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        files = self.files()
        options = self.options

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                _stem, comp = infer_compression(meta.path)
                data = decompress(store.get(meta.path), comp)
                yield from decode_host(data, options, proj)

        return ScanExec(schema.project(proj), source)


def make_fcs_provider(url: str, options, config):
    return FcsTable(url, options, config)


@dataclasses.dataclass
class BcfTable(TableProvider):
    """BCF listing table with .csi region pruning."""

    shards_files = True

    url: str
    options: object
    config: object = None

    def schema(self) -> Schema:
        from .formats.vcf import vcf_schema

        return vcf_schema(self.options)

    def supports_filter_pushdown(self, expr: Expr) -> str:
        return "exact" if R.is_region_filter(expr) else "none"

    def files(self):
        files = resolve_table_files(self.url, getattr(self.options, "file_extension", ".bcf"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        from .formats.bcf import parse_bcf_header, parse_bcf_records
        from .formats import bcf as bcf_mod
        from .io import bgzf as bgzf_mod
        from .io.indexes import parse_csi

        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_proj = list(proj)
        if regions:
            for need in ("chrom", "pos"):
                if need not in scan_proj:
                    scan_proj.append(need)
        scan_schema = schema.project(scan_proj)
        files = self.files()

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                raw = store.get(meta.path)
                data = bgzf_mod.decompress_all(raw)
                header, str_dict, contigs, start = parse_bcf_header(data)
                if regions and store.exists(meta.path + ".csi"):
                    csi = parse_csi(store.get(meta.path + ".csi"), contigs)
                    for region in regions:
                        for chunk in csi.query(region):
                            text = bgzf_mod.decompress_range(
                                raw[bgzf_mod.coffset(chunk.vstart):],
                                bgzf_mod.make_vpos(0, bgzf_mod.uoffset(chunk.vstart)),
                                bgzf_mod.make_vpos(
                                    bgzf_mod.coffset(chunk.vend) - bgzf_mod.coffset(chunk.vstart),
                                    bgzf_mod.uoffset(chunk.vend)))
                            recs = parse_bcf_records(text, 0, str_dict, contigs)
                            yield from bcf_mod.records_to_batches(
                                recs, options, scan_proj)
                else:
                    recs = parse_bcf_records(data, start, str_dict, contigs)
                    yield from bcf_mod.records_to_batches(recs, options, scan_proj)

        plan: PhysicalPlan = ScanExec(scan_schema, source)
        if regions:
            exprs = [R.region_to_point_expr(r, "chrom", "pos") for r in regions]
            pred = exprs[0]
            for e in exprs[1:]:
                from .plan.expressions import BinaryOp

                pred = BinaryOp("or", pred, e)
            plan = FilterExec(pred, plan)
            if scan_proj != proj and proj:
                from .plan.expressions import col

                plan = ProjectExec([col(n) for n in proj],
                                   schema.project(proj), plan)
        return plan


def make_bcf_provider(url: str, options, config):
    return BcfTable(url, options, config)


@dataclasses.dataclass
class BigWigTable(TableProvider):
    """BigWig value/zoom listing table with R-tree block pruning
    (exon-core/src/datasources/bigwig/ + exon-bigwig crate).

    The region filter marker (`bigwig_region_filter('10', name)`) is Exact:
    the R-tree index query *is* the filter (bigtools get_interval /
    get_zoom_interval semantics), so no residual device predicate is added.
    """

    shards_files = True

    url: str
    options: object
    config: object = None
    zoom: bool = False

    def schema(self) -> Schema:
        from .formats.bigwig import bigwig_value_schema, bigwig_zoom_schema

        return (bigwig_zoom_schema(self.options) if self.zoom
                else bigwig_value_schema(self.options))

    def supports_filter_pushdown(self, expr: Expr) -> str:
        return "exact" if R.is_region_filter(expr) else "none"

    def files(self):
        files = resolve_table_files(
            self.url, getattr(self.options, "file_extension", ".bw"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        from .formats.bigwig import decode_value_host, decode_zoom_host

        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        if regions:
            options = dataclasses.replace(options, regions=regions)
        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        files = self.files()
        decode = decode_zoom_host if self.zoom else decode_value_host

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                yield from decode(store.get(meta.path), options, proj)

        return ScanExec(schema.project(proj), source)


@dataclasses.dataclass
class CramTable(TableProvider):
    """CRAM listing table with reference-FASTA resolution and .crai region
    pruning (exon-core/src/datasources/cram/table_provider.rs).

    With ``parse_tags`` (exon.cram_parse_tags), the tags column becomes a
    per-tag Struct inferred from the first record
    (with_tags_data_type_from_data)."""

    shards_files = True

    url: str
    options: object
    config: object = None
    _schema: object = None

    def schema(self) -> Schema:
        from .formats import cram as cram_mod

        if self._schema is not None:
            return self._schema
        if not getattr(self.options, "parse_tags", False):
            self._schema = cram_mod.cram_schema(self.options)
            return self._schema
        # infer per-tag struct fields from the first container's records
        store, meta = self.files()[0]
        data = store.get(meta.path)
        cf = cram_mod.parse_file_header(data)
        records = []
        for _off, ch, r in cram_mod.iter_containers(data,
                                                    cf.containers_start):
            records = cram_mod.decode_container(ch, r, self._ref_getter(),
                                                cf.ref_names)
            if records:
                break
        self._schema = cram_mod.cram_schema(
            self.options, cram_mod.infer_tag_fields(records))
        return self._schema

    def _ref_getter(self):
        if not getattr(self.options, "fasta_reference", None):
            return None
        from .formats import cram as cram_mod
        from .io.object_store import get_store as _gs

        rstore, rpath = _gs(self.options.fasta_reference)
        return cram_mod.FastaRepository(rstore, rpath).get

    def supports_filter_pushdown(self, expr: Expr) -> str:
        return "exact" if R.is_region_filter(expr) else "none"

    def files(self):
        files = resolve_table_files(
            self.url, getattr(self.options, "file_extension", ".cram"))
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        from .formats import cram as cram_mod

        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_proj = list(proj)
        if regions:
            for need in ("reference", "start", "end"):
                if need not in scan_proj:
                    scan_proj.append(need)
        scan_schema = schema.project(scan_proj)
        files = self.files()
        tag_fields = None
        if getattr(options, "parse_tags", False):
            f = next(f for f in schema.fields if f.name == "tags")
            tag_fields = list(f.dtype.children)

        def decode_file(store, meta, container_offsets=None):
            data = store.get(meta.path)
            cf = cram_mod.parse_file_header(data)
            ref_getter = self._ref_getter()
            records = []
            for off, ch, r in cram_mod.iter_containers(
                    data, cf.containers_start):
                if container_offsets is not None and \
                        off not in container_offsets:
                    continue
                records.extend(cram_mod.decode_container(
                    ch, r, ref_getter, cf.ref_names))
            bs = getattr(options, "batch_size", 8192)
            for lo in range(0, len(records), bs):
                yield cram_mod.records_to_batch(
                    records[lo:lo + bs], cf.ref_names, schema, scan_proj,
                    getattr(options, "parse_tags", False))
            if not records:
                yield cram_mod.records_to_batch(
                    [], cf.ref_names, schema, scan_proj,
                    getattr(options, "parse_tags", False))

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                offsets = None
                if regions and getattr(options, "indexed", False) and \
                        store.exists(meta.path + ".crai"):
                    # map region names → ids via the file's SAM header
                    data_head = store.get(meta.path)
                    cf = cram_mod.parse_file_header(data_head)
                    entries = cram_mod.parse_crai(
                        store.get(meta.path + ".crai"))
                    offsets = set()
                    for region in regions:
                        try:
                            rid = cf.ref_names.index(region.name)
                        except ValueError:
                            continue
                        lo = region.start or 1
                        hi = region.end or (1 << 60)
                        for e in entries:
                            if e.seq_id != rid:
                                continue
                            # parity quirk: a crai entry matches only when
                            # the region CONTAINS the slice alignment start
                            # (cram/index.rs:45-60), not on overlap
                            if lo <= e.align_start <= hi:
                                offsets.add(e.container_offset)
                yield from decode_file(store, meta, offsets)

        plan: PhysicalPlan = ScanExec(scan_schema, source)
        if regions:
            # row-level residual checks the reference name only: after crai
            # pruning the reference keeps every record of the selected
            # slices (the COITree filter compares against the crai entry
            # ranges themselves, indexed_async_batch_stream.rs:76-133)
            from .plan.expressions import BinaryOp, col, lit

            exprs = [BinaryOp("=", col("reference"), lit(r.name))
                     for r in regions]
            pred = exprs[0]
            for e in exprs[1:]:
                pred = BinaryOp("or", pred, e)
            plan = FilterExec(pred, plan)
            if scan_proj != proj and proj:
                from .plan.expressions import col

                plan = ProjectExec([col(n) for n in proj],
                                   schema.project(proj), plan)
        return plan


@dataclasses.dataclass
class HivePartitionedTable(TableProvider):
    """Hive-style ``key=value`` partitioned listing table.

    The analog of the reference's partition machinery: partition columns
    ride the table schema after the file fields
    (exon-common/src/table_schema.rs:22-115), equality predicates on them
    prune the object listing before any file is opened
    (pruned_partition_list, physical_plan/object_store/hive_partition.rs:72),
    and surviving scans emit the partition value as a per-partition constant
    dictionary column.
    """

    url: str
    partition_cols: list[str]
    inner_factory: object  # (sub_url) -> TableProvider
    file_extension: Optional[str] = None
    _partitions: Optional[list] = None   # [(values dict, sub_url)]
    _inner_schema: Optional[Schema] = None

    def _list_partitions(self) -> list[tuple[dict, str]]:
        if self._partitions is not None:
            return self._partitions
        from .io.object_store import get_store as _gs

        store, path = _gs(self.url)
        metas = store.list(path)
        seen: dict[tuple, str] = {}
        for m in metas:
            vals = {}
            last_seg_end = None
            # parse key=value path segments below the table root
            rel = m.path
            for seg in rel.split("/"):
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    if k in self.partition_cols:
                        vals[k] = v
                        last_seg_end = rel.index(seg) + len(seg)
            if len(vals) != len(self.partition_cols) or last_seg_end is None:
                continue
            key = tuple(vals[c] for c in self.partition_cols)
            seen.setdefault(key, rel[:last_seg_end])
        self._partitions = [
            (dict(zip(self.partition_cols, key)), sub)
            for key, sub in sorted(seen.items())]
        if not self._partitions:
            raise FileNotFoundError(
                f"no hive partitions ({'/'.join(self.partition_cols)}=*) "
                f"under {self.url}")
        return self._partitions

    def _inner(self, sub_url: str) -> TableProvider:
        return self.inner_factory(sub_url)

    def schema(self) -> Schema:
        if self._inner_schema is None:
            _vals, sub = self._list_partitions()[0]
            self._inner_schema = self._inner(sub).schema()
        fields = list(self._inner_schema.all_fields)
        fields += [dt.Field(c, dt.dictionary, nullable=False)
                   for c in self.partition_cols]
        return Schema.of(*fields)

    def supports_filter_pushdown(self, expr: Expr) -> str:
        if self._partition_eq(expr) is not None:
            return "exact"
        _vals, sub = self._list_partitions()[0]
        return self._inner(sub).supports_filter_pushdown(expr)

    def _partition_eq(self, expr: Expr) -> Optional[tuple[str, str]]:
        from .plan.expressions import BinaryOp, ColumnRef, Literal

        if isinstance(expr, BinaryOp) and expr.op == "=":
            left, right = expr.left, expr.right
            if isinstance(right, ColumnRef) and isinstance(left, Literal):
                left, right = right, left
            if isinstance(left, ColumnRef) and isinstance(right, Literal) \
                    and left.name in self.partition_cols:
                return left.name, str(right.value)
        return None

    def scan(self, projection: Optional[list[str]] = None,
             filters: Sequence[Expr] = (), limit: Optional[int] = None
             ) -> PhysicalPlan:
        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        inner_names = [f.name for f in self._inner_schema.all_fields]
        inner_proj = [p for p in proj if p in inner_names]
        if not inner_proj:
            inner_proj = [inner_names[0]]
        # split filters: partition equalities prune; the rest go inside
        bounds: dict[str, set] = {}
        inner_filters = []
        from .plan.expressions import split_conjunction

        for f in filters:
            parts = list(split_conjunction(f))
            eqs = [self._partition_eq(p) for p in parts]
            if all(e is not None for e in eqs):
                for c, v in eqs:
                    bounds.setdefault(c, set()).add(v)
            elif len(parts) == 1:
                inner_filters.append(f)
            else:
                kept = [p for p, e in zip(parts, eqs) if e is None]
                for c, v in (e for e in eqs if e is not None):
                    bounds.setdefault(c, set()).add(v)
                inner_filters.extend(kept)
        partitions = [
            (vals, sub) for vals, sub in self._list_partitions()
            if all(vals[c] in vs for c, vs in bounds.items())]

        out_schema = schema.project(proj)
        plans = []
        for vals, sub in partitions:
            inner_plan = self._inner(sub).scan(list(inner_proj),
                                               inner_filters)
            plans.append(_PartitionConstExec(out_schema, inner_plan,
                                             inner_proj, vals))
        if not plans:
            def empty():
                return iter(())

            return ScanExec(out_schema, empty)
        from .plan.physical import UnionExec

        return plans[0] if len(plans) == 1 else UnionExec(plans)


@dataclasses.dataclass
class _PartitionConstExec(PhysicalPlan):
    """Appends per-partition constant dictionary columns to child batches,
    reordering to the projected schema."""

    _schema: Schema
    child: PhysicalPlan
    inner_proj: list[str]
    values: dict[str, str]

    def children(self):
        return [self.child]

    def schema(self) -> Schema:
        return self._schema

    def batches(self) -> Iterator[Batch]:
        from .batch import Batch as _Batch, DictColumn

        names = self._schema.names
        for b in self.child.batches():
            cap = b.capacity if b.columns else 1
            host = isinstance(b.length, (int, np.integer)) or \
                type(b.length).__module__.startswith("numpy")
            if host:
                codes = np.zeros(cap, np.int32)
                valid = np.ones(cap, bool)
            else:
                import jax.numpy as jnp

                codes = jnp.zeros(cap, jnp.int32)
                valid = jnp.ones(cap, bool)
            cols = []
            for name in names:
                if name in self.values:
                    cols.append(DictColumn(codes, valid,
                                           (self.values[name],)))
                else:
                    cols.append(b.column(name))
            yield _Batch(self._schema, cols, b.length)


@dataclasses.dataclass
class ParquetTable(TableProvider):
    """Parquet listing table (the reference gets this from stock DataFusion;
    exercised by parquet-copy-test.slt)."""

    shards_files = True

    url: str
    options: object = None
    config: object = None

    def files(self):
        files = resolve_table_files(self.url, ".parquet")
        if not files:
            files = resolve_table_files(self.url, None)
        if not files:
            raise FileNotFoundError(f"no files for table at {self.url}")
        return files

    def _read(self, store, meta):
        import io

        import pyarrow.parquet as pq

        return pq.read_table(io.BytesIO(store.get(meta.path)))

    def schema(self) -> Schema:
        from .batch import schema_from_arrow

        store, meta = self.files()[0]
        return schema_from_arrow(self._read(store, meta).schema)

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        from .batch import Batch as _Batch

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        out_schema = schema.project(proj)
        files = self.files()

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                tbl = self._read(store, meta).select(proj)
                for rb in tbl.to_batches(max_chunksize=8192):
                    yield _Batch.from_arrow(rb, out_schema)

        return ScanExec(out_schema, source, to_device=True)


@dataclasses.dataclass
class DeltaTable(TableProvider):
    """Minimal Delta Lake reader: replays _delta_log JSON actions to the
    current add-file set, then reads the parquet data files
    (exon_context_ext.rs:579-588, feature `deltalake`)."""

    url: str
    options: object = None
    config: object = None

    def _snapshot(self):
        import json

        store, root = get_store(self.url)
        root = root.rstrip("/")
        log_metas = [m for m in store.list(f"{root}/_delta_log")
                     if m.path.endswith(".json")]
        adds: dict[str, dict] = {}
        for m in sorted(log_metas, key=lambda m: m.path):
            for line in store.get(m.path).splitlines():
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
        return store, root, list(adds.values())

    shards_files = True  # scan streams add-files through iter_scan_files

    def _read_all(self):
        import io
        import urllib.parse

        import pyarrow as pa
        import pyarrow.parquet as pq

        store, root, adds = self._snapshot()
        tables = []
        for add in adds:
            rel = urllib.parse.unquote(add["path"])
            tables.append(pq.read_table(io.BytesIO(
                store.get(f"{root}/{rel}"))))
        if not tables:
            raise FileNotFoundError(f"empty delta table at {self.url}")
        return pa.concat_tables(tables)

    def schema(self) -> Schema:
        from .batch import schema_from_arrow

        return schema_from_arrow(self._read_all().schema)

    def scan(self, projection=None, filters=(), limit=None) -> PhysicalPlan:
        import io as _io
        import urllib.parse

        import pyarrow.parquet as pq

        from .batch import Batch as _Batch

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        out_schema = schema.project(proj)
        store, root, adds = self._snapshot()
        rels = [urllib.parse.unquote(a["path"]) for a in adds]

        def source() -> Iterator[Batch]:
            # per add-file streaming through the process file shard, so
            # multi-host runs decode disjoint data-file subsets
            for rel in iter_scan_files(rels):
                tbl = pq.read_table(_io.BytesIO(
                    store.get(f"{root}/{rel}"))).select(proj)
                for rb in tbl.to_batches(max_chunksize=8192):
                    yield _Batch.from_arrow(rb, out_schema)

        return ScanExec(out_schema, source, to_device=True)


from .tables import FileTable


@dataclasses.dataclass
class GffTable(FileTable):
    """GFF/GTF listing table with tabix (.tbi) region pruning
    (exon-core/src/datasources/gff/, INDEXED_GFF + gff_indexed_scan)."""

    config: object = None

    def supports_filter_pushdown(self, expr: Expr) -> str:
        return "exact" if R.is_region_filter(expr) else "none"

    def scan(self, projection=None, filters=(), limit=None,
             prefix_hints=None) -> PhysicalPlan:
        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        if not regions:
            if getattr(options, "indexed", False):
                raise InvalidRegionError(
                    "An indexed GFF table type requires a region filter. "
                    "See the 'gff_region_filter' function.")
            return super().scan(projection, filters, limit, prefix_hints)
        from .formats.gff import decode_host

        schema = self.schema()
        proj = list(projection) if projection is not None else schema.names
        scan_proj = list(proj)
        for need in ("seqname", "start", "end"):
            if need not in scan_proj:
                scan_proj.append(need)
        scan_schema = schema.project(scan_proj)
        files = self.files()

        def read_chunk(store, path, chunk, file_size) -> bytes:
            # parity quirk: the reference reads the compressed range
            # [vstart.compressed, vend.compressed) — the trailing partial
            # block that contains vend is NOT read, so its records drop
            # (gff/indexed_file_opener.rs:77-82); same-block chunks read to
            # EOF instead
            lo = bgzf.coffset(chunk.vstart)
            hi = bgzf.coffset(chunk.vend)
            if lo == hi:
                hi = file_size
            buf = store.get_range(path, lo, hi)
            data = bgzf.decompress_all(buf)
            return data[bgzf.uoffset(chunk.vstart):]

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                _stem, comp = infer_compression(meta.path)
                if comp in (Compression.BGZF, Compression.GZIP) and \
                        store.exists(meta.path + ".tbi"):
                    tbi = parse_tabix(store.get(meta.path + ".tbi"))
                    for region in regions:
                        for chunk in tbi.query(region):
                            text = read_chunk(store, meta.path, chunk,
                                              meta.size)
                            yield from decode_host(text, options, scan_proj)
                else:
                    from .io.compression import decompress

                    data = decompress(store.get(meta.path), comp)
                    yield from decode_host(data, options, scan_proj)

        plan: PhysicalPlan = ScanExec(scan_schema, source)
        # row filter matches the reference: name equality + interval
        # CONTAINS the record start (exon-gff/src/batch_reader.rs:76-96)
        exprs = [R.region_to_point_expr(r, "seqname", "start")
                 for r in regions]
        pred = exprs[0]
        for e in exprs[1:]:
            from .plan.expressions import BinaryOp

            pred = BinaryOp("or", pred, e)
        plan = FilterExec(pred, plan)
        if scan_proj != proj and proj:
            from .plan.expressions import col

            plan = ProjectExec([col(n) for n in proj],
                               schema.project(proj), plan)
        return plan


def make_gff_provider(url: str, options, config):
    from .tables import get_format

    return GffTable(url, get_format("GFF"), options, config)


@dataclasses.dataclass
class FastaTable(FileTable):
    """FASTA listing table; region filters turn into .fai-driven
    subsequence reads (ListingFASTATable::scan,
    fasta/table_provider.rs:344-456 + indexed_file/fai.rs:29-47)."""

    config: object = None

    def supports_filter_pushdown(self, expr: Expr) -> str:
        if R.is_region_filter(expr):
            return "exact"
        # prefix-LIKE evaluates exactly at decode time (FileTable path)
        return super().supports_filter_pushdown(expr)

    def scan(self, projection=None, filters=(), limit=None,
             prefix_hints=None, host_batches=False) -> PhysicalPlan:
        regions = R.infer_regions_from_filters(filters)
        options = self.options
        if getattr(options, "regions", None):
            regions = list(options.regions) + regions
        if not regions:
            return super().scan(projection, filters, limit, prefix_hints,
                                host_batches=host_batches)
        from urllib.parse import urlparse

        from .batch import batch_from_host, utf8_column
        from .formats.fasta import fasta_schema
        from .io.indexes import compute_fai_range, parse_fai

        schema = fasta_schema(options)
        proj = list(projection) if projection is not None else schema.names
        out_schema = schema.project(proj)
        files = self.files()
        remote = urlparse(self.url).scheme not in ("", "file")

        def region_rows(store, meta):
            _stem, comp = infer_compression(meta.path)
            if comp != Compression.NONE and remote:
                raise ExonIndexedFastaError(
                    "Indexed FASTA from remote storage only supports "
                    "uncompressed files.")
            if comp == Compression.NONE and store.exists(meta.path + ".fai"):
                fai = parse_fai(store.get(meta.path + ".fai"))
                for region in regions:
                    rec = fai.get(region.name)
                    if rec is None:
                        continue
                    lo, hi = compute_fai_range(rec, region)
                    raw = store.get_range(meta.path, lo, hi)
                    seq = raw.replace(b"\n", b"").replace(b"\r", b"")
                    yield _region_id(region), seq.decode("ascii", "replace")
            else:
                from .formats.cram import FastaRepository
                from .io.compression import decompress

                # in-memory fallback (local compressed / missing .fai):
                # parse the whole file, slice per region
                data = decompress(store.get(meta.path), comp)
                seqs: dict[str, bytes] = {}
                cur, parts = None, []
                for line in data.split(b"\n"):
                    if line.startswith(b">"):
                        if cur is not None:
                            seqs[cur] = b"".join(parts)
                        cur = line[1:].split()[0].decode()
                        parts = []
                    else:
                        parts.append(line.strip())
                if cur is not None:
                    seqs[cur] = b"".join(parts)
                for region in regions:
                    if region.name not in seqs:
                        continue
                    s = seqs[region.name]
                    lo = (region.start or 1) - 1
                    hi = region.end if region.end is not None else len(s)
                    yield _region_id(region), \
                        s[lo:hi].decode("ascii", "replace")

        from .tables import _apply_prefix_preds, _prefix_like_pred

        preds = [p for p in (_prefix_like_pred(schema, f) for f in filters)
                 if p is not None]
        need_proj = list(proj)
        for nm, _pb, _ci in preds:
            if nm not in need_proj:
                need_proj.append(nm)

        def source() -> Iterator[Batch]:
            for store, meta in iter_scan_files(files):
                rows = list(region_rows(store, meta))
                if not rows:
                    continue
                n = len(rows)
                cols = []
                for name in need_proj:
                    if name == "id":
                        cols.append(utf8_column([r[0] for r in rows]))
                    elif name == "description":
                        cols.append(utf8_column([None] * n))
                    elif name == "sequence":
                        cols.append(utf8_column([r[1] for r in rows]))
                    else:
                        raise KeyError(name)
                b = batch_from_host(schema.project(need_proj), cols, n)
                if preds:
                    b = _apply_prefix_preds(b, preds, out_schema)
                    if b is None or int(b.length) == 0:
                        continue
                yield b

        return ScanExec(out_schema, source)


class ExonIndexedFastaError(Exception):
    pass


def _region_id(region) -> str:
    if region.start is None and region.end is None:
        return region.name
    return f"{region.name}:{region.start}-{region.end}"


def make_fasta_provider(url: str, options, config):
    from .tables import get_format

    return FastaTable(url, get_format("FASTA"), options, config)


def make_parquet_provider(url: str, options, config):
    return ParquetTable(url, options, config)


def make_delta_provider(url: str, options, config):
    return DeltaTable(url, options, config)


def make_cram_provider(url: str, options, config):
    if config is not None:
        options = dataclasses.replace(
            options, parse_tags=getattr(config, "cram_parse_tags", False))
    return CramTable(url, options, config)


def make_bigwig_value_provider(url: str, options, config):
    return BigWigTable(url, options, config, zoom=False)


def make_bigwig_zoom_provider(url: str, options, config):
    return BigWigTable(url, options, config, zoom=True)


def register_indexed_providers() -> None:
    from .session import register_provider_factory

    register_provider_factory("VCF", make_vcf_provider)
    register_provider_factory("BAM", make_bam_provider)
    register_provider_factory("SDF", make_sdf_provider)
    register_provider_factory("FCS", make_fcs_provider)
    register_provider_factory("BCF", make_bcf_provider)
    register_provider_factory("BIGWIG_VALUE", make_bigwig_value_provider)
    register_provider_factory("BIGWIG_ZOOM", make_bigwig_zoom_provider)
    register_provider_factory("CRAM", make_cram_provider)
    register_provider_factory("SAM", make_sam_provider)
    register_provider_factory("GFF", make_gff_provider)
    register_provider_factory("FASTA", make_fasta_provider)
