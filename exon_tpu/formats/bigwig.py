"""BigWig (BBI) decoder: signal intervals + zoom summaries → columnar batches.

Parity: exon-bigwig (value_batch_reader.rs / zoom_batch_reader.rs, which wrap
the ``bigtools`` crate). Schemas:

  * value scan (exon-bigwig/src/value_batch_reader/config.rs:30-33):
      ``name Utf8, start Int32, end Int32, value Float32``
  * zoom scan (exon-bigwig/src/zoom_batch_reader/config.rs:33-41):
      ``name, start, end, total_items Int32, bases_covered Int32,
        max_value, min_value, sum_squares, sum  (all Float64)``

This is a from-scratch parser of the UCSC BBI container (public spec,
Kent et al. 2010): fixed 64-byte header, chromosome B+ tree, R-tree spatial
index over data sections, per-section zlib compression. Region queries walk
the R-tree and only touch intersecting sections — the byte-range pruning
analog of tabix chunks. Section payloads decode as vectorized ``numpy``
struct views (no per-item Python loop).

Quirk preserved for parity: the reference feeds the 1-based region start
directly into bigtools' 0-based query (zoom_batch_reader.rs:124-128), and
zoom records are returned unclipped while value records clip to the query.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, FixedColumn, Schema, VarColumn, batch_from_host,
                     utf8_column)
from ..errors import ExonError

BIGWIG_MAGIC = 0x888FFC26
BPT_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


@dataclass
class BigWigValueOptions:
    file_extension: str = ".bw"
    batch_size: int = 8192
    projection: Optional[list[str]] = None
    regions: list = field(default_factory=list)


@dataclass
class BigWigZoomOptions:
    file_extension: str = ".bw"
    batch_size: int = 8192
    reduction_level: int = 0
    projection: Optional[list[str]] = None
    regions: list = field(default_factory=list)


def bigwig_value_schema(options=None) -> Schema:
    return Schema.of(
        dt.Field("name", dt.utf8, nullable=False),
        dt.Field("start", dt.int32, nullable=False),
        dt.Field("end", dt.int32, nullable=False),
        dt.Field("value", dt.float32, nullable=False),
    )


def bigwig_zoom_schema(options=None) -> Schema:
    return Schema.of(
        dt.Field("name", dt.utf8, nullable=False),
        dt.Field("start", dt.int32, nullable=False),
        dt.Field("end", dt.int32, nullable=False),
        dt.Field("total_items", dt.int32, nullable=False),
        dt.Field("bases_covered", dt.int32, nullable=False),
        dt.Field("max_value", dt.float64, nullable=False),
        dt.Field("min_value", dt.float64, nullable=False),
        dt.Field("sum_squares", dt.float64, nullable=False),
        dt.Field("sum", dt.float64, nullable=False),
    )


@dataclass
class ZoomLevel:
    reduction_level: int
    data_offset: int
    index_offset: int


@dataclass
class BbiFile:
    version: int
    chrom_names: list[str]        # by chrom id
    chrom_sizes: list[int]
    full_data_offset: int
    full_index_offset: int
    uncompress_buf_size: int
    zoom_levels: list[ZoomLevel]
    data: bytes

    @property
    def compressed(self) -> bool:
        return self.uncompress_buf_size > 0


def parse_bbi(data: bytes) -> BbiFile:
    if len(data) < 64:
        raise ExonError("not a BigWig file (too short)")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != BIGWIG_MAGIC:
        raise ExonError("not a BigWig file (bad magic)")
    (version, n_zoom, chrom_tree_off, full_data_off, full_index_off,
     _field_count, _defined_field_count, _auto_sql_off, _total_summary_off,
     uncompress_buf) = struct.unpack_from("<HHQQQHHQQI", data, 4)
    zooms = []
    off = 64
    for _ in range(n_zoom):
        red, _res, d_off, i_off = struct.unpack_from("<IIQQ", data, off)
        zooms.append(ZoomLevel(red, d_off, i_off))
        off += 24
    names, sizes = _parse_chrom_bpt(data, chrom_tree_off)
    return BbiFile(version, names, sizes, full_data_off, full_index_off,
                   uncompress_buf, zooms, data)


def _parse_chrom_bpt(data: bytes, off: int) -> tuple[list[str], list[int]]:
    magic, block_size, key_size, val_size, item_count = \
        struct.unpack_from("<IIIIQ", data, off)
    if magic != BPT_MAGIC:
        raise ExonError("BigWig: bad chromosome B+ tree magic")
    names: dict[int, str] = {}
    sizes: dict[int, int] = {}

    def walk(node_off: int) -> None:
        is_leaf, _res, count = struct.unpack_from("<BBH", data, node_off)
        p = node_off + 4
        if is_leaf:
            for _ in range(count):
                key = data[p:p + key_size].split(b"\x00", 1)[0].decode()
                chrom_id, chrom_size = struct.unpack_from("<II", data,
                                                          p + key_size)
                names[chrom_id] = key
                sizes[chrom_id] = chrom_size
                p += key_size + val_size
        else:
            children = []
            for _ in range(count):
                (child,) = struct.unpack_from("<Q", data, p + key_size)
                children.append(child)
                p += key_size + 8
            for c in children:
                walk(c)

    walk(off + 32)
    n = (max(names) + 1) if names else 0
    return ([names.get(i, "") for i in range(n)],
            [sizes.get(i, 0) for i in range(n)])


@dataclass(frozen=True)
class RTreeBlock:
    start_chrom: int
    start_base: int
    end_chrom: int
    end_base: int
    data_offset: int
    data_size: int


def rtree_blocks(data: bytes, index_offset: int,
                 query: Optional[tuple[int, int, int]] = None
                 ) -> list[RTreeBlock]:
    """All data blocks, or only those intersecting (chrom_id, start, end)."""
    magic, _block_size, _item_count = struct.unpack_from("<IIQ", data,
                                                         index_offset)
    if magic != RTREE_MAGIC:
        raise ExonError("BigWig: bad R-tree magic")
    out: list[RTreeBlock] = []

    def intersects(sc, sb, ec, eb) -> bool:
        if query is None:
            return True
        cid, qs, qe = query
        if (ec, eb) <= (cid, qs):
            return False
        if (sc, sb) >= (cid, qe):
            return False
        return True

    def walk(node_off: int) -> None:
        is_leaf, _res, count = struct.unpack_from("<BBH", data, node_off)
        p = node_off + 4
        if is_leaf:
            for _ in range(count):
                sc, sb, ec, eb, d_off, d_sz = struct.unpack_from(
                    "<IIIIQQ", data, p)
                if intersects(sc, sb, ec, eb):
                    out.append(RTreeBlock(sc, sb, ec, eb, d_off, d_sz))
                p += 32
        else:
            for _ in range(count):
                sc, sb, ec, eb, child = struct.unpack_from("<IIIIQ", data, p)
                if intersects(sc, sb, ec, eb):
                    walk(child)
                p += 24

    walk(index_offset + 48)
    return out


def _section_payload(bbi: BbiFile, block: RTreeBlock) -> bytes:
    raw = bbi.data[block.data_offset:block.data_offset + block.data_size]
    if bbi.compressed:
        return zlib.decompress(raw)
    return raw


# wig section types (Kent spec)
_BEDGRAPH, _VARSTEP, _FIXEDSTEP = 1, 2, 3


def decode_value_section(payload: bytes) -> tuple[int, np.ndarray, np.ndarray,
                                                  np.ndarray]:
    """One data section → (chrom_id, starts, ends, values), 0-based
    half-open as stored."""
    chrom_id, chrom_start, _chrom_end, item_step, item_span, sec_type, \
        _res, item_count = struct.unpack("<IIIIIBBH", payload[:24])
    body = payload[24:]
    if sec_type == _BEDGRAPH:
        rec = np.frombuffer(body, dtype="<u4,<u4,<f4", count=item_count)
        starts = rec["f0"].astype(np.int64)
        ends = rec["f1"].astype(np.int64)
        vals = rec["f2"].astype(np.float32)
    elif sec_type == _VARSTEP:
        rec = np.frombuffer(body, dtype="<u4,<f4", count=item_count)
        starts = rec["f0"].astype(np.int64)
        ends = starts + item_span
        vals = rec["f1"].astype(np.float32)
    elif sec_type == _FIXEDSTEP:
        vals = np.frombuffer(body, dtype="<f4", count=item_count).astype(
            np.float32)
        starts = chrom_start + item_step * np.arange(item_count,
                                                     dtype=np.int64)
        ends = starts + item_span
    else:
        raise ExonError(f"BigWig: unknown section type {sec_type}")
    return chrom_id, starts, ends, vals


def read_values(bbi: BbiFile, chrom_id: int, start: int, end: int
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Values for one chromosome range (clipped, like bigtools
    get_interval)."""
    blocks = rtree_blocks(bbi.data, bbi.full_index_offset,
                          (chrom_id, start, end))
    all_s, all_e, all_v = [], [], []
    for b in blocks:
        cid, s, e, v = decode_value_section(_section_payload(bbi, b))
        if cid != chrom_id:
            continue
        keep = (e > start) & (s < end)
        s, e, v = s[keep], e[keep], v[keep]
        np.clip(s, start, None, out=s)
        np.clip(e, None, end, out=e)
        all_s.append(s)
        all_e.append(e)
        all_v.append(v)
    if not all_s:
        z = np.zeros(0, np.int64)
        return z, z.copy(), np.zeros(0, np.float32)
    s = np.concatenate(all_s)
    e = np.concatenate(all_e)
    v = np.concatenate(all_v)
    order = np.argsort(s, kind="stable")
    return s[order], e[order], v[order]


_ZOOM_DTYPE = np.dtype([("chrom_id", "<u4"), ("start", "<u4"),
                        ("end", "<u4"), ("valid_count", "<u4"),
                        ("min", "<f4"), ("max", "<f4"),
                        ("sum", "<f4"), ("sum_squares", "<f4")])


def read_zoom(bbi: BbiFile, reduction_level: int, chrom_id: int, start: int,
              end: int) -> np.ndarray:
    """Zoom records (structured array) intersecting the range, unclipped
    (bigtools get_zoom_interval semantics). Errors if the exact reduction
    level is absent, like bigtools ZoomIntervalError."""
    level = next((z for z in bbi.zoom_levels
                  if z.reduction_level == reduction_level), None)
    if level is None:
        raise ExonError(
            f"BigWig: no zoom level with reduction level {reduction_level} "
            f"(available: {[z.reduction_level for z in bbi.zoom_levels]})")
    blocks = rtree_blocks(bbi.data, level.index_offset,
                          (chrom_id, start, end))
    recs = []
    for b in blocks:
        payload = _section_payload(bbi, b)
        arr = np.frombuffer(payload, dtype=_ZOOM_DTYPE)
        keep = ((arr["chrom_id"] == chrom_id) & (arr["end"] > start)
                & (arr["start"] < end))
        recs.append(arr[keep])
    if not recs:
        return np.zeros(0, _ZOOM_DTYPE)
    out = np.concatenate(recs)
    return out[np.argsort(out["start"], kind="stable")]


def _chrom_query(bbi: BbiFile, region) -> tuple[int, int, int]:
    """Resolve a Region → (chrom_id, start, end); parity quirk: the 1-based
    region start feeds the 0-based query directly
    (zoom_batch_reader.rs:124-128)."""
    try:
        cid = bbi.chrom_names.index(region.name)
    except ValueError:
        raise ExonError(f"chromosome {region.name} not found")
    start = region.start if region.start is not None else 0
    end = region.end if region.end is not None else bbi.chrom_sizes[cid]
    return cid, start, end


def _emit(schema: Schema, proj: list[str], cols_by_name: dict, n: int,
          batch_size: int) -> Iterator[Batch]:
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        cols = []
        for name in proj:
            src = cols_by_name[name]
            if isinstance(src, list):  # chrom names per row
                cols.append(utf8_column(src[lo:hi]))
            else:
                cols.append(FixedColumn(src[lo:hi],
                                        np.ones(hi - lo, bool)))
        yield batch_from_host(schema.project(proj), cols, hi - lo)


def decode_value_host(data: bytes, options: BigWigValueOptions,
                      projection: Optional[list[str]] = None
                      ) -> Iterator[Batch]:
    bbi = parse_bbi(data)
    schema = bigwig_value_schema(options)
    proj = projection if projection is not None else schema.names
    regions = list(getattr(options, "regions", ()) or ())
    if regions:
        queries = [_chrom_query(bbi, r) for r in regions]
    else:
        if not bbi.chrom_names:
            raise ExonError("no chromosomes found in bigwig file")
        queries = [(cid, 0, bbi.chrom_sizes[cid])
                   for cid in range(len(bbi.chrom_names))]
    for cid, start, end in queries:
        s, e, v = read_values(bbi, cid, start, end)
        n = len(s)
        if n == 0:
            continue
        cols = {
            "name": [bbi.chrom_names[cid]] * n,
            "start": s.astype(np.int32),
            "end": e.astype(np.int32),
            "value": v,
        }
        yield from _emit(schema, list(proj), cols, n, options.batch_size)


def decode_zoom_host(data: bytes, options: BigWigZoomOptions,
                     projection: Optional[list[str]] = None
                     ) -> Iterator[Batch]:
    bbi = parse_bbi(data)
    schema = bigwig_zoom_schema(options)
    proj = projection if projection is not None else schema.names
    regions = list(getattr(options, "regions", ()) or ())
    if regions:
        queries = [_chrom_query(bbi, r) for r in regions]
    else:
        if not bbi.chrom_names:
            raise ExonError("no chromosomes found in bigwig file")
        queries = [(cid, 0, bbi.chrom_sizes[cid])
                   for cid in range(len(bbi.chrom_names))]
    for cid, start, end in queries:
        recs = read_zoom(bbi, options.reduction_level, cid, start, end)
        n = len(recs)
        if n == 0:
            continue
        cols = {
            "name": [bbi.chrom_names[cid]] * n,
            "start": recs["start"].astype(np.int32),
            "end": recs["end"].astype(np.int32),
            # total_items is not stored in zoom records; bigtools reports 0
            "total_items": np.zeros(n, np.int32),
            "bases_covered": recs["valid_count"].astype(np.int32),
            "max_value": recs["max"].astype(np.float64),
            "min_value": recs["min"].astype(np.float64),
            "sum_squares": recs["sum_squares"].astype(np.float64),
            "sum": recs["sum"].astype(np.float64),
        }
        yield from _emit(schema, list(proj), cols, n, options.batch_size)
