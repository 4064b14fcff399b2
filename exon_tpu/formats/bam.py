"""BAM decoder: binary alignments → columnar batches.

Parity: exon-bam (same schema as SAM via exon-sam, plus BGZF container +
.bai region queries). Record boundaries are discovered with one cheap
sequential pass; every field then decodes as vectorized numpy gathers over
the flat buffer — refID/pos/flag/mapq as strided int loads, read names /
CIGAR / 4-bit packed sequences / quality arrays as flat slice gathers.

Alignment end = pos + CIGAR reference span − 1 (ops M/D/N/=/X), matching
SemiLazyRecord::alignment_end (exon-bam/src/indexed_async_batch_stream.rs:40-88).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, DictColumn, FixedColumn, Schema, VarColumn,
                     batch_from_host)
from ..errors import ExonError
from .sam import sam_schema, SamOptions
from .textutil import cumsum_exclusive

SEQ_CODE = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
CIGAR_OPS = np.frombuffer(b"MIDNSHP=X", dtype=np.uint8)
# ops that consume reference: M(0) D(2) N(3) =(7) X(8)
CIGAR_CONSUMES_REF = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=np.int64)


@dataclass
class BamOptions:
    file_extension: str = ".bam"
    batch_size: int = 8192
    parse_tags: bool = False
    projection: Optional[list[str]] = None
    regions: list = field(default_factory=list)


def bam_schema(options=None, tag_fields=None) -> Schema:
    return sam_schema(options, tag_fields)


def first_record_tags(data: bytes, header: "BamHeader") -> list[tuple]:
    """Aux tags of the first alignment record (schema inference for
    parse_tags mode, exon-sam schema_builder.rs:70-349)."""
    from .samtags import parse_bam_aux

    offsets = scan_record_offsets(data, header.header_end)
    if len(offsets) == 0:
        return []
    off = int(offsets[0])
    (block_size,) = struct.unpack_from("<i", data, off)
    # materialize just the first record (data may be an ndarray view)
    rec = bytes(memoryview(data)[off:off + 4 + block_size])
    body = 4
    l_read_name = rec[body + 8]
    (n_cigar,) = struct.unpack_from("<H", rec, body + 12)
    (l_seq,) = struct.unpack_from("<i", rec, body + 16)
    aux_start = body + 32 + l_read_name + 4 * n_cigar + (l_seq + 1) // 2 \
        + l_seq
    return parse_bam_aux(rec, aux_start, len(rec))


@dataclass
class BamHeader:
    text: str
    ref_names: list[str]
    ref_lengths: list[int]
    header_end: int  # offset of first alignment record in decompressed data


def parse_bam_header(data) -> BamHeader:
    """Parse the BAM header. ``data`` may be bytes or a uint8 ndarray (the
    zero-copy decompression view); only header bytes are materialized."""
    if bytes(memoryview(data)[:4]) != b"BAM\x01":
        raise ExonError("not a BAM file (bad magic)")
    (l_text,) = struct.unpack_from("<i", data, 4)
    text = bytes(memoryview(data)[8:8 + l_text]).split(b"\x00", 1)[0] \
        .decode("utf-8", "replace")
    off = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    names, lengths = [], []
    mv = memoryview(data)
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        names.append(bytes(mv[off:off + l_name - 1]).decode())
        off += l_name
        (l_ref,) = struct.unpack_from("<i", data, off)
        lengths.append(l_ref)
        off += 4
    return BamHeader(text, names, lengths, off)


def scan_record_offsets(data: bytes, start: int, end: Optional[int] = None
                        ) -> np.ndarray:
    """Record start offsets (pointing at block_size) in [start, end)."""
    if end is None or end >= len(data):
        from .. import native

        offs = native.bam_record_offsets(data, start)
        if offs is not None:
            return offs
    end = len(data) if end is None else min(end, len(data))
    offsets = []
    off = start
    u = struct.Struct("<i").unpack_from
    while off + 4 <= end:
        (bs,) = u(data, off)
        offsets.append(off)
        off += 4 + bs
    return np.asarray(offsets, dtype=np.int64)


def record_spans(data, offsets: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ref_id, start_1based, end_1based) per record — the cheap subset of
    decode used for host-side region filtering after an index seek (the
    reference's SemiLazyRecord::alignment_end + intersects,
    exon-bam/src/indexed_async_batch_stream.rs:40-88)."""
    from .. import native
    from .textutil import to_u8

    spans_native = native.bam_spans(to_u8(data), offsets)
    if spans_native is not None:
        rid, s, e = spans_native
        return (rid.astype(np.int64), s.astype(np.int64),
                e.astype(np.int64))
    arr = to_u8(data)
    body = offsets + 4
    ref_id = _i32(arr, body)
    pos0 = _i32(arr, body + 4)
    n_cigar = _u16(arr, body + 12)
    l_read_name = arr[body + 8].astype(np.int64)
    cigar_start = body + 32 + l_read_name
    cig_offs = cumsum_exclusive(n_cigar)
    total_ops = int(cig_offs[-1])
    spans = np.zeros(len(offsets), np.int64)
    if total_ops:
        rep = np.repeat(np.arange(len(offsets)), n_cigar)
        op_idx = np.repeat(cigar_start - 4 * cig_offs[:-1], n_cigar) + \
            4 * np.arange(total_ops, dtype=np.int64)
        opv = (arr[op_idx].astype(np.int64)
               | arr[op_idx + 1].astype(np.int64) << 8
               | arr[op_idx + 2].astype(np.int64) << 16
               | arr[op_idx + 3].astype(np.int64) << 24)
        ref_consumed = (opv >> 4) * CIGAR_CONSUMES_REF[
            np.clip(opv & 0xF, 0, 8)]
        np.add.at(spans, rep, ref_consumed)
    start = pos0 + 1
    return ref_id, start, start + spans - 1


def region_intersect_mask(data, offsets: np.ndarray, rid: int,
                          rstart: Optional[int], rend: Optional[int]
                          ) -> np.ndarray:
    """Mask of records on reference `rid` intersecting the 1-based
    inclusive interval [rstart, rend] (None = open end). Unmapped records
    (pos < 0) never match."""
    ref_id, start, end = record_spans(data, offsets)
    mask = (ref_id == rid) & (start >= 1)
    if rend is not None:
        mask &= start <= rend
    if rstart is not None:
        mask &= end >= rstart
    return mask


def read_header_prefix(raw) -> "BamHeader":
    """Parse the BAM header by decompressing only leading BGZF blocks
    (doubling until the header parses) — not the whole file."""
    from ..io import bgzf as bgzf_mod

    n = len(raw)
    take = 1 << 18
    while True:
        # cut at a block boundary <= take
        pos = 0
        try:
            while pos < n:
                size = bgzf_mod.block_size_at(raw, pos)
                if size == 0 or pos + size > take:
                    break
                pos += size
        except ValueError:
            pos = n  # not BGZF-framed beyond here; use what we have
        data = bgzf_mod.decompress_all(bytes(raw[:pos])) if pos < n \
            else bgzf_mod.decompress_all(raw)
        try:
            return parse_bam_header(data)
        except (struct.error, IndexError, ExonError):
            if pos >= n:
                raise
            take *= 4


def _i32(arr: np.ndarray, offs: np.ndarray) -> np.ndarray:
    from .. import native

    out = native.gather_le(arr, offs, 0, 4)
    if out is not None:
        return out.astype(np.int64)
    return (arr[offs].astype(np.int64)
            | arr[offs + 1].astype(np.int64) << 8
            | arr[offs + 2].astype(np.int64) << 16
            | arr[offs + 3].astype(np.int64) << 24).astype(np.int32).astype(np.int64)


def _u16(arr: np.ndarray, offs: np.ndarray) -> np.ndarray:
    from .. import native

    out = native.gather_le(arr, offs, 0, 2)
    if out is not None:
        return out.astype(np.int64)
    return (arr[offs].astype(np.int64) | arr[offs + 1].astype(np.int64) << 8)


def decode_records(data: bytes, offsets: np.ndarray, header: BamHeader,
                   options, projection: Optional[list[str]] = None
                   ) -> Iterator[Batch]:
    """Vectorized decode of alignment records at the given offsets."""
    tag_fields = None
    if getattr(options, "parse_tags", False) and len(offsets):
        from .samtags import infer_tag_fields, parse_bam_aux

        first_off = int(offsets[0])
        schema_probe = BamHeader(header.text, header.ref_names,
                                 header.ref_lengths, first_off)
        tag_fields = infer_tag_fields(first_record_tags(data, schema_probe))
    schema = bam_schema(options, tag_fields)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    n_total = len(offsets)
    if n_total == 0:
        return
    arr = np.frombuffer(data, np.uint8)
    bs = options.batch_size
    _tag_cache: list = []

    def _tag_data():
        # parse_bam_aux needs real bytes; convert the file at most once
        if not _tag_cache:
            _tag_cache.append(data if isinstance(data, (bytes, bytearray))
                              else arr.tobytes())
        return _tag_cache[0]

    # per-field decode requirements: everything below is computed lazily so
    # a narrow projection (COUNT(*) projects one fixed column) touches only
    # the bytes it needs — the gathers dominate host decode time
    for lo in range(0, n_total, bs):
        hi = min(lo + bs, n_total)
        offs = offsets[lo:hi]
        n = hi - lo
        body = offs + 4  # past block_size
        memo: dict = {}

        def F(key, _memo=memo, _body=body, _n=n):
            v = _memo.get(key)
            if v is not None:
                return v
            if key == "ref_id":
                v = _i32(arr, _body)
            elif key == "pos0":
                v = _i32(arr, _body + 4)  # 0-based
            elif key == "l_read_name":
                v = arr[_body + 8].astype(np.int64)
            elif key == "mapq":
                v = arr[_body + 9].astype(np.int64)
            elif key == "n_cigar":
                v = _u16(arr, _body + 12)
            elif key == "flag":
                v = _u16(arr, _body + 14)
            elif key == "l_seq":
                v = _i32(arr, _body + 16)
            elif key == "next_ref_id":
                v = _i32(arr, _body + 20)
            elif key == "name_start":
                v = _body + 32
            elif key == "cigar_start":
                v = F("name_start") + F("l_read_name")
            elif key == "seq_start":
                v = F("cigar_start") + 4 * F("n_cigar")
            elif key == "qual_start":
                v = F("seq_start") + (F("l_seq") + 1) // 2
            elif key == "cigar_walk":
                n_cigar = F("n_cigar")
                cigar_start = F("cigar_start")
                cig_offs = cumsum_exclusive(n_cigar)
                total_ops = int(cig_offs[-1])
                if total_ops:
                    rep = np.repeat(np.arange(_n), n_cigar)
                    op_idx = np.repeat(cigar_start - 4 * cig_offs[:-1],
                                       n_cigar) + \
                        4 * np.arange(total_ops, dtype=np.int64)
                    opv = (arr[op_idx].astype(np.int64)
                           | arr[op_idx + 1].astype(np.int64) << 8
                           | arr[op_idx + 2].astype(np.int64) << 16
                           | arr[op_idx + 3].astype(np.int64) << 24)
                    op_len = opv >> 4
                    op_code = (opv & 0xF).astype(np.int64)
                    ref_consumed = op_len * CIGAR_CONSUMES_REF[
                        np.clip(op_code, 0, 8)]
                    spans = np.zeros(_n, np.int64)
                    np.add.at(spans, rep, ref_consumed)
                else:
                    rep = np.zeros(0, np.int64)
                    op_len = op_code = np.zeros(0, np.int64)
                    spans = np.zeros(_n, np.int64)
                v = (rep, op_len, op_code, spans)
            else:
                raise KeyError(key)
            _memo[key] = v
            return v

        cols = []
        for name in proj:
            if name == "name":
                name_start = F("name_start")
                l_read_name = F("l_read_name")
                # name excludes trailing NUL
                from .textutil import gather_slices

                v, o = gather_slices(arr, name_start, name_start + l_read_name - 1)
                # '*' names come through as missing (l_read_name == 1 → NUL only)
                valid = l_read_name > 1
                cols.append(VarColumn(v, o.astype(np.int32), valid))
            elif name == "flag":
                cols.append(FixedColumn(F("flag").astype(np.int32),
                                        np.ones(n, bool)))
            elif name in ("reference", "mate_reference"):
                rid = F("ref_id") if name == "reference" else F("next_ref_id")
                valid = (rid >= 0) & (rid < len(header.ref_names))
                codes = np.clip(rid, 0, max(len(header.ref_names) - 1, 0))
                cols.append(DictColumn(codes.astype(np.int32), valid,
                                       tuple(header.ref_names)))
            elif name == "start":
                cols.append(FixedColumn(F("pos0") + 1, F("pos0") >= 0))
            elif name == "end":
                spans = F("cigar_walk")[3]
                cols.append(FixedColumn(F("pos0") + spans, F("pos0") >= 0))
            elif name == "mapping_quality":
                cols.append(_int_to_utf8(F("mapq"), null_value=255))
            elif name == "cigar":
                # render ops to text: digits + op letter per op
                rep, op_len, op_code, _spans = F("cigar_walk")
                cols.append(_render_cigar(n, rep, op_len, op_code,
                                          F("n_cigar")))
            elif name == "sequence":
                cols.append(_decode_seq(arr, F("seq_start"), F("l_seq")))
            elif name == "quality_score":
                from .textutil import gather_slices

                qual_start = F("qual_start")
                v, o = gather_slices(arr, qual_start, qual_start + F("l_seq"))
                # 0xFF means missing quality ('*')
                cols.append(VarColumn(v.astype(np.int64), o.astype(np.int32),
                                      np.ones(n, bool)))
            elif name == "tags":
                from .samtags import (parse_bam_aux, tags_list_column,
                                      tags_struct_column)

                aux_start = F("qual_start") + F("l_seq")
                block_size = _i32(arr, offs)
                rec_end = offs + 4 + block_size
                tag_data = _tag_data()
                per_row = [parse_bam_aux(tag_data, int(aux_start[i]),
                                         int(rec_end[i]))
                           for i in range(n)]
                if tag_fields is not None:
                    cols.append(tags_struct_column(per_row, tag_fields))
                else:
                    cols.append(tags_list_column(per_row))
            else:
                raise KeyError(name)
        yield batch_from_host(out_schema, cols, n)


def _int_to_utf8(vals: np.ndarray, null_value: Optional[int] = None) -> VarColumn:
    """Vectorized non-negative int → decimal string column."""
    n = len(vals)
    v = np.maximum(vals, 0)
    digits = np.maximum(np.floor(np.log10(np.maximum(v, 1))).astype(np.int64) + 1, 1)
    offs = cumsum_exclusive(digits)
    total = int(offs[-1])
    buf = np.zeros(total, np.uint8)
    last = offs[1:] - 1
    work = v.copy()
    for d in range(int(digits.max()) if n else 0):
        active = d < digits
        buf[last[active] - d] = (work[active] % 10 + ord("0")).astype(np.uint8)
        work = work // 10
    valid = np.ones(n, bool) if null_value is None else (vals != null_value)
    return VarColumn(buf, offs.astype(np.int32), valid)


def _render_cigar(n: int, rep, op_len, op_code, n_cigar) -> VarColumn:
    if len(op_len) == 0:
        off = np.zeros(n + 1, np.int32)
        return VarColumn(np.zeros(0, np.uint8), off, np.ones(n, bool))
    digits = np.maximum(np.floor(np.log10(np.maximum(op_len, 1))).astype(np.int64) + 1, 1)
    op_width = digits + 1
    # per-op text buffer
    op_text_off = cumsum_exclusive(op_width)
    total = int(op_text_off[-1])
    buf = np.zeros(total, np.uint8)
    # write digits right-to-left
    letter_pos = op_text_off[1:] - 1
    buf[letter_pos] = CIGAR_OPS[np.clip(op_code, 0, 8)]
    vals = op_len.copy()
    max_digits = int(digits.max())
    for d in range(max_digits):
        posn = letter_pos - 1 - d
        active = d < digits
        buf[posn[active]] = (vals[active] % 10 + ord("0")).astype(np.uint8)
        vals = vals // 10
    per_rec = np.zeros(n, np.int64)
    np.add.at(per_rec, rep, op_width)
    offs = cumsum_exclusive(per_rec)
    return VarColumn(buf, offs.astype(np.int32), np.ones(n, bool))


def _decode_seq(arr: np.ndarray, seq_start: np.ndarray, l_seq: np.ndarray
                ) -> VarColumn:
    n = len(seq_start)
    offs = cumsum_exclusive(l_seq)
    total = int(offs[-1])
    if total == 0:
        return VarColumn(np.zeros(0, np.uint8), offs.astype(np.int32),
                         np.ones(n, bool))
    rec = np.repeat(np.arange(n), l_seq)
    pos_in_rec = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], l_seq)
    byte_idx = np.repeat(seq_start, l_seq) + pos_in_rec // 2
    nib = np.where(pos_in_rec % 2 == 0, arr[byte_idx] >> 4, arr[byte_idx] & 0xF)
    return VarColumn(SEQ_CODE[nib], offs.astype(np.int32), np.ones(n, bool))


def decode_host(data: bytes, options: BamOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    """Full-file decode (data = decompressed BAM)."""
    header = parse_bam_header(data)
    offsets = scan_record_offsets(data, header.header_end)
    yield from decode_records(data, offsets, header, options, projection)
