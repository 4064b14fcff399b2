"""SAM decoder → columnar batches.

Parity: exon-sam (schema_builder.rs:385-401, array_builder.rs append()):
``name, flag(Int32), reference, start, end, mapping_quality(Utf8), cigar,
mate_reference, sequence, quality_score(List<Int64>)`` — start/end 1-based
inclusive with end = start + CIGAR reference span − 1; mapping quality 255 →
null, rendered as a decimal string; '=' mate reference resolves to RNAME;
quality scores are Phred+33 integer lists.

CIGAR spans are computed vectorized: op letters act as separators, the digit
runs parse with the branchless int parser, and reference-consuming ops
(M/D/N/=/X) bincount-sum per row.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, FixedColumn, Schema, VarColumn, batch_from_host)
from .dictenc import dict_encode_slices
from .textutil import (LineIndex, cumsum_exclusive, gather_slices,
                       parse_int_fields, split_fields, to_u8)


@dataclass
class SamOptions:
    file_extension: str = ".sam"
    batch_size: int = 8192
    parse_tags: bool = False
    projection: Optional[list[str]] = None


def sam_schema(options=None, tag_fields=None) -> Schema:
    from .samtags import tags_field

    parse_tags = getattr(options, "parse_tags", False) if options else False
    return Schema.of(
        dt.Field("name", dt.utf8, nullable=False),
        dt.Field("flag", dt.int32, nullable=False),
        dt.Field("reference", dt.dictionary, nullable=True),
        dt.Field("start", dt.int64, nullable=True),
        dt.Field("end", dt.int64, nullable=True),
        dt.Field("mapping_quality", dt.utf8, nullable=True),
        dt.Field("cigar", dt.utf8, nullable=False),
        dt.Field("mate_reference", dt.dictionary, nullable=True),
        dt.Field("sequence", dt.utf8, nullable=False),
        dt.Field("quality_score", dt.list_(dt.int64), nullable=False),
        tags_field(parse_tags, tag_fields),
    )


def parse_text_tags(arr: np.ndarray, s: int, e: int) -> list[tuple]:
    """One line's tag region (``TT:T:value`` tab-joined) → [(tag,typ,val)]."""
    from .samtags import parse_sam_text_value

    out = []
    if e <= s:
        return out
    for piece in arr[s:e].tobytes().split(b"\t"):
        if len(piece) < 5 or piece[2] != ord(":") or piece[4] != ord(":"):
            continue
        tag = piece[:2].decode("ascii", "replace")
        typ = chr(piece[3])
        out.append((tag, typ, parse_sam_text_value(typ, piece[5:])))
    return out


def cigar_ref_spans(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray
                    ) -> np.ndarray:
    """Reference-consuming span per CIGAR slice (M/D/N/=/X ops)."""
    n = len(starts)
    a, roff = gather_slices(arr, starts, ends)
    if len(a) == 0:
        return np.zeros(n, np.int64)
    is_digit = (a >= ord("0")) & (a <= ord("9"))
    letters = np.flatnonzero(~is_digit)
    if len(letters) == 0:
        return np.zeros(n, np.int64)
    # number slice for letter k: (prev boundary, letter_pos)
    row_of_letter = np.searchsorted(roff[1:], letters, side="right")
    prev = np.concatenate([[-1], letters[:-1]])
    row_start = roff[:-1][np.clip(row_of_letter, 0, max(n - 1, 0))]
    num_starts = np.maximum(prev + 1, row_start)
    nums, ok = parse_int_fields(a, num_starts, letters)
    consumes = np.isin(a[letters], np.frombuffer(b"MDN=X", dtype=np.uint8))
    contrib = np.where(consumes & ok, nums, 0)
    out = np.zeros(n, np.int64)
    np.add.at(out, row_of_letter, contrib)
    return out


def decode_host(data: bytes, options: SamOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    arr = to_u8(data)
    if len(arr) == 0:
        return
    li = LineIndex(arr)
    fb = li.first_bytes()
    li = li.select((fb != ord("@")) & (li.ends > li.starts))
    n = len(li)
    if n == 0:
        return
    fs, fe, present = split_fields(arr, li.starts, li.ends, 12)
    tag_fields = None
    if getattr(options, "parse_tags", False) and n:
        from .samtags import infer_tag_fields

        first = parse_text_tags(arr, int(fs[0, 11]), int(fe[0, 11])) \
            if present[0, 11] else []
        tag_fields = infer_tag_fields(first)
    schema = sam_schema(options, tag_fields)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)

    def is_star(s, e):
        return (e - s == 1) & (arr[np.clip(s, 0, len(arr) - 1)] == ord("*"))

    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        # precompute start/end shared by both columns
        pos_vals, pos_ok = parse_int_fields(arr, fs[lo:hi, 3], fe[lo:hi, 3])
        has_start = pos_ok & (pos_vals > 0)
        for name in proj:
            if name == "name":
                s, e = fs[lo:hi, 0], fe[lo:hi, 0]
                v, o = gather_slices(arr, s, e)
                cols.append(VarColumn(v, o.astype(np.int32), ~is_star(s, e)))
            elif name == "flag":
                vals, ok = parse_int_fields(arr, fs[lo:hi, 1], fe[lo:hi, 1])
                cols.append(FixedColumn(vals.astype(np.int32), ok))
            elif name == "reference":
                s, e = fs[lo:hi, 2], fe[lo:hi, 2]
                cols.append(dict_encode_slices(arr, s, e, ~is_star(s, e)))
            elif name == "start":
                cols.append(FixedColumn(pos_vals, has_start.copy()))
            elif name == "end":
                spans = cigar_ref_spans(arr, fs[lo:hi, 5], fe[lo:hi, 5])
                ends = pos_vals + spans - 1
                cols.append(FixedColumn(ends, has_start.copy()))
            elif name == "mapping_quality":
                s, e = fs[lo:hi, 4], fe[lo:hi, 4]
                mq, ok = parse_int_fields(arr, s, e)
                v, o = gather_slices(arr, s, e)
                cols.append(VarColumn(v, o.astype(np.int32), ok & (mq != 255)))
            elif name == "cigar":
                v, o = gather_slices(arr, fs[lo:hi, 5], fe[lo:hi, 5])
                cols.append(VarColumn(v, o.astype(np.int32),
                                      np.ones(hi - lo, bool)))
            elif name == "mate_reference":
                s, e = fs[lo:hi, 6], fe[lo:hi, 6]
                # '=' → same as RNAME
                eq = (e - s == 1) & (arr[np.clip(s, 0, len(arr) - 1)] == ord("="))
                rs, re_ = fs[lo:hi, 2], fe[lo:hi, 2]
                ms = np.where(eq, rs, s)
                me = np.where(eq, re_, e)
                null = is_star(ms, me)
                cols.append(dict_encode_slices(arr, ms, me, ~null))
            elif name == "sequence":
                v, o = gather_slices(arr, fs[lo:hi, 9], fe[lo:hi, 9])
                cols.append(VarColumn(v, o.astype(np.int32),
                                      np.ones(hi - lo, bool)))
            elif name == "quality_score":
                s, e = fs[lo:hi, 10], fe[lo:hi, 10]
                star = is_star(s, e)
                s2 = np.where(star, 0, s)
                e2 = np.where(star, 0, e)
                v, o = gather_slices(arr, s2, e2)
                scores = v.astype(np.int64) - 33
                cols.append(VarColumn(scores, o.astype(np.int32),
                                      np.ones(hi - lo, bool)))
            elif name == "tags":
                from .samtags import tags_list_column, tags_struct_column

                per_row = [
                    parse_text_tags(arr, int(fs[i, 11]), int(fe[i, 11]))
                    if present[i, 11] else []
                    for i in range(lo, hi)]
                if tag_fields is not None:
                    cols.append(tags_struct_column(per_row, tag_fields))
                else:
                    cols.append(tags_list_column(per_row))
            else:
                raise KeyError(name)
        yield batch_from_host(out_schema, cols, hi - lo)
