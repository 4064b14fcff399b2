"""SDF/MOL (chemistry) decoder.

Parity: exon-sdf (schema_builder.rs:25-49, record.rs:103-190): records
separated by ``$$$$`` lines; schema ``header`` (first 3 lines, trimmed
non-empty joined with newlines), ``atom_count``/``bond_count`` (UInt32 from
the counts line), and ``data`` — a struct with one Utf8 field per property
key (``> <key>`` sections), inferred from the file.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, FixedColumn, Schema, StructColumn, VarColumn,
                     batch_from_host, utf8_column)
from ..errors import ExonError
from .textutil import LineIndex, to_u8

_KEY_RE = re.compile(rb">\s*<(.*?)>")


@dataclass
class SdfOptions:
    file_extension: str = ".sdf"
    batch_size: int = 8192
    projection: Optional[list[str]] = None
    # table-level data-struct keys (inferred by SdfTable; None → per-buffer)
    data_keys: Optional[tuple] = None


def sdf_schema(options=None, data_keys: tuple[str, ...] = ("canonical_smiles",)
               ) -> Schema:
    data_t = dt.struct([dt.Field(k, dt.utf8, True) for k in data_keys])
    return Schema.of(
        dt.Field("header", dt.utf8, nullable=False),
        dt.Field("atom_count", dt.uint32, nullable=False),
        dt.Field("bond_count", dt.uint32, nullable=False),
        dt.Field("data", data_t, nullable=False),
    )


def _record_line_spans(arr: np.ndarray, li: LineIndex
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(first_line, terminator_line) per record, split on lines that are
    exactly '$$$$' (CR already stripped) — the reference terminates a
    record only on ``buf.ends_with(b"$$$$\\n"|b"$$$$\\r\\n")``
    (exon-sdf/src/io.rs:34-46), so leading/trailing whitespace does NOT
    make a terminator."""
    from .. import native

    starts, ends = li.starts, li.ends
    lens = ends - starts
    nl = len(starts)
    is_term = native.sdf_terms(arr, starts, ends)
    if is_term is not None:
        term = np.flatnonzero(is_term).astype(np.int64)
    else:
        idx = np.flatnonzero(lens == 4)
        if len(idx):
            s = starts[idx]
            is4 = ((arr[s] == 36) & (arr[s + 1] == 36)
                   & (arr[s + 2] == 36) & (arr[s + 3] == 36))
            term = idx[is4].astype(np.int64)
        else:
            term = idx.astype(np.int64)
    first = np.empty(len(term), np.int64)
    if len(term):
        first[0] = 0
        first[1:] = term[:-1] + 1
    # trailing lines after the last terminator form a record iff any is
    # non-blank (matches the reference's tail handling)
    tail_start = int(term[-1]) + 1 if len(term) else 0
    if tail_start < nl:
        tail_nonblank = False
        for i in range(tail_start, nl):
            if bytes(arr[starts[i]:ends[i]]).strip():
                tail_nonblank = True
                break
        if tail_nonblank:
            first = np.append(first, tail_start)
            term = np.append(term, nl)
    return first, term


def _parse_counts(arr: np.ndarray, li: LineIndex, first: np.ndarray,
                  term: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized %3d%3d counts-line parse (line 4 of each record)."""
    n = len(first)
    atom = np.zeros(n, np.int64)
    bond = np.zeros(n, np.int64)
    has = first + 3 < term  # record has >3 lines
    rows = np.flatnonzero(has)
    if not len(rows):
        return atom.astype(np.uint32), bond.astype(np.uint32)
    cl = first[rows] + 3
    cs, ce = li.starts[cl], li.ends[cl]
    ok = (ce - cs) >= 6
    vals = []
    for fld in range(2):
        v = np.zeros(len(rows), np.int64)
        digits = []
        for k in range(3):
            pos = np.minimum(cs + 3 * fld + k, len(arr) - 1)
            ch = arr[pos]
            digit = (ch >= 48) & (ch <= 57)
            ok &= digit | (ch == 32)
            v = np.where(digit, v * 10 + (ch - 48), v)
            digits.append(digit)
        ok &= digits[0] | digits[1] | digits[2]
        # reference trims then parses the 3-char field
        # (record.rs parse_counts_line), so interleaved digits/spaces
        # like '1 2' are a parse error, not 12
        ok &= ~(digits[0] & ~digits[1] & digits[2])
        vals.append(v)
    if not ok.all():
        bad = int(rows[np.flatnonzero(~ok)[0]])
        line = bytes(arr[li.starts[first[bad] + 3]:li.ends[first[bad] + 3]])
        raise ExonError(f"invalid SDF counts line: {line!r}")
    atom[rows], bond[rows] = vals
    return atom.astype(np.uint32), bond.astype(np.uint32)


def _headers(arr: np.ndarray, li: LineIndex, first: np.ndarray,
             term: np.ndarray) -> list[str]:
    """First 3 lines per record, stripped, non-empty joined with '\\n'."""
    starts, ends = li.starts, li.ends
    out = []
    for f, t in zip(first, term):
        hi = min(f + 3, t)
        parts = [bytes(arr[starts[j]:ends[j]]).strip().decode(
            "utf-8", "replace") for j in range(f, hi)]
        out.append("\n".join(p for p in parts if p))
    return out


def _data_sections(arr: np.ndarray, li: LineIndex, first: np.ndarray,
                   term: np.ndarray, atom: np.ndarray, bond: np.ndarray
                   ) -> tuple[list[dict], list[str]]:
    """'> <key>' property sections per record (values until blank line)."""
    starts, ends = li.starts, li.ends
    lens = ends - starts
    n = len(first)
    # candidate key lines: start with '>'
    gt = np.flatnonzero((lens >= 1) & (arr[np.minimum(
        starts, len(arr) - 1)] == 62))
    rec_of = np.searchsorted(term, gt, side="right")
    data_maps: list[dict] = [dict() for _ in range(n)]
    key_order: list[str] = []
    seen_keys: set = set()
    blank = lens == 0  # post-strip blank (LineIndex strips \r already)
    # a line of spaces also terminates a value block
    for j, r in zip(gt, rec_of):
        if r >= n:
            continue
        body_start = first[r] + 4 + int(atom[r]) + int(bond[r])
        if j < body_start or j >= term[r]:
            continue
        m = _KEY_RE.match(bytes(arr[starts[j]:ends[j]]))
        if not m:
            continue
        key = m.group(1).decode("utf-8", "replace")
        vals = []
        k = j + 1
        while k < term[r]:
            if blank[k] or not bytes(arr[starts[k]:ends[k]]).strip():
                break
            vals.append(bytes(arr[starts[k]:ends[k]]).decode(
                "utf-8", "replace"))
            k += 1
        data_maps[r][key] = "\n".join(vals)
        if key not in seen_keys:
            seen_keys.add(key)
            key_order.append(key)
    return data_maps, key_order


def decode_host(data: bytes, options: SdfOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    from .. import native

    arr = to_u8(data)
    if projection == [] and options.data_keys is not None:
        # COUNT(*): record count needs only the terminator scan — one
        # native pass, no line table, no field parse
        total = native.sdf_count(arr)
        if total is not None:
            schema = sdf_schema(options, options.data_keys)
            empty = schema.project([])
            bs = options.batch_size
            for lo in range(0, total, bs):
                yield batch_from_host(empty, [], min(bs, total - lo))
            return
    scan = native.tsv_scan(arr, keep_empty=True)
    if scan is not None:
        li = LineIndex.__new__(LineIndex)
        li.arr, (li.starts, li.ends, _d) = arr, scan
    else:
        li = LineIndex(arr)
    first, term = _record_line_spans(arr, li)
    n = len(first)
    if n == 0:
        return
    # column work is projection-gated: a COUNT(*) scan parses nothing
    # beyond record spans; counts parse only when needed
    need_keys = options.data_keys is None
    proj_set = set(projection) if projection is not None else None
    want = lambda c: proj_set is None or c in proj_set
    need_counts = want("atom_count") or want("bond_count") or want("data")
    if need_counts:
        atom_counts, bond_counts = _parse_counts(arr, li, first, term)
    else:
        atom_counts = bond_counts = np.zeros(n, np.uint32)
    headers = _headers(arr, li, first, term) if want("header") else None
    data_maps: Optional[list[dict]] = None
    key_order: list[str] = []
    if want("data") or need_keys:
        data_maps, key_order = _data_sections(arr, li, first, term,
                                              atom_counts, bond_counts)
    keys = options.data_keys or (tuple(key_order) if key_order
                                 else ("canonical_smiles",))
    schema = sdf_schema(options, keys)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        for name in proj:
            if name == "header":
                cols.append(utf8_column(headers[lo:hi]))
            elif name == "atom_count":
                cols.append(FixedColumn(atom_counts[lo:hi],
                                        np.ones(hi - lo, bool)))
            elif name == "bond_count":
                cols.append(FixedColumn(bond_counts[lo:hi],
                                        np.ones(hi - lo, bool)))
            elif name == "data":
                children = {}
                for k in keys:
                    children[k] = utf8_column(
                        [data_maps[i].get(k) for i in range(lo, hi)])
                cols.append(StructColumn(children, np.ones(hi - lo, bool)))
        yield batch_from_host(out_schema, cols, hi - lo)
