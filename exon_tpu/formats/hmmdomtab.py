"""HMMER domain table (hmmdomtab) decoder.

Parity: exon-core/src/datasources/hmmdomtab/hmm_dom_schema_builder.rs:44-66 —
23 whitespace-separated columns ('#' comment lines skipped). The final
``description`` column absorbs the rest of the line.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import Batch, FixedColumn, Schema, VarColumn, batch_from_host
from .textutil import (LineIndex, gather_slices, parse_float_fields,
                       parse_int_fields, to_u8)

_COLUMNS = [
    ("target_name", "utf8"), ("target_accession", "utf8"), ("tlen", "int"),
    ("query_name", "utf8"), ("accession", "utf8"), ("qlen", "int"),
    ("evalue", "float"), ("sequence_score", "float"), ("bias", "float"),
    ("domain_number", "int"), ("ndom", "int"),
    ("conditional_evalue", "float"), ("independent_evalue", "float"),
    ("domain_score", "float"), ("domain_bias", "float"),
    ("hmm_from", "int"), ("hmm_to", "int"), ("ali_from", "int"),
    ("ali_to", "int"), ("env_from", "int"), ("env_to", "int"),
    ("accuracy", "float"), ("description", "utf8"),
]


@dataclass
class HmmDomTabOptions:
    file_extension: str = ".hmmdomtab"
    batch_size: int = 8192
    projection: Optional[list[str]] = None


def hmmdomtab_schema(options=None) -> Schema:
    fields = []
    for name, kind in _COLUMNS:
        dtype = {"utf8": dt.utf8, "int": dt.int64, "float": dt.float64}[kind]
        fields.append(dt.Field(name, dtype, nullable=False))
    return Schema(tuple(fields))


def split_whitespace_fields(arr: np.ndarray, starts: np.ndarray,
                            ends: np.ndarray, n_fields: int
                            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split lines on runs of spaces/tabs into up to n_fields tokens; the
    last field extends to the line end."""
    n = len(starts)
    is_ws = (arr == 32) | (arr == 9)
    prev_ws = np.concatenate([[True], is_ws[:-1]])
    tok_start_mask = ~is_ws & prev_ws
    tstarts_all = np.flatnonzero(tok_start_mask)
    # keep tokens inside line ranges
    row = np.searchsorted(starts, tstarts_all, side="right") - 1
    ok = (row >= 0) & (tstarts_all < ends[np.clip(row, 0, max(n - 1, 0))]) \
        & (tstarts_all >= starts[np.clip(row, 0, max(n - 1, 0))])
    tstarts = tstarts_all[ok]
    trow = row[ok]
    ws_pos = np.flatnonzero(is_ws)
    i = np.searchsorted(ws_pos, tstarts)
    tends = np.where(i < len(ws_pos), ws_pos[np.clip(i, 0, max(len(ws_pos) - 1, 0))],
                     len(arr))
    tends = np.minimum(tends, ends[np.clip(trow, 0, max(n - 1, 0))])
    # rank within row
    first_of_row = np.ones(len(trow), bool)
    first_of_row[1:] = trow[1:] != trow[:-1]
    row_tok_start = np.zeros(len(trow), np.int64)
    idxs = np.flatnonzero(first_of_row)
    row_tok_start[idxs] = np.arange(len(trow), dtype=np.int64)[idxs]
    np.maximum.accumulate(row_tok_start, out=row_tok_start)
    rank = np.arange(len(trow), dtype=np.int64) - row_tok_start

    fs = np.zeros((n, n_fields), np.int64)
    fe = np.zeros((n, n_fields), np.int64)
    present = np.zeros((n, n_fields), bool)
    use = rank < n_fields
    fs[trow[use], rank[use]] = tstarts[use]
    fe[trow[use], rank[use]] = tends[use]
    present[trow[use], rank[use]] = True
    # last field runs to line end
    last = n_fields - 1
    fe[:, last] = np.where(present[:, last], ends, fe[:, last])
    return fs, fe, present


def decode_host(data: bytes, options: HmmDomTabOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    schema = hmmdomtab_schema(options)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    arr = to_u8(data)
    if len(arr) == 0:
        return
    li = LineIndex(arr)
    fb = li.first_bytes()
    li = li.select((fb != ord("#")) & (li.ends > li.starts))
    n = len(li)
    if n == 0:
        return
    fs, fe, present = split_whitespace_fields(arr, li.starts, li.ends, 23)
    col_meta = {name: (i, kind) for i, (name, kind) in enumerate(_COLUMNS)}
    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        for name in proj:
            i, kind = col_meta[name]
            s, e = fs[lo:hi, i], fe[lo:hi, i]
            pres = present[lo:hi, i]
            if kind == "utf8":
                v, o = gather_slices(arr, s, e)
                cols.append(VarColumn(v, o.astype(np.int32), pres.copy()))
            elif kind == "int":
                vals, ok = parse_int_fields(arr, s, e)
                cols.append(FixedColumn(vals, ok & pres))
            else:
                vals, ok = parse_float_fields(arr, s, e)
                cols.append(FixedColumn(np.where(ok, vals, 0.0), ok & pres))
        yield batch_from_host(out_schema, cols, hi - lo)
