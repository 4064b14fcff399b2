"""BED decoder (3–12 column variants).

Parity: exon-bed/src/schema.rs:33-46 — fields reference_sequence_name,
start, end, name, score, strand, thick_start, thick_end, color,
block_count, block_sizes, block_starts; ``n_fields`` selects the prefix.
0-based half-open intervals (as in the file); '#'/track/browser lines
skipped; '.' → null for optional fields.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import Batch, FixedColumn, Schema, VarColumn, batch_from_host
from .dictenc import dict_encode_slices
from .textutil import (LineIndex, gather_slices, parse_int_fields,
                       split_fields, to_u8)

_FIELDS = [
    ("reference_sequence_name", "dict", False),
    ("start", "int", False),
    ("end", "int", False),
    ("name", "utf8", True),
    ("score", "int", True),
    ("strand", "dict", True),
    ("thick_start", "int", True),
    ("thick_end", "int", True),
    ("color", "utf8", True),
    ("block_count", "int", True),
    ("block_sizes", "utf8", True),
    ("block_starts", "utf8", True),
]


@dataclass
class BedOptions:
    file_extension: str = ".bed"
    batch_size: int = 8192
    n_fields: int = 12
    projection: Optional[list[str]] = None


def bed_schema(options: BedOptions = None) -> Schema:
    n = options.n_fields if options else 12
    fields = []
    for name, kind, nullable in _FIELDS[:n]:
        dtype = {"dict": dt.dictionary, "int": dt.int64, "utf8": dt.utf8}[kind]
        fields.append(dt.Field(name, dtype, nullable))
    return Schema(tuple(fields))


def decode_host(data: bytes, options: BedOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    schema = bed_schema(options)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    arr = to_u8(data)
    if len(arr) == 0:
        return
    li = LineIndex(arr)
    fb = li.first_bytes()
    keep = (li.ends > li.starts) & (fb != ord("#"))
    # skip 'track'/'browser' header lines
    for k in np.flatnonzero(keep):
        head = bytes(arr[li.starts[k]: min(li.starts[k] + 7, li.ends[k])])
        if head.startswith(b"track") or head.startswith(b"browser"):
            keep[k] = False
        else:
            break
    li = li.select(keep)
    n = len(li)
    if n == 0:
        return
    nf = options.n_fields
    fs, fe, present = split_fields(arr, li.starts, li.ends, nf)

    field_meta = {name: (i, kind, nullable)
                  for i, (name, kind, nullable) in enumerate(_FIELDS[:nf])}
    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        for name in proj:
            i, kind, nullable = field_meta[name]
            s, e = fs[lo:hi, i], fe[lo:hi, i]
            pres = present[lo:hi, i]
            dot = (e - s == 1) & (arr[np.clip(s, 0, len(arr) - 1)] == ord("."))
            if kind == "dict":
                cols.append(dict_encode_slices(arr, s, e, pres & ~(dot & np.asarray(nullable))))
            elif kind == "int":
                vals, ok = parse_int_fields(arr, s, e)
                cols.append(FixedColumn(vals, ok & pres))
            else:
                v, o = gather_slices(arr, s, e)
                cols.append(VarColumn(v, o.astype(np.int32), pres & ~dot))
        yield batch_from_host(out_schema, cols, hi - lo)
