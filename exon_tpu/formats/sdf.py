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


def _split_records(data: bytes) -> list[list[bytes]]:
    """Record line-lists split on '$$$$' terminator lines."""
    lines = data.split(b"\n")
    records: list[list[bytes]] = []
    cur: list[bytes] = []
    for line in lines:
        if line.endswith(b"\r"):
            line = line[:-1]
        if line.strip() == b"$$$$":
            records.append(cur)
            cur = []
        else:
            cur.append(line)
    if any(l.strip() for l in cur):
        records.append(cur)
    return records


def decode_host(data: bytes, options: SdfOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    records = _split_records(data)
    n = len(records)
    if n == 0:
        return
    headers: list[str] = []
    atom_counts = np.zeros(n, np.uint32)
    bond_counts = np.zeros(n, np.uint32)
    data_maps: list[dict] = []
    key_order: list[str] = []
    seen_keys = set()
    for i, lines in enumerate(records):
        hdr = [l.strip().decode("utf-8", "replace") for l in lines[:3]]
        headers.append("\n".join(h for h in hdr if h))
        if len(lines) > 3:
            counts = lines[3]
            try:
                atom_counts[i] = int(counts[0:3])
                bond_counts[i] = int(counts[3:6])
            except (ValueError, IndexError):
                raise ExonError(f"invalid SDF counts line: {counts!r}")
        props: dict = {}
        j = 4 + int(atom_counts[i]) + int(bond_counts[i])
        while j < len(lines):
            m = _KEY_RE.match(lines[j])
            if m:
                key = m.group(1).decode("utf-8", "replace")
                vals = []
                j += 1
                while j < len(lines) and lines[j].strip():
                    vals.append(lines[j].decode("utf-8", "replace"))
                    j += 1
                props[key] = "\n".join(vals)
                if key not in seen_keys:
                    seen_keys.add(key)
                    key_order.append(key)
            j += 1
        data_maps.append(props)

    keys = options.data_keys or (tuple(key_order) if key_order
                                 else ("canonical_smiles",))
    schema = sdf_schema(options, keys)
    proj = projection or schema.names
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
