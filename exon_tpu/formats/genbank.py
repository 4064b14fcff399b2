"""GenBank flat-file decoder.

Parity: exon-genbank (config.rs:22-60): schema ``sequence, accession,
comments(List<Utf8>), contig, date, dblink, definition, division, keywords,
molecule_type, name, source, version, topology,
features(List<Struct{kind, location, qualifiers List<Struct{keys,values}>}>)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, ListColumn, Schema, StructColumn, VarColumn,
                     batch_from_host, utf8_column)
from .textutil import cumsum_exclusive

QUALIFIER_T = dt.list_(dt.struct([
    dt.Field("keys", dt.utf8, False),
    dt.Field("values", dt.utf8, True),
]))
FEATURE_T = dt.list_(dt.struct([
    dt.Field("kind", dt.utf8, False),
    dt.Field("location", dt.utf8, False),
    dt.Field("qualifiers", QUALIFIER_T, True),
]))


@dataclass
class GenbankOptions:
    file_extension: str = ".gb"
    batch_size: int = 8192
    projection: Optional[list[str]] = None


def genbank_schema(options=None) -> Schema:
    return Schema.of(
        dt.Field("sequence", dt.utf8, nullable=False),
        dt.Field("accession", dt.utf8, nullable=True),
        dt.Field("comments", dt.list_(dt.utf8), nullable=True),
        dt.Field("contig", dt.utf8, nullable=True),
        dt.Field("date", dt.utf8, nullable=True),
        dt.Field("dblink", dt.utf8, nullable=True),
        dt.Field("definition", dt.utf8, nullable=True),
        dt.Field("division", dt.utf8, nullable=False),
        dt.Field("keywords", dt.utf8, nullable=True),
        dt.Field("molecule_type", dt.utf8, nullable=True),
        dt.Field("name", dt.utf8, nullable=True),
        dt.Field("source", dt.utf8, nullable=True),
        dt.Field("version", dt.utf8, nullable=True),
        dt.Field("topology", dt.utf8, nullable=False),
        dt.Field("features", FEATURE_T, nullable=True),
    )


_LOCUS_RE = re.compile(
    r"LOCUS\s+(\S+)\s+\d+\s+bp\s+(\S+)?\s*(circular|linear)?\s*(\S+)?\s*(\S+)?")


def parse_records(data: bytes) -> list[dict]:
    text = data.decode("utf-8", "replace")
    out = []
    for chunk in re.split(r"^//\s*$", text, flags=re.M):
        if not chunk.strip():
            continue
        rec = {k: None for k in ("sequence", "accession", "contig", "date",
                                 "dblink", "definition", "division",
                                 "keywords", "molecule_type", "name",
                                 "source", "version", "topology")}
        rec["comments"] = []
        rec["features"] = []
        rec["sequence"] = ""
        lines = chunk.split("\n")
        i = 0
        n = len(lines)

        def continuation(start: int, width: int = 12) -> tuple[str, int]:
            parts = [lines[start][width:].strip()]
            k = start + 1
            while k < n and lines[k][:width].strip() == "" and lines[k].strip():
                parts.append(lines[k].strip())
                k += 1
            return " ".join(p for p in parts if p), k

        while i < n:
            line = lines[i]
            key = line[:12].strip()
            if key == "LOCUS":
                m = _LOCUS_RE.match(line)
                if m:
                    rec["name"] = m.group(1)
                    rec["molecule_type"] = m.group(2)
                    rec["topology"] = m.group(3) or "linear"
                    rec["division"] = m.group(4) or "UNK"
                    rec["date"] = m.group(5)
                else:
                    parts = line.split()
                    rec["name"] = parts[1] if len(parts) > 1 else None
                    rec["topology"] = "linear"
                    rec["division"] = "UNK"
                i += 1
            elif key in ("DEFINITION", "ACCESSION", "VERSION", "DBLINK",
                         "KEYWORDS", "SOURCE", "CONTIG"):
                val, i = continuation(i)
                rec[{"DEFINITION": "definition", "ACCESSION": "accession",
                     "VERSION": "version", "DBLINK": "dblink",
                     "KEYWORDS": "keywords", "SOURCE": "source",
                     "CONTIG": "contig"}[key]] = val
            elif key == "COMMENT":
                val, i = continuation(i)
                rec["comments"].append(val)
            elif key == "FEATURES":
                i += 1
                feat = None
                while i < n:
                    fl = lines[i]
                    if fl[:1] not in (" ", "") or not fl.strip():
                        break
                    head = fl[:21].strip()
                    body = fl[21:].strip()
                    if head:  # new feature
                        feat = {"kind": head, "location": body, "qualifiers": []}
                        rec["features"].append(feat)
                        i += 1
                        # location continuation
                        while i < n and lines[i][:21].strip() == "" and \
                                lines[i].strip() and not lines[i].strip().startswith("/"):
                            feat["location"] += lines[i].strip()
                            i += 1
                    elif body.startswith("/") and feat is not None:
                        if "=" in body:
                            qk, qv = body[1:].split("=", 1)
                        else:
                            qk, qv = body[1:], None
                        i += 1
                        while i < n and lines[i][:21].strip() == "" and \
                                lines[i].strip() and not lines[i].strip().startswith("/"):
                            if qv is not None:
                                qv += " " + lines[i].strip()
                            i += 1
                        if qv is not None:
                            qv = qv.strip('"')
                        feat["qualifiers"].append((qk, qv))
                    else:
                        i += 1
            elif key == "ORIGIN":
                i += 1
                seq_parts = []
                while i < n and not lines[i].startswith("//"):
                    seq_parts.append(re.sub(r"[\d\s]", "", lines[i]))
                    i += 1
                rec["sequence"] = "".join(seq_parts)
            else:
                i += 1
        if rec["name"] or rec["sequence"]:
            out.append(rec)
    return out


def decode_host(data: bytes, options: GenbankOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    schema = genbank_schema(options)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    records = parse_records(data)
    n = len(records)
    if n == 0:
        return
    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        chunk = records[lo:hi]
        m = hi - lo
        cols = []
        for name in proj:
            if name == "comments":
                lens = np.asarray([len(r["comments"]) for r in chunk], np.int64)
                offs = cumsum_exclusive(lens)
                flat = [c for r in chunk for c in r["comments"]]
                cols.append(ListColumn(utf8_column(flat),
                                       offs.astype(np.int32),
                                       lens > 0))
            elif name == "features":
                cols.append(_features_col(chunk))
            else:
                cols.append(utf8_column([r[name] for r in chunk]))
        yield batch_from_host(out_schema, cols, m)


def _features_col(chunk: list[dict]) -> ListColumn:
    feats = [f for r in chunk for f in r["features"]]
    lens = np.asarray([len(r["features"]) for r in chunk], np.int64)
    offs = cumsum_exclusive(lens)
    quals = [q for f in feats for q in f["qualifiers"]]
    qlens = np.asarray([len(f["qualifiers"]) for f in feats], np.int64)
    qoffs = cumsum_exclusive(qlens)
    qual_struct = StructColumn({
        "keys": utf8_column([q[0] for q in quals]),
        "values": utf8_column([q[1] for q in quals]),
    }, np.ones(len(quals), bool))
    qualifiers = ListColumn(qual_struct, qoffs.astype(np.int32),
                            np.ones(len(feats), bool))
    feat_struct = StructColumn({
        "kind": utf8_column([f["kind"] for f in feats]),
        "location": utf8_column([f["location"] for f in feats]),
        "qualifiers": qualifiers,
    }, np.ones(len(feats), bool))
    return ListColumn(feat_struct, offs.astype(np.int32),
                      np.ones(len(chunk), bool))
