"""FCS (flow cytometry) decoder.

Parity: exon-fcs (src/reader/mod.rs): header offsets → TEXT segment
key/value pairs (delimiter-separated) → one Float32 column per channel
($PnN names), DATA segment decoded as a dense event×channel matrix.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import Batch, FixedColumn, Schema, batch_from_host
from ..errors import ExonError


@dataclass
class FcsOptions:
    file_extension: str = ".fcs"
    batch_size: int = 8192
    projection: Optional[list[str]] = None


def parse_text_segment(data: bytes) -> dict[str, str]:
    if len(data) < 58:
        raise ExonError("FCS file too short")
    text_start = int(data[10:18].strip() or 0)
    text_end = int(data[18:26].strip() or 0)
    seg = data[text_start:text_end + 1]
    if not seg:
        raise ExonError("empty FCS TEXT segment")
    delim = seg[0:1]
    parts = seg[1:].split(delim)
    kv = {}
    for i in range(0, len(parts) - 1, 2):
        kv[parts[i].decode("ascii", "replace").strip()] = \
            parts[i + 1].decode("ascii", "replace").strip()
    return kv


def fcs_channels(kv: dict[str, str]) -> list[str]:
    n = int(kv.get("$PAR", 0))
    return [kv.get(f"$P{i}N", f"P{i}") for i in range(1, n + 1)]


def fcs_schema_from_bytes(data: bytes) -> Schema:
    kv = parse_text_segment(data)
    return Schema(tuple(dt.Field(name, dt.float32, False)
                        for name in fcs_channels(kv)))


def fcs_schema(options=None) -> Schema:
    # static default (real schema inferred per file by FcsTable)
    return Schema.of(dt.Field("channel", dt.float32, False))


def encode_fcs(mat: np.ndarray, channels: list[str]) -> bytes:
    """Encode an event×channel float matrix as an FCS 3.0 file (inverse of
    decode_host: header offsets + '/'-delimited TEXT segment + little-
    endian float32 DATA segment). $BEGINDATA/$ENDDATA are zero-padded so
    the TEXT length is independent of the offsets they carry."""
    mat = np.asarray(mat, np.float32)
    if mat.ndim != 2 or mat.shape[1] != len(channels):
        raise ExonError("encode_fcs: matrix must be [events, channels]")
    n_events, n_par = mat.shape
    payload = np.ascontiguousarray(mat.astype("<f4")).tobytes()
    delim = "/"

    def text_for(begin: int, end: int) -> bytes:
        kv = [("$BEGINANALYSIS", "0"), ("$ENDANALYSIS", "0"),
              ("$BEGINSTEXT", "0"), ("$ENDSTEXT", "0"),
              ("$BEGINDATA", f"{begin:08d}"), ("$ENDDATA", f"{end:08d}"),
              ("$DATATYPE", "F"), ("$BYTEORD", "1,2,3,4"), ("$MODE", "L"),
              ("$NEXTDATA", "0"),
              ("$PAR", str(n_par)), ("$TOT", str(n_events))]
        for i, c in enumerate(channels, 1):
            kv += [(f"$P{i}N", c), (f"$P{i}B", "32"),
                   (f"$P{i}E", "0,0"), (f"$P{i}R", "262144")]
        s = delim + delim.join(x for pair in kv for x in pair) + delim
        return s.encode("ascii")

    header_len = 58
    text = text_for(0, 0)
    text_start = header_len
    text_end = text_start + len(text) - 1      # inclusive, per spec
    data_start = text_end + 1
    data_end = data_start + len(payload) - 1   # inclusive
    text = text_for(data_start, data_end)
    hdr = (b"FCS3.0    "
           + f"{text_start:8d}{text_end:8d}".encode()
           + f"{data_start:8d}{data_end:8d}".encode()
           + f"{0:8d}{0:8d}".encode())
    if len(hdr) != header_len:
        raise ExonError("FCS header offsets exceed 8 ASCII digits")
    return hdr + text + payload


def decode_host(data: bytes, options: FcsOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    kv = parse_text_segment(data)
    channels = fcs_channels(kv)
    n_par = len(channels)
    tot = int(kv.get("$TOT", 0))
    dtype_code = kv.get("$DATATYPE", "F")
    byteord = kv.get("$BYTEORD", "1,2,3,4")
    little = byteord.startswith("1")
    data_start = int(kv.get("$BEGINDATA", 0) or 0)
    data_end = int(kv.get("$ENDDATA", 0) or 0)
    if data_start == 0:
        data_start = int(data[26:34].strip() or 0)
        data_end = int(data[34:42].strip() or 0)
    raw = data[data_start:data_end + 1]
    if dtype_code == "F":
        npdt = "<f4" if little else ">f4"
    elif dtype_code == "D":
        npdt = "<f8" if little else ">f8"
    elif dtype_code == "I":
        bits = int(kv.get("$P1B", 32))
        npdt = ("<" if little else ">") + {16: "u2", 32: "u4"}[bits]
    else:
        raise ExonError(f"unsupported FCS $DATATYPE {dtype_code}")
    mat = np.frombuffer(raw, dtype=npdt, count=tot * n_par if tot else -1)
    n_events = len(mat) // n_par if n_par else 0
    mat = mat[: n_events * n_par].reshape(n_events, n_par).astype(np.float32)

    schema = Schema(tuple(dt.Field(c, dt.float32, False) for c in channels))
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    idx = [schema.index_of(p) for p in proj]
    bs = options.batch_size
    for lo in range(0, n_events, bs):
        hi = min(lo + bs, n_events)
        cols = [FixedColumn(np.ascontiguousarray(mat[lo:hi, i]),
                            np.ones(hi - lo, bool)) for i in idx]
        yield batch_from_host(out_schema, cols, hi - lo)
