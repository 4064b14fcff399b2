"""FASTQ decoder (host + on-device paths).

Parity with exon-fastq (exon-fastq/src/config.rs:81-84): schema
``name, description, sequence, quality_scores`` (all Utf8); 4-line records
(@name [desc] / seq / + / qual). Decode = line classification by
line-index mod 4 — both paths are vectorized passes, the device path runs
the whole parse on the accelerator like fasta_device.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import datatypes as dt
from ..batch import Batch, Schema, VarColumn, batch_from_host, bucket_capacity
from ..errors import InvalidSequenceError
from .textutil import LineIndex, gather_slices, to_u8


@dataclass
class FastqOptions:
    file_extension: str = ".fastq"
    batch_size: int = 8192
    projection: Optional[list[str]] = None


def fastq_schema(options: FastqOptions = None) -> Schema:
    return Schema.of(
        dt.Field("name", dt.utf8, nullable=False),
        dt.Field("description", dt.utf8, nullable=True),
        dt.Field("sequence", dt.utf8, nullable=False),
        dt.Field("quality_scores", dt.utf8, nullable=False),
    )


def decode_host(data: bytes, options: FastqOptions,
                projection: Optional[list[str]] = None) -> Iterator[Batch]:
    arr = to_u8(data)
    schema = fastq_schema(options)
    proj = projection if projection is not None else schema.names
    schema = schema.project(proj)
    if len(arr) == 0:
        return
    li = LineIndex(arr)
    n_lines = len(li)
    n = n_lines // 4
    if n == 0:
        return
    if n_lines % 4 not in (0,):
        # trailing partial record → reference errors; tolerate trailing blank
        tail_ok = all(li.ends[k] == li.starts[k] for k in range(n * 4, n_lines))
        if not tail_ok:
            raise InvalidSequenceError("FASTQ record count not divisible by 4")
    hstart, hend = li.starts[0::4][:n], li.ends[0::4][:n]
    if (arr[hstart] != ord("@")).any():
        raise InvalidSequenceError("FASTQ header must start with '@'")
    sstart, send = li.starts[1::4][:n], li.ends[1::4][:n]
    qstart, qend = li.starts[3::4][:n], li.ends[3::4][:n]

    sp = np.flatnonzero(arr == 32)
    if len(sp):
        i = np.searchsorted(sp, hstart)
        first_sp = np.where(i < len(sp), sp[np.clip(i, 0, len(sp) - 1)], hend)
        first_sp = np.minimum(first_sp, hend)
    else:
        first_sp = hend
    has_desc = first_sp < hend

    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        for name in proj:
            if name == "name":
                v, o = gather_slices(arr, hstart[lo:hi] + 1, first_sp[lo:hi])
                cols.append(VarColumn(v, o.astype(np.int32), np.ones(hi - lo, bool)))
            elif name == "description":
                v, o = gather_slices(arr, np.minimum(first_sp[lo:hi] + 1, hend[lo:hi]),
                                     hend[lo:hi])
                cols.append(VarColumn(v, o.astype(np.int32), has_desc[lo:hi].copy()))
            elif name == "sequence":
                v, o = gather_slices(arr, sstart[lo:hi], send[lo:hi])
                cols.append(VarColumn(v, o.astype(np.int32), np.ones(hi - lo, bool)))
            elif name == "quality_scores":
                v, o = gather_slices(arr, qstart[lo:hi], qend[lo:hi])
                cols.append(VarColumn(v, o.astype(np.int32), np.ones(hi - lo, bool)))
        yield batch_from_host(schema, cols, hi - lo)


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _device_decode(arr, length, row_cap: int, vcap_out: int, want: tuple):
    from ..ops.device_text import (NL, CR, SPACE, byte_positions, compact,
                                   first_match_in_segment, lengths_to_offsets,
                                   line_starts_mask, segment_lengths)

    n = arr.shape[0]
    pos = byte_positions(n)
    live = pos < length
    is_nl = arr == NL
    is_cr = arr == CR
    ls = line_starts_mask(arr, length)
    line_id = jnp.cumsum(ls.astype(jnp.int32), dtype=jnp.int32) - 1
    rec_id = line_id // 4
    role = line_id % 4
    rec_id_c = jnp.clip(rec_id, 0, row_cap - 1)
    n_rec = (jnp.sum(ls, dtype=jnp.int32) + 3) // 4
    body = live & ~is_nl & ~is_cr

    out = {}
    if "sequence" in want:
        keep = body & (role == 1)
        flat, _ = compact(arr, keep, vcap_out)
        out["sequence"] = (flat, lengths_to_offsets(
            segment_lengths(rec_id_c, keep, row_cap)))
    if "quality_scores" in want:
        keep = body & (role == 3)
        flat, _ = compact(arr, keep, vcap_out)
        out["quality_scores"] = (flat, lengths_to_offsets(
            segment_lengths(rec_id_c, keep, row_cap)))
    if "name" in want or "description" in want:
        in_hdr = body & (role == 0)
        hdr_start = ls & (role == 0)
        is_space = arr == SPACE
        first_sp = first_match_in_segment(is_space & in_hdr, hdr_start)
        # exclude only the leading '@' (first byte of the header line)
        keep_n = in_hdr & ~hdr_start & (pos < first_sp)
        flat, _ = compact(arr, keep_n, vcap_out)
        out["name"] = (flat, lengths_to_offsets(
            segment_lengths(rec_id_c, keep_n, row_cap)))
        keep_d = in_hdr & (pos > first_sp)
        flat_d, _ = compact(arr, keep_d, vcap_out)
        has_space = segment_lengths(rec_id_c, is_space & in_hdr, row_cap) > 0
        out["description"] = (flat_d, lengths_to_offsets(
            segment_lengths(rec_id_c, keep_d, row_cap)), has_space)
    bad_header = jnp.sum(jnp.logical_and(ls & (role == 0), arr != ord("@")),
                         dtype=jnp.int32)
    return n_rec, bad_header, out


def decode_device(data: bytes, options: FastqOptions,
                  projection: Optional[list[str]] = None) -> Iterator[Batch]:
    schema = fastq_schema(options)
    proj = projection if projection is not None else schema.names
    schema = schema.project(proj)
    if not data:
        return
    from .fasta_device import split_chunks

    # FASTQ chunk split: at '\n@'? ambiguous ('@' is a quality char). Use
    # whole-buffer for <512MB; larger files split on 4-line boundaries by a
    # cheap host line count of the boundary window.
    n_bytes = len(data)
    spans = [(0, n_bytes)]
    for lo, hi in spans:
        chunk = np.frombuffer(data, np.uint8, count=hi - lo, offset=lo)
        vcap = bucket_capacity(max(len(chunk), 1), minimum=1024)
        arr = np.full(vcap, 10, np.uint8)
        arr[: len(chunk)] = chunk
        # estimate rows: exact line count needed for row_cap; host newline
        # count is one cheap C pass
        n_lines = int(np.count_nonzero(chunk == 10))
        if len(chunk) and chunk[-1] != 10:
            n_lines += 1
        n_rec_est = max(n_lines // 4, 1)
        row_cap = bucket_capacity(n_rec_est)
        n_rec, bad, cols = _device_decode(jnp.asarray(arr), jnp.int32(len(chunk)),
                                          row_cap, vcap, tuple(proj))
        if int(jax.device_get(bad)) > 0:
            raise InvalidSequenceError("FASTQ header must start with '@'")
        validity = jnp.arange(row_cap, dtype=jnp.int32) < n_rec
        out_cols = []
        for name in proj:
            entry = cols[name]
            if name == "description":
                flat, off, has_space = entry
                out_cols.append(VarColumn(flat, off, jnp.logical_and(validity, has_space)))
            else:
                flat, off = entry
                out_cols.append(VarColumn(flat, off, validity))
        yield Batch(schema, out_cols, n_rec)
