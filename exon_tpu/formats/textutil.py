"""Vectorized text-decode primitives shared by line-based format decoders.

The reference parses records one at a time through noodles; here decoding is
whole-buffer numpy passes (byte search, cumsum, gather) so host decode keeps
up with device consumption. These helpers are the scalar-loop-free toolkit:

  * ``gather_slices``  — concatenate [start,end) slices into Arrow-style
                         (values, offsets) with np.repeat arithmetic
  * ``LineIndex``      — newline scan → line starts/ends
  * ``split_fields``   — delimiter positions → per-line field boundaries
  * ``parse_int_fields`` / ``parse_float_fields`` — branchless numeric parse
"""

from __future__ import annotations

import numpy as np

NL = 10
TAB = 9
SPACE = 32


def to_u8(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        return data if data.dtype == np.uint8 else data.view(np.uint8)
    return np.frombuffer(data, dtype=np.uint8)


def cumsum_exclusive(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x) + 1, dtype=np.int64)
    np.cumsum(x, out=out[1:])
    return out


def gather_slices(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate arr[starts[i]:ends[i]] into flat values + int32 offsets."""
    lens = (ends - starts).astype(np.int64)
    np.maximum(lens, 0, out=lens)
    offsets = cumsum_exclusive(lens)
    total = int(offsets[-1])
    if total == 0:
        return np.zeros(0, arr.dtype), offsets
    idx = np.repeat(starts.astype(np.int64) - offsets[:-1], lens) + np.arange(total, dtype=np.int64)
    return arr[idx], offsets


class LineIndex:
    """Line boundaries of a text buffer (final line may lack a newline)."""

    def __init__(self, arr: np.ndarray):
        self.arr = arr
        nl = np.flatnonzero(arr == NL)
        has_tail = len(arr) > 0 and (len(nl) == 0 or nl[-1] != len(arr) - 1)
        n = len(nl) + (1 if has_tail else 0)
        starts = np.zeros(n, dtype=np.int64)
        if len(nl):
            starts[1: len(nl) + (1 if has_tail else 0)] = nl[: n - 1] + 1
        ends = np.empty(n, dtype=np.int64)
        ends[: len(nl)] = nl
        if has_tail:
            ends[-1] = len(arr)
        # strip \r (CRLF)
        if n and (arr[np.clip(ends - 1, 0, None)] == 13).any():
            ends = np.where((ends > starts) & (arr[np.clip(ends - 1, 0, len(arr) - 1)] == 13),
                            ends - 1, ends)
        self.starts = starts
        self.ends = ends

    def __len__(self) -> int:
        return len(self.starts)

    def select(self, mask: np.ndarray) -> "LineIndex":
        li = LineIndex.__new__(LineIndex)
        li.arr = self.arr
        li.starts = self.starts[mask]
        li.ends = self.ends[mask]
        return li

    def first_bytes(self) -> np.ndarray:
        fb = np.zeros(len(self.starts), dtype=np.uint8)
        nonempty = self.ends > self.starts
        fb[nonempty] = self.arr[self.starts[nonempty]]
        return fb


def split_fields(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 n_fields: int, delim: int = TAB
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split each line into up to ``n_fields`` delimiter-separated fields.

    Returns (fstarts, fends, present) each [n_lines, n_fields]. Field
    ``n_fields-1`` runs to line end (i.e. it keeps any remaining delims —
    callers wanting exact splits pass n_fields >= max count).
    """
    n = len(starts)
    d = np.flatnonzero(arr == delim)
    if n == 0:
        z = np.zeros((0, n_fields), dtype=np.int64)
        return z, z.copy(), np.zeros((0, n_fields), dtype=bool)
    # delim→line assignment; delims outside [start,end) ranges (shouldn't
    # happen for full-line splitting) are clipped away by searchsorted
    line_of_d = np.searchsorted(starts, d, side="right") - 1
    in_line = (d >= starts[np.clip(line_of_d, 0, n - 1)]) & \
              (d < ends[np.clip(line_of_d, 0, n - 1)]) & (line_of_d >= 0)
    d = d[in_line]
    line_of_d = line_of_d[in_line]
    counts = np.bincount(line_of_d, minlength=n)
    doff = cumsum_exclusive(counts)
    k_take = min(n_fields - 1, int(counts.max()) if n else 0)
    # dpos[i, k] = position of k-th delim in line i (or sentinel)
    dpos = np.full((n, n_fields - 1), -1, dtype=np.int64)
    for k in range(k_take):
        has = counts > k
        dpos[has, k] = d[doff[:-1][has] + k]
    fstarts = np.empty((n, n_fields), dtype=np.int64)
    fends = np.empty((n, n_fields), dtype=np.int64)
    present = np.zeros((n, n_fields), dtype=bool)
    fstarts[:, 0] = starts
    present[:, 0] = ends > starts
    for k in range(n_fields):
        if k > 0:
            has_prev = dpos[:, k - 1] >= 0
            fstarts[:, k] = np.where(has_prev, dpos[:, k - 1] + 1, ends)
            present[:, k] = has_prev
        if k < n_fields - 1:
            has_k = dpos[:, k] >= 0
            fends[:, k] = np.where(has_k, dpos[:, k], ends)
        else:
            fends[:, k] = ends
    return fstarts, fends, present


def scan_tsv_lines(arr: np.ndarray, n_fields: int, comment: int = 0,
                   delim: int = TAB):
    """One native threaded pass = LineIndex + split_fields: line bounds
    (comment/empty lines skipped, CR stripped) and per-line field
    boundaries with split_fields semantics (last field runs to line end).

    Returns (starts, ends, fstarts, fends, present) or None when the
    native library is unavailable."""
    from .. import native

    res = native.tsv_scan(arr, 0, comment, delim, max(n_fields - 1, 0))
    if res is None:
        return None
    starts, ends, dpos = res
    n = len(starts)
    fstarts = np.empty((n, n_fields), dtype=np.int64)
    fends = np.empty((n, n_fields), dtype=np.int64)
    present = np.zeros((n, n_fields), dtype=bool)
    fstarts[:, 0] = starts
    present[:, 0] = ends > starts
    for k in range(n_fields):
        if k > 0:
            has_prev = dpos[:, k - 1] >= 0
            fstarts[:, k] = np.where(has_prev, dpos[:, k - 1] + 1, ends)
            present[:, k] = has_prev
        if k < n_fields - 1:
            has_k = dpos[:, k] >= 0
            fends[:, k] = np.where(has_k, dpos[:, k], ends)
        else:
            fends[:, k] = ends
    return starts, ends, fstarts, fends, present


def parse_int_fields(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                     default: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Parse decimal ints (optional leading '-') from byte slices. Vectorized
    via flat digit gather + per-slice polynomial accumulation.

    Returns (values int64, ok bool) — ok False for empty/non-numeric slices.
    """
    from .. import native

    res = native.parse_ints(to_u8(arr), starts, ends)
    if res is not None:
        vals, ok = res
        if default != 0:
            vals = np.where(ok, vals, default)
        return vals, ok
    starts = starts.astype(np.int64)
    ends = ends.astype(np.int64)
    vals, offsets = gather_slices(arr, starts, ends)
    n = len(starts)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    neg_first = np.zeros(n, dtype=bool)
    nonempty = lens > 0
    neg_first[nonempty] = vals[offsets[:-1][nonempty]] == ord("-")
    # zero out sign byte by shifting start
    digit = vals - ord("0")
    is_digit = digit <= 9  # uint8 wraps negatives to large
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos_in_row = np.arange(len(vals), dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), lens)
    sign_byte = neg_first[row] & (pos_in_row == 0)
    # value = sum digit * 10^(len-1-pos), adjusting for sign byte offset
    eff_len = lens - neg_first.astype(np.int64)
    eff_pos = pos_in_row - neg_first[row].astype(np.int64)
    power = eff_len[row] - 1 - eff_pos
    contrib = np.where(sign_byte, 0, digit.astype(np.int64) * 10 ** np.clip(power, 0, 18))
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, row, contrib)
    out = np.where(neg_first, -out, out)
    bad = np.zeros(n, dtype=bool)
    np.logical_or.at(bad, row, ~(is_digit | sign_byte))
    ok = nonempty & ~bad & (eff_len > 0)
    out = np.where(ok, out, default)
    return out, ok


def parse_float_fields(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                       default: float = np.nan) -> tuple[np.ndarray, np.ndarray]:
    """Parse floats from byte slices. Fast path: plain decimals via two int
    parses; fallback: per-slice Python float() for exponent forms (rare)."""
    n = len(starts)
    if n == 0:
        return np.zeros(0, np.float64), np.zeros(0, bool)
    vals, offsets = gather_slices(arr, starts, ends)
    lens = offsets[1:] - offsets[:-1]
    # locate '.' per row
    row = np.repeat(np.arange(n, dtype=np.int64), lens.astype(np.int64))
    isdot = vals == ord(".")
    dot_count = np.bincount(row[isdot], minlength=n) if isdot.any() else np.zeros(n, np.int64)
    has_exp = np.zeros(n, dtype=bool)
    expmask = (vals == ord("e")) | (vals == ord("E"))
    if expmask.any():
        np.logical_or.at(has_exp, row[expmask], True)
    simple = (dot_count <= 1) & ~has_exp
    out = np.full(n, default, dtype=np.float64)
    ok = np.zeros(n, dtype=bool)
    # integer part / frac part split
    dotpos_flat = np.flatnonzero(isdot)
    dot_row = row[dotpos_flat] if len(dotpos_flat) else np.zeros(0, np.int64)
    dotpos = np.full(n, -1, dtype=np.int64)
    if len(dotpos_flat):
        first = np.ones(len(dot_row), dtype=bool)
        first[1:] = dot_row[1:] != dot_row[:-1]
        dotpos[dot_row[first]] = dotpos_flat[first] - offsets[:-1][dot_row[first]]
    abs_dot = np.where(dotpos >= 0, starts + dotpos, ends)
    ip, ip_ok = parse_int_fields(arr, starts, abs_dot)
    fstarts = np.minimum(abs_dot + 1, ends)
    fp, fp_ok = parse_int_fields(arr, fstarts, ends)
    fl = np.maximum(ends - fstarts, 0)
    frac = np.where(fl > 0, fp / 10.0 ** fl, 0.0)
    sign = np.where(ip < 0, -1.0, 1.0)
    # handle "-0.x"
    neg_zero = np.zeros(n, dtype=bool)
    nz = lens > 0
    neg_zero[nz] = vals[offsets[:-1][nz]] == ord("-")
    sign = np.where(neg_zero, -1.0, 1.0)
    whole_ok = ip_ok & ((dotpos < 0) | fp_ok | (fl == 0))
    val = sign * (np.abs(ip.astype(np.float64)) + np.where(fp_ok, frac, 0.0))
    use = simple & whole_ok
    out[use] = val[use]
    ok |= use
    # fallback rows
    rest = np.flatnonzero(~use & (lens > 0))
    if len(rest):
        buf = vals.tobytes()
        for i in rest:
            s = buf[offsets[i]: offsets[i + 1]]
            try:
                out[i] = float(s)
                ok[i] = True
            except ValueError:
                pass
    return out, ok
