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
                     batch_from_host, utf8_column, var_column)
from ..errors import ExonError
from .textutil import LineIndex, gather_slices, to_u8

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


def _ragged_arange(base: np.ndarray, m: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten per-segment ranges [base[i], base[i]+m[i]): returns
    (flat_index, segment_of, within_segment)."""
    offs = np.zeros(len(m) + 1, np.int64)
    np.cumsum(m, out=offs[1:])
    tot = int(offs[-1])
    seg = np.repeat(np.arange(len(m), dtype=np.int64), m)
    within = np.arange(tot, dtype=np.int64) - np.repeat(offs[:-1], m)
    return np.repeat(base, m) + within, seg, within


def _join_line_spans(arr: np.ndarray, ls: np.ndarray, le: np.ndarray,
                     seg_offs: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather line spans joined with '\\n' per segment (segments are
    contiguous runs seg_offs[i]:seg_offs[i+1] of the span list). Returns
    (flat bytes, seg_start, seg_end) with separator bytes patched to
    '\\n' (the raw byte after a line end may be '\\r' in CRLF files).
    Also returns per-line output offsets via the closure-free 4th value?
    — no: callers needing line-level offsets use the returned flat plus
    recomputed lengths."""
    nseg = len(seg_offs) - 1
    m = seg_offs[1:] - seg_offs[:-1]
    tot = int(seg_offs[-1])
    if tot == 0:
        return (np.zeros(0, np.uint8), np.zeros(nseg, np.int64),
                np.zeros(nseg, np.int64))
    within = np.arange(tot, dtype=np.int64) - np.repeat(seg_offs[:-1], m)
    is_last = within == np.repeat(m - 1, m)
    sep_w = (~is_last).astype(np.int64)
    vals, offs = gather_slices(arr, ls, le + sep_w)
    sep_rows = np.flatnonzero(sep_w == 1)
    if len(sep_rows):
        vals = np.asarray(vals)
        vals[offs[1:][sep_rows] - 1] = 10
    return vals, offs[seg_offs[:-1]], offs[seg_offs[1:]]


_WS_SET = (9, 11, 12, 13, 32)

_WS_LUT = np.zeros(256, bool)
_WS_LUT[list(_WS_SET) + [10]] = True


def _parse_key_lines_np(arr: np.ndarray, ls: np.ndarray, ll: np.ndarray,
                        N: int):
    """Numpy fallback for native.sdf_keys: windowed '>' WS* '<' key '>'
    parse + FNV hash. Returns (ks, ke, h, valid) or (None,)*4 when a line
    exceeds the window."""
    W = 80
    if int(ll.max(initial=0)) > W:
        return None, None, None, None
    pos = np.arange(W, dtype=np.int64)
    win = arr[np.minimum(ls[:, None] + pos[None, :], N - 1)]
    ch = np.where(pos[None, :] < ll[:, None], win, 0)
    is_lt = ch == 60
    lt_pos = np.where(is_lt.any(1), is_lt.argmax(1), W)
    is_gt2 = (ch == 62) & (pos[None, :] > lt_pos[:, None])
    gt_pos = np.where(is_gt2.any(1), is_gt2.argmax(1), W)
    mid = (pos[None, :] > 0) & (pos[None, :] < lt_pos[:, None])
    ws_ok = np.all(~mid | (ch == 32) | (ch == 9), axis=1)
    valid = (lt_pos < W) & (gt_pos < W) & ws_ok
    klen = gt_pos - lt_pos - 1
    row_i = np.arange(len(ls), dtype=np.int64)[:, None]
    kbuf = np.where(pos[None, :] < klen[:, None],
                    ch[row_i, np.minimum(lt_pos[:, None] + 1 + pos[None, :],
                                         W - 1)],
                    0).astype(np.uint8)
    with np.errstate(over="ignore"):
        h = np.full(len(ls), 1469598103934665603, np.uint64)
        prime = np.uint64(1099511628211)
        live = pos[None, :] < klen[:, None]
        for c in range(W):
            col = kbuf[:, c].astype(np.uint64)
            upd = (h ^ col) * prime
            h = np.where(live[:, c], upd, h)
    return ls + lt_pos + 1, ls + gt_pos, h, valid


def _data_sections_fast(arr: np.ndarray, li: LineIndex, first: np.ndarray,
                        term: np.ndarray, atom: np.ndarray,
                        bond: np.ndarray):
    """Vectorized '> <key>' property extraction: one gather for all value
    bytes, per-key per-record spans into it — no per-row Python. Returns
    (vals_flat, {key: (vs, ve, has)}, key_order), or None when a key line
    exceeds the parse window (pathological → exact slow path)."""
    starts = li.starts.astype(np.int64)
    ends = li.ends.astype(np.int64)
    lens = ends - starts
    n = len(first)
    nl = len(starts)
    N = len(arr)
    empty_res = (np.zeros(0, np.uint8), {}, [])
    gt = np.flatnonzero((lens >= 1)
                        & (arr[np.minimum(starts, N - 1)] == 62))
    if len(gt) == 0:
        return empty_res
    rec = np.searchsorted(term, gt, side="right")
    safe = np.clip(rec, 0, n - 1)
    body = first + 4 + atom.astype(np.int64) + bond.astype(np.int64)
    okr = (rec < n) & (gt >= body[safe]) & (gt < term[safe])
    gt, rec = gt[okr], rec[okr]
    if len(gt) == 0:
        return empty_res
    # -- key span parse: '>' WS* '<' key '>' + FNV-1a key hash (native
    #    per-line loop; windowed numpy fallback). Key identity is the
    #    64-bit content hash — the same guarantee the grouped aggregate
    #    documents for group keys.
    from .. import native

    parsed = native.sdf_keys(arr, starts[gt], ends[gt])
    if parsed is not None:
        ks, ke, h, valid = parsed
    else:
        ks, ke, h, valid = _parse_key_lines_np(arr, starts[gt], lens[gt], N)
        if ks is None:
            return None
    gt, rec = gt[valid], rec[valid]
    if len(gt) == 0:
        return empty_res
    ks, ke, h = ks[valid], ke[valid], h[valid]
    ninst = len(gt)
    _uh, inv = np.unique(h, return_inverse=True)
    inv = np.asarray(inv).reshape(-1)
    nu = len(_uh)
    firsts = np.full(nu, ninst, np.int64)
    np.minimum.at(firsts, inv, np.arange(ninst, dtype=np.int64))
    key_rank = np.argsort(firsts, kind="stable")
    key_names = []
    for u_i in key_rank:
        f = int(firsts[u_i])
        key_names.append(bytes(arr[ks[f]:ke[f]]).decode("utf-8", "replace"))
    # -- value line ranges: lines j+1 .. first EMPTY line (all-ws handled
    #    post-gather as a prefix truncation)
    empty_idx = np.append(np.flatnonzero(lens == 0), nl)  # sentinel
    nxt_empty = empty_idx[np.searchsorted(empty_idx, gt, side="right")]
    vend_line = np.minimum(nxt_empty, term[rec])
    vstart_line = gt + 1
    m = np.maximum(vend_line - vstart_line, 0)
    line_idx, inst_of, _within = _ragged_arange(vstart_line, m)
    seg_offs = np.zeros(ninst + 1, np.int64)
    np.cumsum(m, out=seg_offs[1:])
    vals_flat, inst_start, inst_end = _join_line_spans(
        arr, starts[line_idx], ends[line_idx], seg_offs)
    # -- all-whitespace lines terminate a value early: the kept content is
    #    a PREFIX of the empty-terminated gather
    tot_lines = len(line_idx)
    if tot_lines:
        is_last = _within == np.repeat(m - 1, m)
        sep_w = (~is_last).astype(np.int64)
        out_lens = (ends[line_idx] - starts[line_idx]) + sep_w
        offs_lines = np.zeros(tot_lines + 1, np.int64)
        np.cumsum(out_lens, out=offs_lines[1:])
        ws = _WS_LUT[vals_flat]
        all_ws = np.minimum.reduceat(ws.astype(np.uint8),
                                     offs_lines[:-1]) == 1
        ws_rows = np.flatnonzero(all_ws)
        if len(ws_rows):
            first_ws = np.full(ninst, tot_lines, np.int64)
            np.minimum.at(first_ws, inst_of[ws_rows], ws_rows)
            trunc = first_ws < seg_offs[1:]
            tl = np.minimum(first_ws, tot_lines - 1)
            not_first = tl > seg_offs[:-1]
            inst_end = np.where(
                trunc, offs_lines[tl] - not_first.astype(np.int64),
                inst_end)
    # -- last occurrence wins per (record, key)
    pair = rec.astype(np.int64) * np.int64(nu) + inv
    order = np.argsort(pair, kind="stable")
    p_s = pair[order]
    last = np.r_[p_s[1:] != p_s[:-1], True] if len(p_s) else \
        np.zeros(0, bool)
    chosen = order[last]
    out = {}
    for name, u_i in zip(key_names, key_rank):
        sel = chosen[inv[chosen] == u_i]
        vs = np.zeros(n, np.int64)
        ve = np.zeros(n, np.int64)
        has = np.zeros(n, bool)
        rr = rec[sel]
        vs[rr] = inst_start[sel]
        ve[rr] = inst_end[sel]
        has[rr] = True
        out[name] = (vs, ve, has)
    return vals_flat, out, key_names


def _headers_fast(arr: np.ndarray, li: LineIndex, first: np.ndarray,
                  term: np.ndarray):
    """Vectorized header build: first 3 lines per record, stripped,
    non-empty joined with '\\n'. Returns (flat bytes, start, end) per
    record, or None when a header line's edge whitespace exceeds the
    window (pathological → slow path)."""
    starts = li.starts.astype(np.int64)
    ends = li.ends.astype(np.int64)
    n = len(first)
    N = len(arr)
    from .. import native

    m = np.maximum(np.minimum(first + 3, term) - first, 0)
    line_idx, rec_of, _w = _ragged_arange(first, m)
    ls, le = starts[line_idx], ends[line_idx]
    stripped = native.strip_spans(arr, ls, le)
    if stripped is not None:
        s2, e2 = stripped
    else:
        ln = le - ls
        W = 96
        pos = np.arange(W, dtype=np.int64)
        ws_b = np.asarray(_WS_SET, np.uint8)
        # leading whitespace count (within window)
        win = arr[np.minimum(ls[:, None] + pos[None, :], N - 1)]
        in_l = pos[None, :] < ln[:, None]
        nonws = in_l & ~np.isin(win, ws_b)
        lead = np.where(nonws.any(1), nonws.argmax(1), np.minimum(ln, W))
        if np.any((ln > W) & (lead >= W)):
            return None  # > W leading spaces on an over-window line
        # trailing whitespace count (window ending at le)
        back = np.maximum(le[:, None] - 1 - pos[None, :], 0)
        winb = arr[np.minimum(back, N - 1)]
        in_b = pos[None, :] < ln[:, None]
        nonwsb = in_b & ~np.isin(winb, ws_b)
        trail = np.where(nonwsb.any(1), nonwsb.argmax(1), np.minimum(ln, W))
        if np.any((ln > W) & (trail >= W)):
            return None
        s2 = ls + lead
        e2 = np.maximum(le - trail, s2)
    keep = e2 > s2
    # per-record contiguous runs of kept lines
    kept_rec = rec_of[keep]
    s2k, e2k = s2[keep], e2[keep]
    cnt = np.zeros(n, np.int64)
    np.add.at(cnt, kept_rec, 1)
    seg_offs = np.zeros(n + 1, np.int64)
    np.cumsum(cnt, out=seg_offs[1:])
    flat, h_start, h_end = _join_line_spans(arr, s2k, e2k, seg_offs)
    return flat, h_start, h_end


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
    headers_fast = headers = None
    if want("header"):
        headers_fast = _headers_fast(arr, li, first, term)
        if headers_fast is None:
            headers = _headers(arr, li, first, term)
    data_fast = data_maps = None
    key_order: list[str] = []
    if want("data") or need_keys:
        data_fast = _data_sections_fast(arr, li, first, term,
                                        atom_counts, bond_counts)
        if data_fast is None:
            data_maps, key_order = _data_sections(arr, li, first, term,
                                                  atom_counts, bond_counts)
        else:
            _vals_flat, _data_cols, key_order = data_fast
    keys = options.data_keys or (tuple(key_order) if key_order
                                 else ("canonical_smiles",))
    schema = sdf_schema(options, keys)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    bs = options.batch_size
    none_col = None
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        cols = []
        for name in proj:
            if name == "header":
                if headers_fast is not None:
                    hflat, hs, he = headers_fast
                    v, offs = gather_slices(hflat, hs[lo:hi], he[lo:hi])
                    cols.append(var_column(v, offs,
                                           np.ones(hi - lo, bool)))
                else:
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
                    if data_fast is not None:
                        spans = _data_cols.get(k)
                        if spans is None:
                            if none_col is None or \
                                    len(none_col.validity) != hi - lo:
                                none_col = utf8_column([None] * (hi - lo))
                            children[k] = none_col
                            continue
                        vs, ve, has = spans
                        v, offs = gather_slices(
                            _vals_flat, np.where(has, vs, 0)[lo:hi],
                            np.where(has, ve, 0)[lo:hi])
                        children[k] = var_column(v, offs, has[lo:hi])
                    else:
                        children[k] = utf8_column(
                            [data_maps[i].get(k) for i in range(lo, hi)])
                cols.append(StructColumn(children, np.ones(hi - lo, bool)))
        yield batch_from_host(out_schema, cols, hi - lo)
