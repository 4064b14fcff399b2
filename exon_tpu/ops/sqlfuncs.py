"""General SQL scalar function library (string / math / conditional).

The reference inherits these from DataFusion 44's built-in function set
(exon-core Cargo dep); bio queries use them constantly (upper(sequence),
substr(id, …), stddev(qual), …). Here each is a vectorized device kernel
over the fixed-capacity batch layout: var-width string functions are
gather/relayout passes over the flat byte buffer (no per-row host loops),
math functions are elementwise jnp ops that fuse into the surrounding
pipeline. A few irregular functions (replace, split_part) run as host
functions (numpy) — they are registered host=True so the planner keeps
them out of jit regions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import datatypes as dt
from ..batch import Batch, DictColumn, FixedColumn, VarColumn
from ..errors import PlanError
from ..plan.expressions import register_function
from ..plan.planner import register_function_type
from . import strings as str_ops
from .layout import byte_row_ids, dict_to_var, row_lengths


# ---------------------------------------------------------------------------
# argument normalization
# ---------------------------------------------------------------------------


def _as_var(v, fn: str) -> VarColumn:
    if isinstance(v, VarColumn):
        return v
    if isinstance(v, DictColumn):
        return dict_to_var(v)
    if isinstance(v, (str, bytes)):
        b = v.encode() if isinstance(v, str) else v
        return VarColumn(jnp.asarray(np.frombuffer(b, np.uint8)),
                         jnp.asarray(np.array([0, len(b)], np.int32)),
                         jnp.ones(1, bool))
    raise PlanError(f"{fn} expects a string argument")


def _vals_valid(v, batch: Batch):
    """(values array, validity) for a fixed-width argument."""
    if isinstance(v, FixedColumn):
        return v.values, v.validity
    if isinstance(v, jnp.ndarray) or isinstance(v, np.ndarray):
        return jnp.asarray(v), None
    # python scalar literal
    return v, None


def _cap_of(batch: Batch) -> int:
    return batch.capacity if batch is not None and batch.columns else 1


def _ret_fixed(out, valid, batch: Batch):
    """Normalize a math result: broadcast 0-d to the batch capacity and
    wrap with validity when present."""
    out = jnp.asarray(out)
    if out.ndim == 0:
        out = jnp.full(_cap_of(batch), out)
    return FixedColumn(out, valid) if valid is not None else out


def _row_int(v, batch: Batch, cap: int):
    """Per-row int32 from a literal or fixed column."""
    if isinstance(v, FixedColumn):
        return v.values.astype(jnp.int32)
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return jnp.asarray(v).astype(jnp.int32)
    return jnp.full(cap, int(v), jnp.int32)


def _broadcast_valid(col: VarColumn, cap: int) -> VarColumn:
    """Broadcast a smaller (usually 1-row literal) column to cap rows via a
    device take — jit-safe, no host introspection of traced offsets."""
    if col.capacity == cap:
        return col
    from .layout import take_var

    out_vcap = max(col.value_capacity * cap, 1)
    return take_var(col, jnp.zeros(cap, jnp.int32),
                    jnp.asarray(cap, jnp.int32), out_vcap=out_vcap)


# ---------------------------------------------------------------------------
# var-width relayout core
# ---------------------------------------------------------------------------


def _slice_var(col: VarColumn, rel_start, out_lens, out_vcap=None,
               reverse: bool = False, validity=None) -> VarColumn:
    """Build a VarColumn taking out_lens[r] bytes of row r starting at
    rel_start[r] (row-relative). One gather over the flat buffer."""
    cap = col.capacity
    vcap = col.value_capacity
    out_vcap = out_vcap or vcap
    lens = jnp.clip(out_lens, 0, None).astype(jnp.int32)
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(lens, dtype=jnp.int32)])
    rid = jnp.clip(byte_row_ids(new_off, out_vcap), 0, cap - 1)
    local = jnp.arange(out_vcap, dtype=jnp.int32) - new_off[rid]
    if reverse:
        local = lens[rid] - 1 - local
    src = jnp.clip(col.offsets[rid] + rel_start[rid] + local, 0, vcap - 1)
    vals = col.values[src]
    live = jnp.arange(out_vcap, dtype=jnp.int32) < new_off[-1]
    vals = jnp.where(live, vals, 0)
    return VarColumn(vals, new_off,
                     col.validity if validity is None else validity)


# ---------------------------------------------------------------------------
# string functions
# ---------------------------------------------------------------------------


def fn_upper(batch: Batch, v) -> VarColumn:
    return str_ops.upper(_as_var(v, "upper"))


def fn_lower(batch: Batch, v) -> VarColumn:
    return str_ops.lower(_as_var(v, "lower"))


def fn_octet_length(batch: Batch, v) -> FixedColumn:
    col = _as_var(v, "octet_length")
    return FixedColumn(row_lengths(col.offsets).astype(jnp.int64),
                       col.validity)


def fn_substr(batch: Batch, v, start, length=None) -> VarColumn:
    """SQL substr: 1-based; start may be <= 0 (window semantics, matching
    PostgreSQL/DataFusion: the window [start, start+len) intersected with
    the string)."""
    col = _as_var(v, "substr")
    cap = col.capacity
    n = row_lengths(col.offsets)
    s = _row_int(start, batch, cap)
    lo = jnp.maximum(s, 1)
    if length is None:
        hi = n + 1
    else:
        ln = _row_int(length, batch, cap)
        hi = jnp.minimum(s + jnp.maximum(ln, 0), n + 1)
    out_lens = jnp.maximum(hi - lo, 0)
    return _slice_var(col, lo - 1, out_lens)


def fn_left(batch: Batch, v, k) -> VarColumn:
    col = _as_var(v, "left")
    n = row_lengths(col.offsets)
    kk = _row_int(k, batch, col.capacity)
    lens = jnp.where(kk >= 0, jnp.minimum(kk, n), jnp.maximum(n + kk, 0))
    return _slice_var(col, jnp.zeros(col.capacity, jnp.int32), lens)


def fn_right(batch: Batch, v, k) -> VarColumn:
    col = _as_var(v, "right")
    n = row_lengths(col.offsets)
    kk = _row_int(k, batch, col.capacity)
    lens = jnp.where(kk >= 0, jnp.minimum(kk, n), jnp.maximum(n + kk, 0))
    return _slice_var(col, n - lens, lens)


def fn_reverse(batch: Batch, v) -> VarColumn:
    col = _as_var(v, "reverse")
    n = row_lengths(col.offsets)
    return _slice_var(col, jnp.zeros(col.capacity, jnp.int32), n,
                      reverse=True)


def _trim_counts(col: VarColumn, chars: bytes):
    """(n_leading, n_trailing) trim-set bytes per row."""
    vcap = col.value_capacity
    cap = col.capacity
    in_set = jnp.zeros(vcap, dtype=bool)
    for ch in chars:
        in_set = jnp.logical_or(in_set, col.values == ch)
    rid = jnp.clip(byte_row_ids(col.offsets, vcap), 0, cap - 1)
    pos = jnp.arange(vcap, dtype=jnp.int32)
    starts, ends = col.offsets[:-1], col.offsets[1:]
    in_row = pos < ends[rid]
    keep = jnp.logical_and(jnp.logical_not(in_set), in_row)
    sent = jnp.int32(vcap + 1)
    first_keep = jnp.full(cap, sent, jnp.int32).at[rid].min(
        jnp.where(keep, pos, sent))
    last_keep = jnp.full(cap, -1, jnp.int32).at[rid].max(
        jnp.where(keep, pos, -1))
    n = row_lengths(col.offsets)
    all_trim = first_keep == sent
    lead = jnp.where(all_trim, n, first_keep - starts)
    # an all-trim-chars row empties from EITHER side (rtrim('aa','a')='')
    trail = jnp.where(all_trim, n, ends - 1 - last_keep)
    return lead, trail


def _trim(v, chars, mode: str, fname: str) -> VarColumn:
    col = _as_var(v, fname)
    cb = b" " if chars is None else (
        chars.encode() if isinstance(chars, str) else bytes(chars))
    lead, trail = _trim_counts(col, cb)
    n = row_lengths(col.offsets)
    if mode == "l":
        start, lens = lead, n - lead
    elif mode == "r":
        start, lens = jnp.zeros_like(n), n - trail
    else:
        start = lead
        lens = jnp.maximum(n - lead - trail, 0)
    return _slice_var(col, start, lens)


def fn_trim(batch: Batch, v, chars=None) -> VarColumn:
    return _trim(v, chars, "b", "trim")


def fn_ltrim(batch: Batch, v, chars=None) -> VarColumn:
    return _trim(v, chars, "l", "ltrim")


def fn_rtrim(batch: Batch, v, chars=None) -> VarColumn:
    return _trim(v, chars, "r", "rtrim")


def fn_strpos(batch: Batch, v, needle) -> FixedColumn:
    col = _as_var(v, "strpos")
    if not isinstance(needle, (str, bytes)):
        raise PlanError("strpos needle must be a string literal")
    nb = needle.encode() if isinstance(needle, str) else needle
    if len(nb) == 0:
        return FixedColumn(jnp.ones(col.capacity, jnp.int64), col.validity)
    pos, found = str_ops._find_from(col, nb,
                                    col.offsets[:-1].astype(jnp.int32), False)
    rel = jnp.where(found, pos - col.offsets[:-1] + 1, 0)
    return FixedColumn(rel.astype(jnp.int64), col.validity)


def fn_starts_with(batch: Batch, v, prefix) -> jnp.ndarray:
    col = _as_var(v, "starts_with")
    if isinstance(prefix, (str, bytes)):
        p = prefix.encode() if isinstance(prefix, str) else prefix
        return str_ops.starts_with(col, p)
    raise PlanError("starts_with prefix must be a string literal")


def fn_ends_with(batch: Batch, v, suffix) -> jnp.ndarray:
    col = _as_var(v, "ends_with")
    if isinstance(suffix, (str, bytes)):
        p = suffix.encode() if isinstance(suffix, str) else suffix
        return str_ops.ends_with(col, p)
    raise PlanError("ends_with suffix must be a string literal")


def fn_contains(batch: Batch, v, needle) -> jnp.ndarray:
    col = _as_var(v, "contains")
    if isinstance(needle, (str, bytes)):
        p = needle.encode() if isinstance(needle, str) else needle
        return str_ops.contains(col, p)
    raise PlanError("contains needle must be a string literal")


def _concat_cols(cols: list[VarColumn], cap: int, skip_null: bool,
                 batch: Batch) -> VarColumn:
    """Concatenate per-row across columns: one relayout over stacked
    buffers. skip_null → NULL arguments contribute empty (DataFusion
    concat); else NULL propagates (SQL ||)."""
    vcaps = [c.value_capacity for c in cols]
    big = jnp.concatenate([c.values for c in cols])
    base = np.concatenate([[0], np.cumsum(vcaps)])[:-1]
    lens = [jnp.where(c.validity, row_lengths(c.offsets), 0) if skip_null
            else row_lengths(c.offsets) for c in cols]
    total = lens[0]
    for x in lens[1:]:
        total = total + x
    out_vcap = int(sum(vcaps))
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(total, dtype=jnp.int32)])
    rid = jnp.clip(byte_row_ids(new_off, out_vcap), 0, cap - 1)
    local = jnp.arange(out_vcap, dtype=jnp.int32) - new_off[rid]
    # which source column this output byte falls in: cumulative arg lens
    src = jnp.zeros(out_vcap, jnp.int32)
    acc = jnp.zeros(cap, jnp.int32)
    done = jnp.zeros(out_vcap, dtype=bool)
    for i, c in enumerate(cols):
        li = lens[i]
        here = jnp.logical_and(jnp.logical_not(done),
                               local < acc[rid] + li[rid])
        s = jnp.clip(int(base[i]) + c.offsets[rid] + (local - acc[rid]),
                     0, big.shape[0] - 1)
        src = jnp.where(here, s, src)
        done = jnp.logical_or(done, here)
        acc = acc + li
    vals = big[src]
    live = jnp.arange(out_vcap, dtype=jnp.int32) < new_off[-1]
    vals = jnp.where(live, vals, 0)
    if skip_null:
        valid = batch.row_mask() if batch is not None and batch.columns \
            else jnp.ones(cap, bool)
    else:
        valid = cols[0].validity
        for c in cols[1:]:
            valid = jnp.logical_and(valid, c.validity)
    return VarColumn(vals, new_off, valid)


def _norm_concat_args(batch: Batch, args, fname: str):
    cols = [_as_var(a, fname) for a in args]
    cap = max(c.capacity for c in cols)
    return [_broadcast_valid(c, cap) if c.capacity != cap else c
            for c in cols], cap


def _empty_var(cap: int, valid: bool) -> VarColumn:
    return VarColumn(jnp.zeros(1, jnp.uint8),
                     jnp.zeros(cap + 1, jnp.int32),
                     jnp.full(cap, valid))


def fn_concat(batch: Batch, *args) -> VarColumn:
    args = [a for a in args if a is not None]  # concat skips NULL literals
    if not args:
        return _empty_var(_cap_of(batch), True)
    cols, cap = _norm_concat_args(batch, args, "concat")
    return _concat_cols(cols, cap, skip_null=True, batch=batch)


def fn_concat_op(batch: Batch, *args) -> VarColumn:
    """`||` — NULL-propagating two-arg concat."""
    if any(a is None for a in args):  # NULL literal → all-NULL result
        return _empty_var(_cap_of(batch), False)
    cols, cap = _norm_concat_args(batch, args, "||")
    return _concat_cols(cols, cap, skip_null=False, batch=batch)


def fn_concat_ws(batch: Batch, sep, *args) -> VarColumn:
    if not isinstance(sep, (str, bytes)):
        raise PlanError("concat_ws separator must be a string literal")
    s = sep if isinstance(sep, str) else sep.decode()
    args = [a for a in args if a is not None]
    if not args:
        return _empty_var(_cap_of(batch), True)
    cols, cap = _norm_concat_args(batch, args, "concat_ws")
    # interleave separators between non-null args: build [a0, sep?, a1, …]
    # where a separator before arg i is emitted iff some non-null arg
    # precedes i AND arg i is non-null. Implement via per-arg conditional
    # separator columns whose row length is 0 when suppressed.
    sep_col = _broadcast_valid(_as_var(s, "concat_ws"), cap)
    out: list[VarColumn] = []
    seen = jnp.zeros(cap, dtype=bool)
    for c in cols:
        emit_sep = jnp.logical_and(seen, c.validity)
        slens = jnp.where(emit_sep, row_lengths(sep_col.offsets), 0)
        out.append(_slice_var(sep_col, jnp.zeros(cap, jnp.int32), slens,
                              validity=jnp.ones(cap, bool)))
        out.append(c)
        seen = jnp.logical_or(seen, c.validity)
    return _concat_cols(out, cap, skip_null=True, batch=batch)


def fn_repeat(batch: Batch, v, k) -> VarColumn:
    col = _as_var(v, "repeat")
    if not isinstance(k, (int, float)):
        raise PlanError("repeat count must be a literal")
    k = max(int(k), 0)
    n = row_lengths(col.offsets)
    lens = n * k
    cap = col.capacity
    vcap = col.value_capacity
    out_vcap = max(vcap * max(k, 1), 1)
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(lens, dtype=jnp.int32)])
    rid = jnp.clip(byte_row_ids(new_off, out_vcap), 0, cap - 1)
    local = jnp.arange(out_vcap, dtype=jnp.int32) - new_off[rid]
    nn = jnp.maximum(n[rid], 1)
    src = jnp.clip(col.offsets[rid] + local % nn, 0, vcap - 1)
    vals = jnp.where(jnp.arange(out_vcap, dtype=jnp.int32) < new_off[-1],
                     col.values[src], 0)
    return VarColumn(vals, new_off, col.validity)


def _pad(batch: Batch, v, width, pad, left: bool, fname: str) -> VarColumn:
    col = _as_var(v, fname)
    cap = col.capacity
    w = _row_int(width, batch, cap)
    pb = b" " if pad is None else (pad.encode() if isinstance(pad, str)
                                   else bytes(pad))
    if len(pb) == 0:
        pb = b" "
    n = row_lengths(col.offsets)
    out_len = jnp.maximum(w, 0)  # rows longer than width get truncated
    npad = jnp.maximum(out_len - n, 0)
    vcap = col.value_capacity
    if not isinstance(width, (int, float)):
        raise PlanError(f"{fname} width must be a literal")
    wmax = max(int(width), 0)
    out_vcap = max(vcap, wmax * cap, 1)
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(out_len, dtype=jnp.int32)])
    rid = jnp.clip(byte_row_ids(new_off, out_vcap), 0, cap - 1)
    local = jnp.arange(out_vcap, dtype=jnp.int32) - new_off[rid]
    pad_arr = jnp.asarray(np.frombuffer(pb, np.uint8))
    if left:
        in_pad = local < npad[rid]
        src_local = local - npad[rid]
    else:
        in_pad = local >= jnp.minimum(n, out_len)[rid]
        src_local = local
    src = jnp.clip(col.offsets[rid] + src_local, 0, vcap - 1)
    pidx = (local if left else local - jnp.minimum(n, out_len)[rid]) % len(pb)
    vals = jnp.where(in_pad, pad_arr[pidx], col.values[src])
    vals = jnp.where(jnp.arange(out_vcap, dtype=jnp.int32) < new_off[-1],
                     vals, 0)
    return VarColumn(vals, new_off, col.validity)


def fn_lpad(batch: Batch, v, width, pad=None) -> VarColumn:
    return _pad(batch, v, width, pad, True, "lpad")


def fn_rpad(batch: Batch, v, width, pad=None) -> VarColumn:
    return _pad(batch, v, width, pad, False, "rpad")


def fn_translate(batch: Batch, v, frm, to) -> VarColumn:
    """Char-level translate via a 256-entry table (delete when `to` is
    shorter, PostgreSQL semantics requires removing — we keep 1:1 mapped
    chars and delete unmapped-from chars)."""
    col = _as_var(v, "translate")
    if not isinstance(frm, (str, bytes)) or not isinstance(to, (str, bytes)):
        raise PlanError("translate from/to must be string literals")
    f = frm.encode() if isinstance(frm, str) else frm
    t = to.encode() if isinstance(to, str) else to
    table = np.arange(256, dtype=np.uint8)
    delete = np.zeros(256, dtype=bool)
    for i, ch in enumerate(f):
        if i < len(t):
            table[ch] = t[i]
        else:
            delete[ch] = True
    mapped = jnp.asarray(table)[col.values]
    if not delete.any():
        return VarColumn(mapped, col.offsets, col.validity)
    # deletion changes row lengths: compact kept bytes
    vcap = col.value_capacity
    cap = col.capacity
    rid = jnp.clip(byte_row_ids(col.offsets, vcap), 0, cap - 1)
    pos = jnp.arange(vcap, dtype=jnp.int32)
    in_row = pos < col.offsets[1:][rid]
    keep = jnp.logical_and(in_row,
                           jnp.logical_not(jnp.asarray(delete)[col.values]))
    new_lens = jnp.zeros(cap, jnp.int32).at[rid].add(keep.astype(jnp.int32))
    new_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(new_lens, dtype=jnp.int32)])
    order = jnp.argsort(jnp.where(keep, pos, vcap + pos), stable=True)
    vals = jnp.where(jnp.arange(vcap, dtype=jnp.int32) < new_off[-1],
                     mapped[order], 0)
    return VarColumn(vals, new_off, col.validity)


def fn_chr(batch: Batch, v) -> VarColumn:
    cap = batch.capacity if batch is not None and batch.columns else 1
    vals, valid = _vals_valid(v, batch)
    if not hasattr(vals, "shape") or getattr(vals, "shape", ()) == ():
        vals = jnp.full(cap, int(vals), jnp.int32)
    codes = jnp.clip(vals.astype(jnp.int32), 0, 255).astype(jnp.uint8)
    offs = jnp.arange(cap + 1, dtype=jnp.int32)
    return VarColumn(codes, offs,
                     valid if valid is not None else jnp.ones(cap, bool))


def fn_ascii(batch: Batch, v) -> FixedColumn:
    col = _as_var(v, "ascii")
    from .layout import first_bytes

    fb = first_bytes(col, 0)
    n = row_lengths(col.offsets)
    return FixedColumn(jnp.where(n > 0, fb, 0).astype(jnp.int64),
                       col.validity)


def fn_initcap(batch: Batch, v) -> VarColumn:
    col = _as_var(v, "initcap")
    vcap = col.value_capacity
    vals = col.values
    is_alpha = jnp.logical_or(
        jnp.logical_and(vals >= ord("a"), vals <= ord("z")),
        jnp.logical_and(vals >= ord("A"), vals <= ord("Z")))
    is_alnum = jnp.logical_or(
        is_alpha, jnp.logical_and(vals >= ord("0"), vals <= ord("9")))
    prev_alnum = jnp.concatenate([jnp.zeros(1, dtype=bool), is_alnum[:-1]])
    # word start also at row starts
    cap = col.capacity
    row_start = jnp.zeros(vcap, dtype=bool).at[
        jnp.clip(col.offsets[:-1], 0, vcap - 1)].set(True)
    word_start = jnp.logical_or(jnp.logical_not(prev_alnum), row_start)
    lo = str_ops._lower_u8(vals)
    up = str_ops._upper_u8(vals)
    return VarColumn(jnp.where(word_start, up, lo), col.offsets,
                     col.validity)


# -- host (irregular) string functions --------------------------------------


def _host_strings(col: VarColumn) -> tuple[list, np.ndarray]:
    vals = np.asarray(col.values)
    offs = np.asarray(col.offsets)
    valid = np.asarray(col.validity)
    out = []
    for i in range(col.capacity):
        out.append(bytes(vals[offs[i]:offs[i + 1]]) if valid[i] else None)
    return out, valid


def _host_var_from(strs: list, valid: np.ndarray) -> VarColumn:
    lens = np.asarray([len(s) if s is not None else 0 for s in strs],
                      np.int32)
    offs = np.zeros(len(strs) + 1, np.int32)
    np.cumsum(lens, out=offs[1:])
    flat = b"".join(s for s in strs if s is not None)
    buf = np.frombuffer(flat, np.uint8) if flat else np.zeros(0, np.uint8)
    from ..batch import bucket_capacity

    vcap = bucket_capacity(max(len(buf), 1))
    pad = np.zeros(vcap, np.uint8)
    pad[:len(buf)] = buf
    return VarColumn(jnp.asarray(pad), jnp.asarray(offs), jnp.asarray(valid))


def fn_replace(batch: Batch, v, frm, to) -> VarColumn:
    """replace(str, from, to) — host implementation (greedy non-overlapping
    semantics need a sequential scan; DataFusion's is host Rust too)."""
    col = _as_var(v, "replace")
    if not isinstance(frm, (str, bytes)) or not isinstance(to, (str, bytes)):
        raise PlanError("replace from/to must be string literals")
    f = frm.encode() if isinstance(frm, str) else frm
    t = to.encode() if isinstance(to, str) else to
    strs, valid = _host_strings(col)
    out = [s.replace(f, t) if (s is not None and f) else s for s in strs]
    return _host_var_from(out, valid)


def fn_split_part(batch: Batch, v, delim, idx) -> VarColumn:
    col = _as_var(v, "split_part")
    if not isinstance(delim, (str, bytes)):
        raise PlanError("split_part delimiter must be a string literal")
    d = delim.encode() if isinstance(delim, str) else delim
    k = int(idx)
    strs, valid = _host_strings(col)
    out = []
    for s in strs:
        if s is None or not d:
            out.append(s if s is not None else None)
            continue
        parts = s.split(d)
        if k > 0:
            out.append(parts[k - 1] if k <= len(parts) else b"")
        elif k < 0:
            out.append(parts[k] if -k <= len(parts) else b"")
        else:
            out.append(b"")
    return _host_var_from(out, valid)


def fn_regexp_replace(batch: Batch, v, pattern, replacement, flags=None
                      ) -> VarColumn:
    import re

    col = _as_var(v, "regexp_replace")
    if not isinstance(pattern, (str, bytes)):
        raise PlanError("regexp_replace pattern must be a string literal")
    pat = pattern if isinstance(pattern, str) else pattern.decode()
    rep = replacement if isinstance(replacement, str) \
        else replacement.decode()
    rep = re.sub(r"\\(\d)", r"\\g<\1>", rep)
    fl = 0
    count = 1
    if flags:
        ff = flags if isinstance(flags, str) else flags.decode()
        if "i" in ff:
            fl |= re.IGNORECASE
        if "g" in ff:
            count = 0
    rx = re.compile(pat.encode(), fl)
    strs, valid = _host_strings(col)
    out = [rx.sub(rep.encode(), s, count=count) if s is not None else None
           for s in strs]
    return _host_var_from(out, valid)


def fn_bit_length(batch: Batch, v) -> FixedColumn:
    col = _as_var(v, "bit_length")
    return FixedColumn(row_lengths(col.offsets).astype(jnp.int64) * 8,
                       col.validity)


def _fn_hash(algo: str):
    def fn(batch: Batch, v):
        import hashlib

        col = _as_var(v, algo)
        strs, valid = _host_strings(col)
        out = [getattr(hashlib, algo)(s).hexdigest().encode()
               if s is not None else None for s in strs]
        return _host_var_from(out, valid)
    return fn


def fn_to_hex(batch: Batch, v):
    vals, valid = _vals_valid(v, batch)
    cap = _cap_of(batch)
    arr = np.asarray(jax.device_get(jnp.asarray(vals))).reshape(-1)
    if arr.shape[0] == 1 and cap > 1:
        arr = np.repeat(arr, cap)
    out = [format(int(x), "x").encode() for x in arr.astype(np.int64)]
    return _host_var_from(
        out, np.asarray(jax.device_get(valid)) if valid is not None
        else np.ones(len(out), bool))


def fn_factorial(batch: Batch, v):
    import math

    vals, valid = _vals_valid(v, batch)
    cap = _cap_of(batch)
    arr = np.asarray(jax.device_get(jnp.asarray(vals))).reshape(-1)
    if arr.shape[0] == 1 and cap > 1:
        arr = np.repeat(arr, cap)
    arr = arr.astype(np.int64)
    if (arr > 20).any() or (arr < 0).any():
        raise PlanError("factorial argument must be in [0, 20] "
                        "(int64 range)")
    out = np.array([math.factorial(int(x)) for x in arr], np.int64)
    return FixedColumn(jnp.asarray(out),
                       jnp.asarray(valid) if valid is not None
                       else jnp.ones(len(out), bool))


def fn_gcd(batch: Batch, a, b):
    av, avd = _vals_valid(a, batch)
    bv, bvd = _vals_valid(b, batch)
    out = jnp.gcd(jnp.asarray(av).astype(jnp.int64),
                  jnp.asarray(bv).astype(jnp.int64))
    valid = jnp.ones(out.shape, bool) if out.ndim else None
    for v in (avd, bvd):
        if v is not None:
            valid = jnp.logical_and(valid, v)
    return FixedColumn(out, valid) if valid is not None else out


def fn_lcm(batch: Batch, a, b):
    av, avd = _vals_valid(a, batch)
    bv, bvd = _vals_valid(b, batch)
    out = jnp.lcm(jnp.asarray(av).astype(jnp.int64),
                  jnp.asarray(bv).astype(jnp.int64))
    valid = jnp.ones(out.shape, bool) if out.ndim else None
    for v in (avd, bvd):
        if v is not None:
            valid = jnp.logical_and(valid, v)
    return FixedColumn(out, valid) if valid is not None else out


def fn_random(batch: Batch):
    return jnp.asarray(np.random.random(_cap_of(batch)))


def fn_uuid(batch: Batch):
    import uuid

    out = [str(uuid.uuid4()).encode() for _ in range(_cap_of(batch))]
    return _host_var_from(out, np.ones(len(out), bool))


def _host_str_arg(x, batch: Batch, cap: int):
    """Per-row python byte strings for a string column or literal."""
    if isinstance(x, (str, bytes)):
        b = x.encode() if isinstance(x, str) else bytes(x)
        return [b] * cap, np.ones(cap, bool)
    col = _as_var(x, "string argument")
    return _host_strings(col)


def fn_levenshtein(batch: Batch, a, b) -> FixedColumn:
    cap = _cap_of(batch)
    sa, va = _host_str_arg(a, batch, cap)
    sb, vb = _host_str_arg(b, batch, cap)

    def dist(x: bytes, y: bytes) -> int:
        if len(x) < len(y):
            x, y = y, x
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x):
            cur = [i + 1]
            for j, cy in enumerate(y):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (cx != cy)))
            prev = cur
        return prev[-1]

    out = np.zeros(cap, np.int64)
    valid = np.asarray(va) & np.asarray(vb)
    for i in range(cap):
        if valid[i] and sa[i] is not None and sb[i] is not None:
            out[i] = dist(sa[i], sb[i])
        else:
            valid[i] = False
    return FixedColumn(jnp.asarray(out), jnp.asarray(valid))


def fn_find_in_set(batch: Batch, v, lst) -> FixedColumn:
    cap = _cap_of(batch)
    sa, va = _host_str_arg(v, batch, cap)
    sl, vl = _host_str_arg(lst, batch, cap)
    out = np.zeros(cap, np.int64)
    valid = np.asarray(va) & np.asarray(vl)
    for i in range(cap):
        if valid[i] and sa[i] is not None and sl[i] is not None:
            parts = sl[i].split(b",")
            out[i] = parts.index(sa[i]) + 1 if sa[i] in parts else 0
        else:
            valid[i] = False
    return FixedColumn(jnp.asarray(out), jnp.asarray(valid))


def fn_overlay(batch: Batch, s, rep, start, length=None) -> VarColumn:
    """overlay(s PLACING rep FROM start [FOR length])."""
    col = _as_var(s, "overlay")
    strs, valid = _host_strings(col)
    if not isinstance(rep, (str, bytes)):
        raise PlanError("overlay replacement must be a string literal")
    rb = rep.encode() if isinstance(rep, str) else bytes(rep)
    p = int(start)
    n = len(rb) if length is None else int(length)
    out = [x[:p - 1] + rb + x[p - 1 + n:] if x is not None else None
           for x in strs]
    return _host_var_from(out, valid)


def fn_regexp_like(batch: Batch, v, pattern, flags=None) -> jnp.ndarray:
    """regexp_like(str, pattern[, flags]) — true when the regex matches
    anywhere in the string (datafusion's builtin the reference exposes)."""
    import re

    col = _as_var(v, "regexp_like")
    if not isinstance(pattern, (str, bytes)):
        raise PlanError("regexp_like pattern must be a string literal")
    pat = pattern if isinstance(pattern, str) else pattern.decode()
    fl = 0
    if flags:
        ff = flags if isinstance(flags, str) else flags.decode()
        if "i" in ff:
            fl |= re.IGNORECASE
        if "s" in ff:
            fl |= re.DOTALL
        if "m" in ff:
            fl |= re.MULTILINE
    rx = re.compile(pat.encode(), fl)
    strs, _valid = _host_strings(col)
    mask = np.array([s is not None and rx.search(s) is not None
                     for s in strs], bool)
    return jnp.asarray(mask)


# ---------------------------------------------------------------------------
# conditional functions
# ---------------------------------------------------------------------------


def _is_stringish(v) -> bool:
    return isinstance(v, (VarColumn, DictColumn, str, bytes))


def fn_coalesce(batch: Batch, *args):
    args = [a for a in args if a is not None]  # NULL literals drop out
    if not args:
        raise PlanError("coalesce needs at least one non-NULL argument")
    if any(_is_stringish(a) for a in args):
        cols, cap = _norm_concat_args(batch, args, "coalesce")
        # pick per-row the first valid column: emit its bytes only
        chosen = jnp.full(cap, len(cols), jnp.int32)
        for i in reversed(range(len(cols))):
            chosen = jnp.where(cols[i].validity, i, chosen)
        out: list[VarColumn] = []
        for i, c in enumerate(cols):
            lens = jnp.where(chosen == i, row_lengths(c.offsets), 0)
            out.append(_slice_var(c, jnp.zeros(cap, jnp.int32), lens,
                                  validity=jnp.ones(cap, bool)))
        merged = _concat_cols(out, cap, skip_null=True, batch=batch)
        return VarColumn(merged.values, merged.offsets, chosen < len(cols))
    cap = batch.capacity if batch is not None and batch.columns else 1
    vals = None
    valid = jnp.zeros(cap, dtype=bool)
    for a in args:
        av, avalid = _vals_valid(a, batch)
        if not hasattr(av, "shape") or getattr(av, "shape", ()) == ():
            av = jnp.full(cap, av)
        if avalid is None:
            avalid = jnp.ones(cap, bool)
        if vals is None:
            vals = av
            valid = avalid
        else:
            take = jnp.logical_and(jnp.logical_not(valid), avalid)
            vals = jnp.where(take, av.astype(vals.dtype), vals)
            valid = jnp.logical_or(valid, avalid)
    return FixedColumn(vals, valid)


def _fn_extremum(name: str, pick):
    def fn(batch: Batch, *args):
        args = [a for a in args if a is not None]
        if not args:
            raise PlanError(f"{name} needs at least one argument")
        cap = batch.capacity if batch is not None and batch.columns else 1
        vals = valid = None
        for a in args:
            av, avalid = _vals_valid(a, batch)
            if not hasattr(av, "shape") or getattr(av, "shape", ()) == ():
                av = jnp.full(cap, av)
            if avalid is None:
                avalid = jnp.ones(cap, bool)
            if vals is None:
                vals, valid = av, avalid
            else:
                av = av.astype(jnp.result_type(vals, av))
                vals = vals.astype(av.dtype)
                # SQL GREATEST/LEAST ignore NULL arguments
                both = jnp.logical_and(valid, avalid)
                vals = jnp.where(both, pick(vals, av),
                                 jnp.where(avalid, av, vals))
                valid = jnp.logical_or(valid, avalid)
        return FixedColumn(vals, valid)

    return fn


def fn_nullif(batch: Batch, a, b):
    from ..plan.expressions import _eval_string_cmp

    if _is_stringish(a) or _is_stringish(b):
        eq = _eval_string_cmp("=", a, b, batch)
        col = _as_var(a, "nullif")
        return VarColumn(col.values, col.offsets,
                         jnp.logical_and(col.validity,
                                         jnp.logical_not(eq)))
    av, avalid = _vals_valid(a, batch)
    bv, _ = _vals_valid(b, batch)
    cap = batch.capacity if batch is not None and batch.columns else 1
    if not hasattr(av, "shape") or getattr(av, "shape", ()) == ():
        av = jnp.full(cap, av)
    if avalid is None:
        avalid = jnp.ones(av.shape[0], bool)
    eq = av == (bv if hasattr(bv, "shape") else jnp.asarray(bv))
    return FixedColumn(av, jnp.logical_and(avalid, jnp.logical_not(eq)))


# ---------------------------------------------------------------------------
# math functions
# ---------------------------------------------------------------------------


def _unary_math(name: str, f, integer_ok: bool = False):
    def fn(batch: Batch, v):
        vals, valid = _vals_valid(v, batch)
        if not hasattr(vals, "shape") or getattr(vals, "shape", ()) == ():
            cap = batch.capacity if batch is not None and batch.columns else 1
            vals = jnp.full(cap, vals)
        if not integer_ok and not jnp.issubdtype(vals.dtype, jnp.floating):
            vals = vals.astype(jnp.float64)
        return _ret_fixed(f(vals), valid, batch)

    fn.__name__ = f"fn_{name}"
    return fn


def fn_abs(batch: Batch, v):
    vals, valid = _vals_valid(v, batch)
    if not hasattr(vals, "shape"):
        vals = jnp.asarray(vals)
    return _ret_fixed(jnp.abs(vals), valid, batch)


def _round_half_away(x, d):
    p = jnp.asarray(10.0, jnp.float64) ** d
    scaled = x.astype(jnp.float64) * p
    return jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5) / p


def fn_round(batch: Batch, v, d=0):
    vals, valid = _vals_valid(v, batch)
    if not hasattr(vals, "shape") or getattr(vals, "shape", ()) == ():
        cap = batch.capacity if batch is not None and batch.columns else 1
        vals = jnp.full(cap, vals, jnp.float64)
    dd = int(d) if isinstance(d, (int, float)) else 0
    out = _round_half_away(vals, dd)
    if not jnp.issubdtype(jnp.asarray(vals).dtype, jnp.floating):
        out = out.astype(vals.dtype)
    return _ret_fixed(out, valid, batch)


def fn_trunc(batch: Batch, v, d=0):
    vals, valid = _vals_valid(v, batch)
    if not hasattr(vals, "shape") or getattr(vals, "shape", ()) == ():
        cap = batch.capacity if batch is not None and batch.columns else 1
        vals = jnp.full(cap, vals, jnp.float64)
    dd = int(d) if isinstance(d, (int, float)) else 0
    p = jnp.asarray(10.0, jnp.float64) ** dd
    out = jnp.trunc(jnp.asarray(vals, jnp.float64) * p) / p
    if not jnp.issubdtype(jnp.asarray(vals).dtype, jnp.floating):
        out = out.astype(vals.dtype)
    return _ret_fixed(out, valid, batch)


def _is_floating(v) -> bool:
    if isinstance(v, float):
        return True
    if isinstance(v, int):
        return False
    return jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)


def fn_power(batch: Batch, a, b):
    av, avalid = _vals_valid(a, batch)
    bv, bvalid = _vals_valid(b, batch)
    out = jnp.power(jnp.asarray(av, jnp.float64), jnp.asarray(bv, jnp.float64))
    if not _is_floating(av) and not _is_floating(bv):
        out = jnp.rint(out).astype(jnp.int64)  # power(int, int) → Int64
    valid = None
    if avalid is not None:
        valid = avalid
    if bvalid is not None:
        valid = bvalid if valid is None else jnp.logical_and(valid, bvalid)
    return _ret_fixed(out, valid, batch)


def fn_atan2(batch: Batch, a, b):
    av, avalid = _vals_valid(a, batch)
    bv, bvalid = _vals_valid(b, batch)
    out = jnp.arctan2(jnp.asarray(av, jnp.float64),
                      jnp.asarray(bv, jnp.float64))
    valid = avalid if bvalid is None else (
        bvalid if avalid is None else jnp.logical_and(avalid, bvalid))
    return _ret_fixed(out, valid, batch)


def fn_mod(batch: Batch, a, b):
    av, avalid = _vals_valid(a, batch)
    bv, bvalid = _vals_valid(b, batch)
    bv_arr = jnp.asarray(bv)
    safe = jnp.where(bv_arr == 0, 1, bv_arr)
    out = jnp.asarray(av) % safe
    valid = avalid if bvalid is None else (
        bvalid if avalid is None else jnp.logical_and(avalid, bvalid))
    if hasattr(bv_arr, "shape") and bv_arr.shape != ():
        zmask = bv_arr != 0
        valid = zmask if valid is None else jnp.logical_and(valid, zmask)
    return _ret_fixed(out, valid, batch)


def fn_log(batch: Batch, a, b=None):
    """log(x) = log10(x); log(base, x) two-arg (DataFusion semantics)."""
    if b is None:
        vals, valid = _vals_valid(a, batch)
        return _ret_fixed(jnp.log10(jnp.asarray(vals, jnp.float64)),
                          valid, batch)
    bval, bvalid = _vals_valid(a, batch)
    xval, xvalid = _vals_valid(b, batch)
    out = jnp.log(jnp.asarray(xval, jnp.float64)) / \
        jnp.log(jnp.asarray(bval, jnp.float64))
    valid = bvalid if xvalid is None else (
        xvalid if bvalid is None else jnp.logical_and(bvalid, xvalid))
    return _ret_fixed(out, valid, batch)


def fn_pi(batch: Batch):
    return float(np.pi)


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------


def _utf8(args):
    return dt.utf8


def _i64(args):
    return dt.int64


def _f64(args):
    return dt.float64


def _bool(args):
    return dt.bool_


def _same_as_first(args):
    return args[0].dtype if args else dt.float64


def _register_all() -> None:
    reg, regt = register_function, register_function_type
    # strings
    reg("upper", fn_upper); regt("upper", _utf8)
    reg("lower", fn_lower); regt("lower", _utf8)
    reg("octet_length", fn_octet_length); regt("octet_length", _i64)
    reg("bit_length", fn_bit_length); regt("bit_length", _i64)
    reg("md5", _fn_hash("md5"), host=True); regt("md5", _utf8)
    reg("sha256", _fn_hash("sha256"), host=True); regt("sha256", _utf8)
    reg("sha512", _fn_hash("sha512"), host=True); regt("sha512", _utf8)
    reg("to_hex", fn_to_hex, host=True); regt("to_hex", _utf8)
    reg("factorial", fn_factorial, host=True); regt("factorial", _i64)
    reg("gcd", fn_gcd); regt("gcd", _i64)
    reg("lcm", fn_lcm); regt("lcm", _i64)
    reg("random", fn_random, host=True); regt("random", _f64)
    reg("uuid", fn_uuid, host=True); regt("uuid", _utf8)
    reg("levenshtein", fn_levenshtein, host=True)
    regt("levenshtein", _i64)
    reg("find_in_set", fn_find_in_set, host=True)
    regt("find_in_set", _i64)
    reg("overlay", fn_overlay, host=True); regt("overlay", _utf8)
    reg("substr", fn_substr); regt("substr", _utf8)
    reg("substring", fn_substr); regt("substring", _utf8)
    reg("left", fn_left); regt("left", _utf8)
    reg("right", fn_right); regt("right", _utf8)
    reg("reverse", fn_reverse); regt("reverse", _utf8)
    reg("trim", fn_trim); regt("trim", _utf8)
    reg("btrim", fn_trim); regt("btrim", _utf8)
    reg("ltrim", fn_ltrim); regt("ltrim", _utf8)
    reg("rtrim", fn_rtrim); regt("rtrim", _utf8)
    reg("strpos", fn_strpos); regt("strpos", _i64)
    reg("instr", fn_strpos); regt("instr", _i64)
    reg("position", fn_strpos); regt("position", _i64)
    reg("starts_with", fn_starts_with); regt("starts_with", _bool)
    reg("ends_with", fn_ends_with); regt("ends_with", _bool)
    reg("contains", fn_contains); regt("contains", _bool)
    reg("concat", fn_concat); regt("concat", _utf8)
    reg("concat_op", fn_concat_op); regt("concat_op", _utf8)
    reg("concat_ws", fn_concat_ws); regt("concat_ws", _utf8)
    reg("repeat", fn_repeat); regt("repeat", _utf8)
    reg("lpad", fn_lpad); regt("lpad", _utf8)
    reg("rpad", fn_rpad); regt("rpad", _utf8)
    reg("translate", fn_translate); regt("translate", _utf8)
    reg("chr", fn_chr); regt("chr", _utf8)
    reg("ascii", fn_ascii); regt("ascii", _i64)
    reg("initcap", fn_initcap); regt("initcap", _utf8)
    reg("replace", fn_replace, host=True); regt("replace", _utf8)
    reg("split_part", fn_split_part, host=True); regt("split_part", _utf8)
    reg("regexp_like", fn_regexp_like, host=True)
    regt("regexp_like", _bool)
    reg("regexp_replace", fn_regexp_replace, host=True)
    regt("regexp_replace", _utf8)
    # conditionals
    reg("coalesce", fn_coalesce); regt("coalesce", _same_as_first)
    reg("nullif", fn_nullif); regt("nullif", _same_as_first)
    reg("ifnull", fn_coalesce); regt("ifnull", _same_as_first)
    reg("nvl", fn_coalesce); regt("nvl", _same_as_first)
    reg("greatest", _fn_extremum("greatest", jnp.maximum))
    regt("greatest", _same_as_first)
    reg("least", _fn_extremum("least", jnp.minimum))
    regt("least", _same_as_first)
    # math
    reg("abs", fn_abs); regt("abs", _same_as_first)
    reg("round", fn_round); regt("round", _same_as_first)
    reg("trunc", fn_trunc); regt("trunc", _same_as_first)
    for nm, f in [("ceil", jnp.ceil), ("ceiling", jnp.ceil),
                  ("floor", jnp.floor)]:
        reg(nm, _unary_math(nm, f)); regt(nm, _f64)
    for nm, f in [("sqrt", jnp.sqrt), ("exp", jnp.exp), ("ln", jnp.log),
                  ("log2", jnp.log2), ("log10", jnp.log10),
                  ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
                  ("asin", jnp.arcsin), ("acos", jnp.arccos),
                  ("atan", jnp.arctan), ("sinh", jnp.sinh),
                  ("cosh", jnp.cosh), ("tanh", jnp.tanh),
                  ("degrees", jnp.degrees), ("radians", jnp.radians),
                  ("cbrt", jnp.cbrt), ("isnan", jnp.isnan),
                  ("asinh", jnp.arcsinh), ("acosh", jnp.arccosh),
                  ("atanh", jnp.arctanh)]:
        reg(nm, _unary_math(nm, f))
        regt(nm, _bool if nm == "isnan" else _f64)
    def _signum(x):
        return jnp.sign(x)
    reg("signum", _unary_math("signum", _signum, integer_ok=True))
    regt("signum", _same_as_first)
    reg("sign", _unary_math("sign", _signum, integer_ok=True))
    regt("sign", _same_as_first)
    def _power_type(args):
        flo = any("float" in str(a.dtype) for a in args[:2])
        return dt.float64 if flo else dt.int64
    reg("power", fn_power); regt("power", _power_type)
    reg("pow", fn_power); regt("pow", _power_type)
    reg("atan2", fn_atan2); regt("atan2", _f64)
    reg("mod", fn_mod); regt("mod", _same_as_first)
    reg("log", fn_log); regt("log", _f64)
    reg("pi", fn_pi); regt("pi", _f64)


_register_all()
