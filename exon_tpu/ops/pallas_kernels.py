"""Pallas TPU kernels for the hot operator paths (experimental).

Hand-scheduled alternates to the XLA lowerings in ops/aggregate.py and
ops/alignment.py, fusing what the reference runs as separate DataFusion
operator loops (FilterExec → HashAggregate; rust_bio_alignment):

  * ``masked_group_count``  — single-pass grouped count (mask + group code)
  * ``prefix_match_count``  — fused prefix-LIKE predicate + grouped count
  * ``sw_scores_pallas``    — Smith-Waterman DP, VMEM-resident row tiles

STATUS / measured on a v5e-1 (2026-08): XLA's default lowering WINS for all
three today — grouped count 0.05 ms vs 0.23 ms (XLA's scatter-add beats the
one-hot VPU formulation), SW 24.6 GCUPS vs 0.4 GCUPS (the per-step
``pltpu.roll`` log-step cummax dominates; lax.scan's HBM carry round-trip
is cheaper than lane rotates at these shapes). These kernels stay
correctness-tested (interpreter mode in CI, verified on hardware) as the
substrate for future fusions where the balance flips — e.g. multi-query SW
batching where the MXU one-hot matmul formulation applies — but the engine
defaults to the XLA paths everywhere. Profile before switching defaults.

Round-3 remeasurement (same chip, per-call synced — scripts/
pallas_substr_bench.py): the engine's hot op mix is already at or near
roofline under XLA, so a hand kernel has nothing to win on these paths:
  * substring LIKE '%pat%' (k=7 shifted-AND over an 8 MiB flat buffer):
    0.043 ms ≈ 197 GB/s; jnp.roll variant 0.034 ms ≈ 250 GB/s — XLA fuses
    the k shifts into one HBM pass (a Pallas halo-tile kernel could at
    best ~2x this, and Mosaic rejects the 1-D byte concatenate needed for
    the halo; per-dispatch overhead dominates at batch shapes anyway).
    CAVEAT (round-4): 8 MiB working sets are small enough that dispatch
    overhead confounds a GB/s claim; treat these as op-level comparisons
    between formulations, not a chip-roofline proof.
  * scatter-add grouped count 4M rows → 1024 groups: 0.055 ms (~300 GB/s);
    one-hot MXU dot formulation 0.026 ms — both far below dispatch cost.

Round-4 remeasurement with ≥128 MiB working sets (v5e-1 via the tunneled
backend; each number includes ~27 ms tunnel round-trip, measured as the
no-op baseline and quoted raw — subtract it for on-chip time):
  * jnp.sort 16M int64 (128 MiB): 59 ms  (~32 ms net — bitonic)
  * jnp.argsort 16M int64:        60 ms
  * random gather 16M int64:     169 ms  (~142 ms net ≈ 0.9 GB/s random)
  * unique-index scatter 16M:    141 ms  (~114 ms net)
  * tiled sort [2048, 8192]:      39 ms  (~12 ms net)
The measured conclusion REVERSES the round-3 radix-sort plan: any radix or
merge sort built on 16M-row random gathers/scatters loses to XLA's bitonic
sort outright (one scatter pass alone costs 3-4x the whole sort).
SortExec therefore external-sorts: device-sorted bounded runs + host
searchsorted merges (plan/physical.py SortExec), which also caps memory at
O(run) on device instead of O(result).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE = 8 * 1024  # rows per grid step: 8 sublanes × 128 lanes × 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# masked grouped count
# ---------------------------------------------------------------------------


def _group_count_kernel(codes_ref, mask_ref, out_ref):
    """Grid over row tiles; out accumulates [G_pad] counts."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    codes = codes_ref[...]          # [1, TILE] int32
    mask = mask_ref[...]            # [1, TILE] int32 (0/1)
    g_pad = out_ref.shape[-1]
    # one-hot compare per group id: VPU-friendly [G_pad, TILE] broadcast
    gids = jax.lax.broadcasted_iota(jnp.int32, (g_pad, codes.shape[-1]), 0)
    eq = jnp.where(codes == gids, jnp.int32(1), jnp.int32(0))
    hits = eq * mask
    out_ref[...] += jnp.sum(hits, axis=1, dtype=jnp.int32)[None, :]


def masked_group_count(codes: jnp.ndarray, mask: jnp.ndarray,
                       num_groups: int, interpret: bool = False
                       ) -> jnp.ndarray:
    """counts[g] = sum(mask & (codes == g)) in one HBM pass."""
    # Mosaic has no 64-bit support; trace the kernel in 32-bit mode even
    # though the session runs with jax_enable_x64
    with jax.enable_x64(False):
        return _masked_group_count(codes, mask, num_groups, interpret)


@functools.partial(jax.jit, static_argnames=("num_groups", "interpret"))
def _masked_group_count(codes, mask, num_groups: int,
                        interpret: bool = False) -> jnp.ndarray:
    n = codes.shape[0]
    n_pad = _cdiv(max(n, 1), TILE) * TILE
    codes_p = jnp.full((1, n_pad), -1, jnp.int32).at[0, :n].set(
        codes.astype(jnp.int32))
    mask_p = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(
        mask.astype(jnp.int32))
    g_pad = _cdiv(max(num_groups, 1), LANE) * LANE
    grid = (n_pad // TILE,)
    out = pl.pallas_call(
        _group_count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, g_pad), jnp.int32),
        interpret=interpret,
    )(codes_p, mask_p)
    return out[0, :num_groups]


# ---------------------------------------------------------------------------
# fused prefix predicate + grouped count
# ---------------------------------------------------------------------------


def _prefix_count_kernel(prefix_ref, lens_ref, codes_ref, lit_ref, out_ref):
    """Rows tile: case-insensitive prefix equality vs a literal, grouped
    count. prefix [TILE_R, K_pad], lens [1, TILE_R], codes [1, TILE_R],
    lit [1, K_pad] with 0 beyond the literal length."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = prefix_ref[...].astype(jnp.int32)
    lit = lit_ref[...].astype(jnp.int32)

    # case-fold both sides (ASCII)
    def fold(x):
        is_lower = jnp.logical_and(x >= ord("a"), x <= ord("z"))
        return jnp.where(is_lower, x - 32, x)

    live = jnp.where(lit != 0, jnp.int32(1), jnp.int32(0))  # [1, K_pad]
    neq = jnp.where(fold(p) != fold(lit), jnp.int32(1), jnp.int32(0))
    mismatches = jnp.sum(neq * live, axis=1, dtype=jnp.int32)
    k = jnp.sum(live, dtype=jnp.int32)
    ok = jnp.where(mismatches == 0, jnp.int32(1), jnp.int32(0))
    long_enough = jnp.where(lens_ref[0, :] >= k, jnp.int32(1), jnp.int32(0))
    hit = ok * long_enough                        # [TILE_R] int32
    codes = codes_ref[0, :]
    g_pad = out_ref.shape[-1]
    gids = jax.lax.broadcasted_iota(jnp.int32, (g_pad, hit.shape[0]), 0)
    eq = jnp.where(codes[None, :] == gids, jnp.int32(1), jnp.int32(0))
    hits = eq * hit[None, :]
    out_ref[...] += jnp.sum(hits, axis=1, dtype=jnp.int32)[None, :]


# ---------------------------------------------------------------------------
# Smith-Waterman local alignment (the reference's rust_bio_alignment analog)
# ---------------------------------------------------------------------------

NEG = -(1 << 20)


def _sw_kernel_factory(m_steps: int, L: int):
    """DP over the query runs entirely in VMEM: the XLA lax.scan version
    round-trips the [N, L] carry through HBM every step; here one row tile
    stays resident across all query characters."""

    shifts = []
    k = 1
    while k < L:
        shifts.append(k)
        k <<= 1

    def kernel(seq_ref, valid_ref, q_ref, out_ref):
        seq = seq_ref[...].astype(jnp.int32)        # [T, L]
        valid = valid_ref[...]                      # [T, L] int32
        T = seq.shape[0]
        jpos = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
        col0 = jnp.where(jpos == 0, jnp.int32(1), jnp.int32(0))

        def shift_right(x, k, fill):
            rolled = pltpu.roll(x, k, axis=1)
            return jnp.where(jpos >= k, rolled, fill)

        def step(i, carry):
            H, colmax, best = carry
            q_char = q_ref[0, i]
            s = jnp.where(seq == q_char, jnp.int32(1), jnp.int32(-1))
            s = jnp.where(valid == 1, s, NEG)
            diag = shift_right(H, 1, jnp.int32(0)) + s
            E = colmax - 2
            H0 = jnp.maximum(jnp.maximum(diag, E), 0)
            # running cummax of (H0 + j) via log-step doubling
            run = H0 + jpos
            for k in shifts:
                run = jnp.maximum(run, shift_right(run, k, NEG))
            F = shift_right(run, 1, NEG) - jpos - 1
            F = jnp.where(col0 == 1, NEG, F)
            H = jnp.maximum(H0, jnp.maximum(F, 0))
            H = jnp.where(valid == 1, H, 0)
            colmax = jnp.maximum(colmax - 1, H)
            best = jnp.maximum(best, jnp.max(H, axis=1))
            return H, colmax, best

        H0 = jnp.zeros((T, L), jnp.int32)
        cm0 = jnp.full((T, L), NEG, jnp.int32)
        b0 = jnp.zeros((T,), jnp.int32)
        _, _, best = jax.lax.fori_loop(0, m_steps, step, (H0, cm0, b0))
        out_ref[...] = best[None, :]

    return kernel


def sw_scores_pallas(seq_mat, seq_valid, query, interpret: bool = False):
    """Local-alignment best score per row vs a fixed query — Pallas TPU
    version of ops.alignment.sw_scores_vs_query (identical scoring: match
    +1, mismatch −1, linear gap −1)."""
    with jax.enable_x64(False):
        n, L = seq_mat.shape
        m = int(query.shape[0])
        # row tile sized so ~6 live [T, L] int32 buffers (H, colmax, run,
        # seq, valid + input double-buffering) stay under the 16MB VMEM cap
        budget_rows = max(64, (8 * 1024 * 1024) // (24 * L))
        tile = 64
        while tile * 2 <= budget_rows:
            tile *= 2
        n_pad = _cdiv(max(n, 1), tile) * tile
        seq_p = jnp.zeros((n_pad, L), jnp.uint8).at[:n].set(seq_mat)
        val_p = jnp.zeros((n_pad, L), jnp.int32).at[:n].set(
            seq_valid.astype(jnp.int32))
        m_pad = _cdiv(max(m, 1), LANE) * LANE
        q_p = jnp.zeros((1, m_pad), jnp.int32).at[0, :m].set(
            query.astype(jnp.int32))
        kernel = _sw_kernel_factory(m, L)
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            interpret=interpret,
        )(seq_p, val_p, q_p)
        return out[0, :n]


TILE_R = 2048


def prefix_match_count(prefix: jnp.ndarray, lengths: jnp.ndarray,
                       codes: jnp.ndarray, literal: jnp.ndarray,
                       num_groups: int, interpret: bool = False
                       ) -> jnp.ndarray:
    """counts[g] over rows whose prefix case-insensitively starts with the
    literal (literal padded with zeros to K_pad)."""
    with jax.enable_x64(False):
        return _prefix_match_count(prefix, lengths, codes, literal,
                                   num_groups, interpret)


@functools.partial(jax.jit,
                   static_argnames=("num_groups", "interpret"))
def _prefix_match_count(prefix, lengths, codes, literal,
                        num_groups: int, interpret: bool = False
                        ) -> jnp.ndarray:
    n, k = prefix.shape
    k_pad = _cdiv(max(k, 1), LANE) * LANE
    n_pad = _cdiv(max(n, 1), TILE_R) * TILE_R
    p = jnp.zeros((n_pad, k_pad), jnp.uint8).at[:n, :k].set(prefix)
    lens = jnp.zeros((1, n_pad), jnp.int32).at[0, :n].set(
        lengths.astype(jnp.int32))
    cod = jnp.full((1, n_pad), -1, jnp.int32).at[0, :n].set(
        codes.astype(jnp.int32))
    lit = jnp.zeros((1, k_pad), jnp.uint8).at[0, :literal.shape[0]].set(
        literal)
    g_pad = _cdiv(max(num_groups, 1), LANE) * LANE
    grid = (n_pad // TILE_R,)
    out = pl.pallas_call(
        _prefix_count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, g_pad), jnp.int32),
        interpret=interpret,
    )(p, lens, cod, lit)
    return out[0, :num_groups]
