"""Prototype race: Pallas one-pass windowed substring match vs the XLA
k-shift lowering in ops/strings.contains. Run on the TPU."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 64 * 1024


def _win_kernel(pat, vals_ref, nxt_ref, out_ref):
    k = len(pat)
    v = vals_ref[...]
    nxt = nxt_ref[...]
    buf = jnp.concatenate([v, nxt[:128]])  # halo (k <= 128)
    hit = jnp.ones((TILE,), jnp.bool_)
    for t in range(k):
        hit &= buf[t:t + TILE] == pat[t]
    out_ref[...] = hit


@functools.partial(jax.jit, static_argnums=(1,))
def pallas_win(vals, pat: bytes):
    n = vals.shape[0]
    grid = n // TILE
    kern = functools.partial(_win_kernel, tuple(pat))
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,)),
            pl.BlockSpec((TILE,), lambda i, g=grid: (jnp.minimum(i + 1, g - 1),)),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.bool_),
    )(vals, vals)


@functools.partial(jax.jit, static_argnums=(1,))
def xla_win(vals, pat: bytes):
    n = vals.shape[0]
    hit = jnp.ones(n, dtype=bool)
    patarr = np.frombuffer(pat, np.uint8)
    for t in range(len(pat)):
        idx = jnp.arange(n, dtype=jnp.int32) + t
        v = vals[jnp.clip(idx, 0, n - 1)]
        hit = jnp.logical_and(hit, jnp.logical_and(v == patarr[t], idx < n))
    return hit


def main():
    rng = np.random.default_rng(0)
    n = 8 << 20  # 8M bytes flat buffer
    vals = rng.integers(65, 91, size=n, dtype=np.uint8)
    pat = b"GATTACA"
    # plant some matches
    for off in rng.integers(0, n - 8, size=1000):
        vals[off:off + len(pat)] = np.frombuffer(pat, np.uint8)
    dv = jax.device_put(vals)

    a = pallas_win(dv, pat)
    b = xla_win(dv, pat)
    na, nb = int(a.sum()), int(b.sum())
    print("matches pallas/xla:", na, nb, "equal:", bool((a == b).all()))

    for name, fn in (("pallas", pallas_win), ("xla", xla_win)):
        fn(dv, pat).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(dv, pat)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1e3:.3f} ms  ({n/dt/1e9:.1f} GB/s)")


if __name__ == "__main__":
    main()
