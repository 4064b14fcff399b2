"""Isolate which device ops in the decode phases are slow, with REAL sync
(device_get of a scalar reduction of each output)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("scripts/phase_ops_results.txt", "a", buffering=1)


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")


N = 1 << 27  # 128M bytes


def bench(name, fn, *args, n=3):
    f = jax.jit(fn)
    r = f(*args)
    _ = jax.device_get(r)  # compile+run
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        _ = jax.device_get(r)
        ts.append(time.perf_counter() - t0)
    log(f"{name}: {min(ts)*1000:.0f} ms  ({N/min(ts)/1e9:.2f} GB/s elem)")


def main():
    log(f"=== phase ops {time.strftime('%H:%M:%S')} N={N}")
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(0, 255, N).astype(np.uint8))
    jax.block_until_ready(arr)

    bench("eq_sum (1 pass)", lambda a: jnp.sum((a == 10).astype(jnp.int32)), arr)
    bench("cumsum_last", lambda a: jnp.cumsum(
        (a == 10).astype(jnp.int32), dtype=jnp.int32)[-1], arr)
    bench("cummax_last", lambda a: jax.lax.cummax(
        jnp.where(a == 10, jnp.arange(N, dtype=jnp.int32), -1))[-1], arr)
    bench("shift_and (line starts)", lambda a: jnp.sum(jnp.logical_and(
        jnp.concatenate([jnp.ones(1, bool), a[:-1] == 10]),
        a == ord(">")).astype(jnp.int32)), arr)

    flag = arr == 10

    def compact_sum(a, f):
        from exon_tpu.ops.device_text import compact

        out, total = compact(a, f, N)
        return jnp.sum(out.astype(jnp.int32)) + total

    bench("compact (cumsum+scatter)", compact_sum, arr, flag)

    def seg_len(a, f):
        from exon_tpu.ops.device_text import segment_lengths

        rec = jnp.cumsum(f.astype(jnp.int32), dtype=jnp.int32) - 1
        return jnp.sum(segment_lengths(jnp.clip(rec, 0, (1 << 20) - 1),
                                       jnp.logical_not(f), 1 << 20))

    bench("segment_lengths (scatter-add 1M bins)", seg_len, arr, flag)

    def fmis(a, f):
        from exon_tpu.ops.device_text import first_match_in_segment

        return jnp.sum(first_match_in_segment(a == 32, f).astype(jnp.int64))

    bench("first_match_in_segment", fmis, arr, flag)

    from exon_tpu.formats.fasta_device import _phase1

    def p1(a):
        r = _phase1(a, jnp.int32(N), False)
        return r[0] + r[1]

    bench("phase1_noheader", p1, arr)
    log("=== done")


if __name__ == "__main__":
    main()
