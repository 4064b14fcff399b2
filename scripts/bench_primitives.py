"""Measure TPU primitive costs (compile + run separately), incrementally.

Writes one line per measurement to scripts/prim_results.txt as it goes, so a
monitor can watch progress without interrupting the device.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("scripts/prim_results.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


def bench(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    t1 = time.perf_counter()
    r = compiled(*args)
    jax.block_until_ready(r)
    t2 = time.perf_counter()
    r = compiled(*args)
    jax.block_until_ready(r)
    t3 = time.perf_counter()
    log(f"{name}: compile={t1-t0:.2f}s run1={t2-t1:.3f}s run2={t3-t2:.3f}s")


def main():
    log(f"=== start {time.strftime('%H:%M:%S')} backend={jax.default_backend()}")
    for N in (1 << 20, 1 << 23, 1 << 26):
        log(f"--- N={N}")
        rng = np.random.default_rng(0)
        x8 = jnp.asarray(rng.integers(0, 255, N).astype(np.uint8))
        flag = jnp.asarray(rng.random(N) > 0.5)
        keys = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.int64))
        sorted_idx = jnp.asarray(np.sort(rng.integers(0, N, N)).astype(np.int32))
        rand_idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

        bench("cumsum_i32", lambda f: jnp.cumsum(f.astype(jnp.int32), dtype=jnp.int32), flag)
        bench("cummax_i32", lambda f: jax.lax.cummax(
            jnp.where(f, jnp.arange(N, dtype=jnp.int32), -1)), flag)
        bench("sort_i64", lambda k: jnp.sort(k), keys)
        bench("argsort_i64", lambda k: jnp.argsort(k), keys)
        bench("sort_kv", lambda k, v: jax.lax.sort((k, v.astype(jnp.int32)), num_keys=1),
              keys, rand_idx)
        bench("gather_sorted", lambda x, i: x.at[i].get(indices_are_sorted=True), x8, sorted_idx)
        bench("gather_random", lambda x, i: x[i], x8, rand_idx)
        bench("scatter_set_unique_sorted",
              lambda x, i: jnp.zeros(N + 1, jnp.uint8).at[i].set(
                  x, unique_indices=True, indices_are_sorted=True),
              x8, sorted_idx)
        bench("scatter_add_sorted",
              lambda i: jnp.zeros(N + 1, jnp.int32).at[i].add(
                  1, indices_are_sorted=True), sorted_idx)
        bench("searchsorted", lambda k, q: jnp.searchsorted(k, q),
              jnp.sort(keys), keys)
        # compaction via sort: (key, value) sort where key = kept ? idx : INF
        def compact_sort(f, x):
            kidx = jnp.where(f, jnp.arange(N, dtype=jnp.int32), jnp.int32(2**31 - 1))
            k2, v2 = jax.lax.sort((kidx, x), num_keys=1)
            return v2

        bench("compact_via_sort", compact_sort, flag, x8)
    log("=== done")


if __name__ == "__main__":
    main()
