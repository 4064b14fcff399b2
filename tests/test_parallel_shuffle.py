"""Direct unit tests for the distributed substrate (parallel/mesh.py,
parallel/shuffle.py): bucketize, hash-partition all_to_all exchange, overflow
detection, and the salted two-phase shuffle under heavy key skew."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from exon_tpu.parallel.mesh import make_mesh
from exon_tpu.parallel.shuffle import (bucketize, distributed_group_count,
                                       distributed_group_sum,
                                       hash_partition_shuffle, partition_ids)

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N_DEV)


def test_partition_ids_deterministic_and_in_range():
    keys = jnp.asarray(np.arange(1000, dtype=np.int64))
    p = np.asarray(partition_ids(keys, 8))
    assert p.min() >= 0 and p.max() < 8
    # balanced-ish: murmur finalizer should not collapse partitions
    counts = np.bincount(p, minlength=8)
    assert counts.min() > 50


def test_bucketize_groups_rows_by_destination():
    cap, n_parts, bucket_cap = 64, 4, 32
    rng = np.random.default_rng(0)
    dest = jnp.asarray(rng.integers(0, n_parts, cap), jnp.int32)
    mask = jnp.asarray(rng.random(cap) < 0.8)
    vals = jnp.asarray(rng.integers(0, 1000, cap), jnp.int32)
    (bvals,), counts = jax.jit(
        lambda d, m, v: bucketize(d, m, [v], n_parts, bucket_cap))(dest, mask, vals)
    bvals, counts = np.asarray(bvals), np.asarray(counts)
    dest_h, mask_h, vals_h = map(np.asarray, (dest, mask, vals))
    for part in range(n_parts):
        want = sorted(vals_h[(dest_h == part) & mask_h].tolist())
        got = sorted(bvals[part][:counts[part]].tolist())
        assert got == want


def _run_sharded(mesh, fn, *arrays):
    """Run fn inside shard_map over 'shard' with row-sharded inputs."""
    spec = P("shard")
    put = [jax.device_put(a, NamedSharding(mesh, spec)) for a in arrays]
    wrapped = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,) * len(arrays), out_specs=P(),
        check_vma=False))
    return wrapped(*put)


def test_shuffle_routes_every_key_to_one_owner(mesh):
    rows_per_dev = 128
    total = rows_per_dev * N_DEV
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, total).astype(np.int64)

    def fn(k):
        mask = jnp.ones(k.shape[0], bool)
        rk, rmask, _, overflow = hash_partition_shuffle(
            "shard", k, mask, [], bucket_cap=rows_per_dev * N_DEV)
        # every received key must hash to THIS device
        me = jax.lax.axis_index("shard")
        owner = partition_ids(rk, N_DEV)
        ok = jnp.all(jnp.logical_or(~rmask, owner == me))
        n = jnp.sum(rmask)
        return (jax.lax.psum(n, "shard"),
                jax.lax.psum(jnp.logical_and(ok, ~overflow).astype(jnp.int32),
                             "shard"))

    n_total, all_ok = _run_sharded(mesh, fn, keys)
    assert int(n_total) == total
    assert int(all_ok) == N_DEV


def test_distributed_group_count_and_sum_parity(mesh):
    rows_per_dev = 256
    total = rows_per_dev * N_DEV
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 16, total).astype(np.int32)
    values = rng.random(total).astype(np.float32)
    live = rng.random(total) < 0.7

    def fn(c, v, m):
        counts = distributed_group_count("shard", c, m, 16, rows_per_dev)
        sums = distributed_group_sum("shard", c, v, m, 16, rows_per_dev)
        return counts, sums

    counts, sums = _run_sharded(mesh, fn, codes, values, live)
    expect_c = np.bincount(codes[live], minlength=16)
    expect_s = np.bincount(codes[live], weights=values[live], minlength=16)
    assert (np.asarray(counts) == expect_c).all()
    np.testing.assert_allclose(np.asarray(sums), expect_s, rtol=1e-5)


def test_overflow_detected_on_hot_key_skew(mesh):
    """90% of rows share one key; bucket_cap is far too small for the plain
    shuffle — the overflow flag must fire (never silent drops). The engine
    never hits this for aggregates (it exchanges pre-aggregated partials:
    one state row per key per device) and retries with bigger buckets in
    the final exchange."""
    rows_per_dev = 256
    total = rows_per_dev * N_DEV
    rng = np.random.default_rng(9)
    codes = np.where(rng.random(total) < 0.9, 3,
                     rng.integers(0, 16, total)).astype(np.int32)
    bucket_cap = 64  # hot key has ~230 rows/device → plain shuffle drops

    def plain(c):
        mask = jnp.ones(c.shape[0], bool)
        _, _, _, overflow = hash_partition_shuffle(
            "shard", c.astype(jnp.int64), mask, [], bucket_cap)
        return overflow.astype(jnp.int32)

    overflow = _run_sharded(mesh, plain, codes)
    assert int(overflow) == 1, "plain shuffle must flag dropped rows"

    # a lossless bucket (worst case: all rows to one dst) stays exact
    def big(c):
        mask = jnp.ones(c.shape[0], bool)
        return distributed_group_count("shard", c, mask, 16, rows_per_dev)

    counts = _run_sharded(mesh, big, codes)
    expect = np.bincount(codes, minlength=16)
    assert (np.asarray(counts) == expect).all()


def test_make_mesh_axes():
    m = make_mesh(8)
    assert m.shape["shard"] == 8 and m.shape["lane"] == 1
    m2 = make_mesh(8, lane=2)
    assert m2.shape["shard"] == 4 and m2.shape["lane"] == 2
