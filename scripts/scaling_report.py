"""Scaling-efficiency report for the distributed aggregate pipeline.

Hardware reality: this environment has ONE tunneled TPU chip; multi-chip
execution is validated on an 8-virtual-device CPU mesh (parity, not speed).
So the report gives three honest numbers:

1. measured per-chip throughput of the fused wave step (rows/s/chip) on
   whatever backend is available;
2. measured all_to_all exchange volume per device for the group-partial
   state (bytes) — the only inter-chip traffic in the pipeline;
3. PROJECTED multi-chip scaling efficiency from (1)+(2) against published
   ICI bandwidth (v5e: ~45 GB/s/link each direction): the exchange happens
   once per query (not per wave), so projected efficiency at N chips is
   t_scan_compute / (t_scan_compute + t_exchange + t_merge) for the
   benchmark-scale workload.

Writes SCALING_r05.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("SCALING_CPU"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from exon_tpu.parallel.mesh import make_mesh
    from exon_tpu.ops.aggregate import sort_group_ids

    backend = jax.devices()[0].platform
    n_dev = len(jax.devices())

    # -- (1) per-chip wave-step throughput: hash + sort-group + segment-sum
    CAP = 1 << 20
    NGROUP_CAP = 1 << 14

    @jax.jit
    def wave_step(keys, vals, length):
        mask = jnp.arange(CAP, dtype=jnp.int32) < length
        gids, gkeys, ng = sort_group_ids(keys, mask)
        sums = jnp.zeros(CAP, jnp.float64).at[
            jnp.clip(gids, 0, CAP - 1)].add(jnp.where(mask, vals, 0.0))
        cnts = jnp.zeros(CAP, jnp.int64).at[
            jnp.clip(gids, 0, CAP - 1)].add(mask.astype(jnp.int64))
        return gkeys, sums, cnts, ng

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 100_000, size=CAP), jnp.int64)
    vals = jnp.asarray(rng.random(CAP))
    out = wave_step(keys, vals, jnp.int32(CAP))
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = wave_step(keys, vals, jnp.int32(CAP))
    jax.block_until_ready(out)
    t_wave = (time.perf_counter() - t0) / reps
    rows_per_s_chip = CAP / t_wave

    # -- (2) exchange volume per device (group-partial all_to_all state).
    # Round 5 mechanics (parallel/distributed.py _host_merged): the state
    # is sliced to the live-group bucket AND the reps to the longest live
    # key before the exchange, and the all_to_all ships per-(src,dst)
    # buckets sized for a uniform hash split (2x margin, overflow-retried)
    # — padded traffic therefore scales with distinct groups and real key
    # widths. Model the flagship (uniprot description GROUP BY: ~5k live
    # groups/device, keys ≤ 24 B) and the worst case (capacity-bound
    # state, the pre-round-5 shape).
    from exon_tpu.batch import bucket_capacity
    from exon_tpu.parallel.distributed import (DEFAULT_REP_W,
                                               DEFAULT_STATE_CAP)

    N_MODEL = 8  # modeled slice size
    live_groups = 5_000
    rep_w_live = int(bucket_capacity(24, 8))
    row_bytes_live = 8 + 8 + 16 + rep_w_live + 4 + 1
    live_cap = int(bucket_capacity(live_groups, 128))
    bucket = int(bucket_capacity(max(64, 2 * live_cap // N_MODEL), 64))
    exchange_bytes = N_MODEL * bucket * row_bytes_live
    row_bytes_cap = 8 + 8 + 16 + DEFAULT_REP_W + 4 + 1
    exchange_bytes_capacity_bound = \
        N_MODEL * DEFAULT_STATE_CAP * row_bytes_cap
    recv_rows = N_MODEL * bucket

    # -- (3) projected efficiency at N chips for the flagship workload:
    # scan 560k rows/chip (uniprot-scale per-chip share), one exchange.
    ICI_GBPS = 45e9  # v5e per-link, each direction
    rows_per_chip = 560_000
    t_dev = rows_per_chip / rows_per_s_chip
    t_e2e = 0.20  # measured: 560k-row scan+filter+count per chip (bench.py)
    # merge sorts what a device received; scale the measured 1M-row wave
    t_merge = t_wave * (recv_rows / CAP)
    t_merge_cap = t_wave * (N_MODEL * DEFAULT_STATE_CAP / CAP)

    def eff(xbytes, t_base, t_m):
        t_x = xbytes / ICI_GBPS
        return t_base / (t_base + t_x + t_m)

    projected = {
        "device_compute_only":
            round(eff(exchange_bytes, t_dev, t_merge), 4),
        "device_compute_only_capacity_bound_state":
            round(eff(exchange_bytes_capacity_bound, t_dev, t_merge_cap),
                  4),
        "end_to_end_per_chip":
            round(eff(exchange_bytes, t_e2e, t_merge), 4),
    }

    # -- CPU-mesh correctness anchor (when we have >1 device)
    mesh_ok = None
    if n_dev >= 2:
        try:
            mesh = make_mesh(min(n_dev, 8))
            from exon_tpu.parallel.shuffle import distributed_group_count

            n_shard = mesh.shape["shard"]
            C = 128

            def step(codes, live):
                # bucket must cover the worst-case rows landing on one
                # (src, dst) pair: C rows/shard could all share one group
                return distributed_group_count("shard", codes, live, 16,
                                               C * n_shard)

            f = jax.jit(jax.shard_map(step, mesh=mesh,
                                      in_specs=(P("shard"), P("shard")),
                                      out_specs=P(), check_vma=False))
            codes = jnp.asarray(rng.integers(0, 16, size=C * n_shard),
                                jnp.int32)
            live = jnp.ones(C * n_shard, bool)
            got = np.asarray(jax.device_get(f(codes, live)))
            want = np.bincount(np.asarray(codes), minlength=16)
            mesh_ok = bool((got == want).all())
        except Exception as e:
            mesh_ok = f"error: {e}"

    report = {
        "backend": backend,
        "n_devices": n_dev,
        "wave_step_rows_per_s_per_chip": round(rows_per_s_chip, 1),
        "wave_step_ms": round(t_wave * 1e3, 3),
        "exchange_bytes_per_device": exchange_bytes,
        "exchange_bytes_capacity_bound": exchange_bytes_capacity_bound,
        "modeled_live_groups": live_groups,
        "ici_assumption_gbps": ICI_GBPS / 1e9,
        "projected_scaling_efficiency": projected,
        "note": ("single-chip environment: efficiency is projected from "
                 "measured per-chip compute + modeled ICI exchange (one "
                 "all_to_all of the group state per query); multi-chip "
                 "correctness is verified on the virtual CPU mesh"),
        "cpu_mesh_collective_parity": mesh_ok,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r05.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
