"""Worker for the 2-process multi-host parity test (test_multihost.py).

Runs one jax.distributed process of a simulated 2-host CPU cluster (4
virtual devices per host via xla_force_host_platform_device_count), executes
distributed queries through the public session API, and writes results as
JSON for the parent to compare against single-process ground truth.
"""

import json
import os
import sys


def main() -> None:
    data_dir, out_path = sys.argv[1], sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "full"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from exon_tpu import ExonSession
    from exon_tpu.parallel import mesh as mesh_mod

    # record process file-shard activity to prove ingest really split
    shard_calls = []
    orig_iter = mesh_mod.iter_scan_files

    def spy(files):
        out = orig_iter(files)
        if len(out) != len(list(files)):
            shard_calls.append((len(list(files)), len(out)))
        return out

    mesh_mod.iter_scan_files = spy
    import exon_tpu.providers as _prov
    import exon_tpu.tables  # noqa: F401

    _prov.iter_scan_files = spy

    ctx = ExonSession.new_exon()  # init_distributed() runs from env vars
    n_procs = int(os.environ.get("EXON_TPU_NUM_PROCESSES", "2"))
    assert jax.process_count() == n_procs, jax.process_count()
    assert ctx.config.distributed, "multi-process session must distribute"

    results = {}
    ctx.sql(f"CREATE EXTERNAL TABLE t STORED AS FASTA LOCATION '{data_dir}'")

    if mode == "uneven":
        # 9 files over 2 processes x 4 local slots: process 0 owns 5
        # batches (2 waves) while process 1 owns 4 (1 wave), so the second
        # wave exercises the lockstep template-padding path (empty
        # straggler wave)
        df = ctx.sql("SELECT COUNT(*) AS n FROM t")
        results["count_star"] = df.to_pandas().to_dict("records")
        df = ctx.sql("SELECT description, COUNT(*) AS n FROM t "
                     "GROUP BY description ORDER BY description")
        results["group_by"] = df.to_pandas().to_dict("records")
        df = ctx.sql("SELECT id, description FROM t "
                     "ORDER BY description, id LIMIT 4")
        results["topk"] = df.to_pandas().to_dict("records")
        # a MemTable doesn't shard files: multi-host operators must NOT
        # treat it as per-process-sharded (row duplication regression)
        ctx.sql("CREATE TABLE m (k INT)")
        ctx.sql("INSERT INTO m VALUES (3), (1), (2)")
        results["mem_order"] = \
            ctx.sql("SELECT k FROM m ORDER BY k").to_pandas()["k"].tolist()
        results["mem_group"] = ctx.sql(
            "SELECT k, COUNT(*) AS n FROM m GROUP BY k ORDER BY k"
        ).to_pandas().to_dict("records")
        pid = jax.process_index()
        my_share = len(list(range(9))[pid::n_procs])
        assert shard_calls and all(tot == 9 and mine == my_share
                                   for tot, mine in shard_calls), shard_calls
        results["shard_calls"] = len(shard_calls)
        with open(out_path, "w") as f:
            json.dump(results, f, sort_keys=True)
        return

    df = ctx.sql("SELECT COUNT(*) AS n FROM t")
    results["count_star"] = df.to_pandas().to_dict("records")

    df = ctx.sql("SELECT description, COUNT(*) AS n FROM t "
                 "GROUP BY description ORDER BY description")
    results["group_by"] = df.to_pandas().to_dict("records")

    df = ctx.sql("SELECT description, COUNT(*) AS n FROM t "
                 "WHERE sequence LIKE 'AC%' GROUP BY description "
                 "ORDER BY description")
    results["filtered_group_by"] = df.to_pandas().to_dict("records")

    # non-distributed operators run replicated in multi-process mode (the
    # scan-shard context is scoped to distributed execs): every process
    # must still see the full, identical answer
    df = ctx.sql("SELECT id FROM t ORDER BY id LIMIT 3")
    results["order_by"] = df.to_pandas().to_dict("records")

    # broadcast join: probe stream shards by process, build replicates
    df = ctx.sql(
        "SELECT a.description, COUNT(*) AS n FROM t a "
        "JOIN (SELECT DISTINCT description FROM t) b "
        "ON a.description = b.description "
        "GROUP BY a.description ORDER BY a.description")
    results["join"] = df.to_pandas().to_dict("records")

    # distributed TopK: per-process shards feed candidate waves
    df = ctx.sql("SELECT id, description FROM t "
                 "ORDER BY description, id LIMIT 4")
    results["topk"] = df.to_pandas().to_dict("records")

    # multi-host full ORDER BY: per-process sorted runs + exchanged merge
    # (DistributedSortExec) — every process decodes only its file shard
    before = len(shard_calls)
    df = ctx.sql("SELECT id FROM t WHERE sequence LIKE 'AC%' "
                 "ORDER BY id DESC")
    results["order_by_full"] = df.to_pandas()["id"].tolist()
    assert len(shard_calls) == before + 1, \
        "full ORDER BY did not shard ingest across processes"

    # multi-host PARTITION BY window: sharded ingest + one payload
    # exchange, hash-partitioned window compute over the global mesh
    before = len(shard_calls)
    df = ctx.sql("SELECT id, row_number() OVER "
                 "(PARTITION BY description ORDER BY id) AS rn "
                 "FROM t ORDER BY description, id LIMIT 6")
    results["window"] = df.to_pandas().to_dict("records")
    assert len(shard_calls) == before + 1, \
        "PARTITION BY window did not shard ingest across processes"

    # multi-host partitioned join: both sides decode sharded, exchange
    # once, all_to_all key match over the mesh
    ctx.sql("SET exon.partitioned_join = true")
    before = len(shard_calls)
    df = ctx.sql("SELECT COUNT(*) AS n FROM t a "
                 "JOIN t b ON a.description = b.description")
    results["pjoin_count"] = df.to_pandas().to_dict("records")
    assert len(shard_calls) == before + 2, \
        "partitioned join sides did not shard ingest across processes"
    ctx.sql("SET exon.partitioned_join = false")

    # COPY TO in multi-process mode: only process 0 writes, all report
    # the row count
    # NOT inside data_dir: the output would be listed as table data by
    # whichever process scans after the write
    out_fa = os.path.join(os.path.dirname(out_path), "copy_out.fasta")
    df = ctx.sql(f"COPY (SELECT id, description, sequence FROM t "
                 f"WHERE sequence LIKE 'AC%') TO '{out_fa}' STORED AS FASTA")
    results["copy_count"] = int(df.to_pandas().iloc[0, 0])

    # each distributed scan must have decoded only this process's 2 of the
    # 4 files — otherwise the run silently fell back to replicated decode
    assert shard_calls and all(tot == 4 and mine == 2
                               for tot, mine in shard_calls), shard_calls
    results["shard_calls"] = len(shard_calls)

    with open(out_path, "w") as f:
        json.dump(results, f, sort_keys=True)


if __name__ == "__main__":
    main()
