"""Distributed execution over the 8-virtual-device CPU mesh.

Parity tests: every query runs once on the default single-device path and
once with config.distributed=True; results must match exactly (row sets and
emission order). This exercises the real engine pipeline through shard_map +
all_to_all — the north-star substrate (SURVEY §2e) — not synthetic arrays.
"""

import numpy as np
import pytest

from exon_tpu import ExonSession
from exon_tpu.config import new_exon_config


GFF = "/root/reference/exon/exon-core/test-data/datasources/gff/test.gff"


def _dist_session(**kw):
    cfg = new_exon_config(distributed=True, **kw)
    return ExonSession.with_config_exon(cfg)


def _assert_tables_equal(a, b):
    assert a.column_names == b.column_names
    pa_a, pa_b = a.to_pydict(), b.to_pydict()
    assert pa_a == pa_b


@pytest.fixture
def big_fasta(tmp_path):
    rng = np.random.default_rng(7)
    lines = []
    for i in range(5000):
        seq = "".join(rng.choice(list("ACGTM"), size=rng.integers(10, 60)))
        lines.append(f">id{i} desc{i % 13}\n{seq}\n")
    p = tmp_path / "big.fasta"
    p.write_text("".join(lines))
    return str(p)


def test_distributed_grouped_count_gff(session):
    q = "SELECT seqname, count(*) AS n FROM gff_scan('%s') GROUP BY seqname" % GFF
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)
    assert ref.num_rows > 0


def test_distributed_grouped_multi_aggs(session):
    q = ("SELECT seqname, count(*) AS n, min(start) AS lo, max(\"end\") AS hi,"
         " sum(start) AS s, avg(start) AS a"
         " FROM gff_scan('%s') GROUP BY seqname" % GFF)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_filtered_group(session):
    q = ("SELECT type, count(*) AS n FROM gff_scan('%s') "
         "WHERE start > 100000 GROUP BY type" % GFF)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_ungrouped_count(session, big_fasta):
    q = ("SELECT count(*) FROM fasta_scan('%s') WHERE sequence LIKE 'M%%'"
         % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)
    assert ref.column(0)[0].as_py() > 0


def test_distributed_fasta_group_by_description(session, big_fasta):
    # var-width group keys across many small batches + devices
    q = ("SELECT description, count(*) AS n FROM fasta_scan('%s') "
         "GROUP BY description ORDER BY description" % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)
    assert ref.num_rows == 13


def test_distributed_high_cardinality(session, big_fasta):
    # every id distinct: 5000 groups, exercises exchange + merge sizing
    q = ("SELECT id, count(*) AS n FROM fasta_scan('%s') GROUP BY id" % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    assert ref.num_rows == got.num_rows == 5000
    _assert_tables_equal(ref, got)


def test_distributed_fallback_rep_too_long(tmp_path, session):
    # group key longer than rep_w → falls back to single-device, still exact
    longkey = "K" * 300
    p = tmp_path / "long.fasta"
    p.write_text(f">a {longkey}\nACGT\n>b {longkey}\nGGGG\n>c other\nTTTT\n")
    q = ("SELECT description, count(*) AS n FROM fasta_scan('%s') "
         "GROUP BY description ORDER BY n DESC" % p)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_dataframe_api(big_fasta):
    from exon_tpu.plan.expressions import AggregateCall, col

    s = _dist_session()
    df = s.read_fasta(big_fasta)
    out = df.aggregate(["description"],
                       [AggregateCall("count", None).alias("n")]) \
        .sort("description").collect_arrow()
    assert out.num_rows == 13
    assert sum(out.column("n").to_pylist()) == 5000


GFF_DIR = "/root/reference/exon/exon-core/test-data/datasources/gff"


def test_distributed_join_parity(session, big_fasta, tmp_path):
    # self-join-style: fasta ids joined to a small annotation table
    ann = tmp_path / "ann.gff"
    rows = []
    for i in range(0, 5000, 7):
        rows.append(f"chr1\tsrc\tgene\t{i+1}\t{i+10}\t.\t+\t.\tID=id{i}\n")
    ann.write_text("".join(rows))
    # attributes.ID is Map<Utf8, List<Utf8>> — [1] takes the first value
    # (DataFusion's 1-based array subscript), a utf8 the join can key on
    q = ("SELECT f.id, g.start FROM fasta_scan('%s') f "
         "JOIN gff_scan('%s') g ON f.id = g.attributes.ID[1] "
         "ORDER BY g.start" % (big_fasta, ann))
    ref = session.sql(q).collect_arrow()
    assert ref.num_rows > 0
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


@pytest.fixture
def join_gffs(tmp_path):
    """Reads-vs-annotations style pair: left (reads) 3000 rows over 8
    contigs with distinct starts; right (annotations) 200 rows, ~4 per
    (contig, start) key so the join EXPANDS rows (regression for the
    var-width emit overflow)."""
    rng = np.random.default_rng(11)
    left = tmp_path / "reads.gff"
    rows = []
    for i in range(3000):
        c = f"chr{i % 8}"
        rows.append(f"{c}\tsrc\tread\t{i + 1}\t{i + 50}\t.\t+\t.\t"
                    f"ID=read{i};Name=some_longish_read_name_{i}\n")
    left.write_text("".join(rows))
    right = tmp_path / "ann.gff"
    rows = []
    for i in range(0, 200):
        start = (i % 50) * 7 + 1  # collides with left starts 1,8,15,…
        c = f"chr{(start - 1) % 8}"
        rows.append(f"{c}\tann\tgene\t{start}\t{start + 99}\t.\t+\t.\t"
                    f"ID=gene{i};Name=annotation_with_a_long_name_{i}\n")
    right.write_text("".join(rows))
    return str(left), str(right)


def test_distributed_join_parity_expanding(session, join_gffs):
    left, right = join_gffs
    q = ("SELECT a.seqname, a.start, b.\"end\", b.source FROM gff_scan('%s') a "
         "JOIN gff_scan('%s') b ON a.seqname = b.seqname AND a.start = b.start"
         % (left, right))
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    assert ref.num_rows == got.num_rows > 0
    _assert_tables_equal(ref, got)


def test_distributed_join_then_aggregate(session, join_gffs):
    left, right = join_gffs
    q = ("SELECT a.seqname, count(*) AS n FROM gff_scan('%s') a "
         "JOIN gff_scan('%s') b ON a.seqname = b.seqname "
         "AND a.start = b.start GROUP BY a.seqname ORDER BY a.seqname"
         % (left, right))
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_left_join_parity(session, join_gffs):
    left, right = join_gffs
    q = ("SELECT a.start, b.\"end\" FROM gff_scan('%s') a "
         "LEFT JOIN gff_scan('%s') b ON a.seqname = b.seqname "
         "AND a.start = b.start" % (left, right))
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    assert ref.num_rows == got.num_rows >= 3000
    _assert_tables_equal(ref, got)


# ---------------------------------------------------------------------------
# Distributed TopK (ORDER BY … LIMIT)
# ---------------------------------------------------------------------------


def test_distributed_topk_numeric(session, big_fasta):
    q = ("SELECT id, length(sequence) AS n FROM fasta_scan('%s') "
         "ORDER BY n DESC, id LIMIT 17" % big_fasta)
    ref = session.sql(q).collect_arrow()
    dctx = _dist_session()
    plan = dctx.sql(q)
    from exon_tpu.parallel.distributed import DistributedTopKExec
    phys = plan._physical if hasattr(plan, "_physical") else None
    got = plan.collect_arrow()
    _assert_tables_equal(ref, got)
    assert got.num_rows == 17


def test_distributed_topk_string_key(session, big_fasta):
    q = ("SELECT id, sequence FROM fasta_scan('%s') "
         "ORDER BY sequence LIMIT 9" % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_topk_with_filter(session, big_fasta):
    q = ("SELECT id FROM fasta_scan('%s') WHERE sequence LIKE 'M%%' "
         "ORDER BY id DESC LIMIT 5" % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_topk_offset(session, big_fasta):
    q = ("SELECT id FROM fasta_scan('%s') ORDER BY id LIMIT 7 OFFSET 3"
         % big_fasta)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_topk_gff(session):
    q = ("SELECT seqname, start, \"end\" FROM gff_scan('%s') "
         "ORDER BY \"end\" - start DESC, start LIMIT 11" % GFF)
    ref = session.sql(q).collect_arrow()
    got = _dist_session().sql(q).collect_arrow()
    _assert_tables_equal(ref, got)


def test_distributed_topk_uses_mesh(big_fasta):
    """The lowering must actually produce a DistributedTopKExec."""
    from exon_tpu.parallel.distributed import plan_distributed_topk
    from exon_tpu.plan import logical as L
    from exon_tpu.sql.frontend import plan_select
    from exon_tpu.sql.parser import parse_sql

    dctx = _dist_session()
    stmt = parse_sql("SELECT id FROM fasta_scan('%s') ORDER BY id LIMIT 5"
                     % big_fasta)[0]
    lp = plan_select(dctx, stmt)
    from exon_tpu.plan.planner import optimize
    lp = optimize(lp)
    assert isinstance(lp, L.Limit) and isinstance(lp.input, L.Sort)
    dist = plan_distributed_topk(lp.input, 5, dctx.config)
    assert dist is not None


# ---------------------------------------------------------------------------
# Partitioned (non-broadcast) join
# ---------------------------------------------------------------------------


@pytest.fixture
def join_tables(tmp_path):
    """Two GFF-derived CSV-ish fixtures via memory tables."""
    import pyarrow as pa

    rng = np.random.default_rng(11)
    n_l, n_r = 4000, 1500
    lk = rng.integers(0, 800, size=n_l)
    left = pa.table({
        "k": lk.astype(np.int64),
        "lval": rng.integers(0, 1000, size=n_l).astype(np.int64),
        "name": pa.array([f"row{i}" for i in range(n_l)]),
    })
    rk = rng.integers(0, 1000, size=n_r)
    right = pa.table({
        "k": rk.astype(np.int64),
        "rval": rng.integers(0, 1000, size=n_r).astype(np.int64),
    })
    return left, right


def _run_join(cfg_kwargs, left, right, sql):
    from exon_tpu.sql.frontend import MemTable

    ctx = ExonSession.with_config_exon(new_exon_config(**cfg_kwargs))
    ctx.register_table("l", MemTable(left))
    ctx.register_table("r", MemTable(right))
    return ctx.sql(sql).collect_arrow()


@pytest.mark.parametrize("how_sql", [
    "SELECT l.k, lval, rval FROM l JOIN r ON l.k = r.k",
    "SELECT l.k, lval, rval FROM l LEFT JOIN r ON l.k = r.k",
    "SELECT l.name, rval FROM l JOIN r ON l.k = r.k WHERE rval > 500",
])
def test_partitioned_join_parity(join_tables, how_sql):
    left, right = join_tables
    base = _run_join({}, left, right, how_sql)
    part = _run_join({"distributed": True, "partitioned_join": True},
                     left, right, how_sql)
    _assert_tables_equal(base, part)


def test_partitioned_join_string_keys(tmp_path):
    import pyarrow as pa

    rng = np.random.default_rng(3)
    names = [f"chr{i}" for i in range(1, 23)]
    left = pa.table({
        "c": pa.array([names[i % len(names)] for i in range(3000)]),
        "v": pa.array(np.arange(3000, dtype=np.int64)),
    })
    right = pa.table({
        "c": pa.array([names[i % 7] for i in range(300)]),
        "w": pa.array(np.arange(300, dtype=np.int64) * 10),
    })
    sql = "SELECT l.c, v, w FROM l JOIN r ON l.c = r.c"
    base = _run_join({}, left, right, sql)
    part = _run_join({"distributed": True, "partitioned_join": True},
                     left, right, sql)
    _assert_tables_equal(base, part)


def test_partitioned_join_left_nulls(join_tables):
    left, right = join_tables
    sql = ("SELECT l.k, rval FROM l LEFT JOIN r ON l.k = r.k")
    base = _run_join({}, left, right, sql)
    part = _run_join({"distributed": True, "partitioned_join": True},
                     left, right, sql)
    _assert_tables_equal(base, part)
    # unmatched keys (800..999 absent on left; keys >= 800 only on right)
    assert base.num_rows >= 4000


def test_distributed_count_distinct_parity(session):
    """COUNT(DISTINCT x): the SingleDistinctToGroupBy rewrite's inner dedup
    aggregate (the expensive stage) routes through the mesh; exact parity
    with the single-device plan."""
    import exon_tpu.parallel.distributed as D

    routed = []
    orig = D.plan_distributed_aggregate

    def spy(p, c):
        r = orig(p, c)
        routed.append(r is not None)
        return r

    D.plan_distributed_aggregate = spy
    try:
        for q in (
            "SELECT seqname, COUNT(DISTINCT type) AS n FROM gff_scan('%s') "
            "GROUP BY seqname ORDER BY seqname" % GFF,
            "SELECT COUNT(DISTINCT seqname) FROM gff_scan('%s')" % GFF,
        ):
            ref = session.sql(q).collect_arrow()
            routed.clear()
            got = _dist_session().sql(q).collect_arrow()
            _assert_tables_equal(ref, got)
            assert any(routed), "dedup aggregate did not distribute"
    finally:
        D.plan_distributed_aggregate = orig


def test_distributed_window_partition_parity(session):
    """OVER (PARTITION BY ... ORDER BY ...) routes to the mesh
    (DistributedWindowExec partition-shards the rows) with exact parity."""
    import exon_tpu.parallel.distributed as D

    routed = []
    orig = D.plan_distributed_window

    def spy(p, c):
        r = orig(p, c)
        routed.append(r is not None)
        return r

    D.plan_distributed_window = spy
    try:
        q = ("SELECT seqname, start, "
             "ROW_NUMBER() OVER (PARTITION BY seqname ORDER BY start, "
             "\"end\") AS rn, "
             "SUM(start) OVER (PARTITION BY seqname) AS s "
             "FROM gff_scan('%s') ORDER BY seqname, start, \"end\"" % GFF)
        ref = session.sql(q).collect_arrow()
        got = _dist_session().sql(q).collect_arrow()
        _assert_tables_equal(ref, got)
        assert any(routed), "window did not route to the mesh"
    finally:
        D.plan_distributed_window = orig


def test_distributed_rollup_and_frames_parity(session, big_fasta):
    """Round-4 SQL additions compose with the distributed substrate:
    ROLLUP branches and windows with explicit frames match the
    single-device path exactly."""
    dist = _dist_session()
    for q in [
        "SELECT description, count(*) AS n, sum(length(sequence)) AS s "
        "FROM fasta_scan('{p}') GROUP BY ROLLUP(description) "
        "ORDER BY description NULLS LAST",
        "SELECT description, count(*) FILTER (WHERE length(sequence) > 30)"
        " AS n FROM fasta_scan('{p}') GROUP BY description "
        "ORDER BY description",
        "SELECT id, min(length(sequence)) OVER (PARTITION BY description "
        "ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m "
        "FROM fasta_scan('{p}') ORDER BY id LIMIT 50",
        "SELECT description, max(length(sequence)) - "
        "min(length(sequence)) AS spread FROM fasta_scan('{p}') "
        "GROUP BY description ORDER BY description",
    ]:
        q = q.format(p=big_fasta)
        _assert_tables_equal(session.sql(q).collect_arrow(),
                             dist.sql(q).collect_arrow())


def test_distributed_aggregate_spills_past_state_cap(session, tmp_path,
                                                     monkeypatch):
    """High-cardinality GROUP BY with a 90%-hot-key distribution stays on
    the mesh: on per-device state overflow the accumulated state is
    exchanged, spilled to host, and the wave retried — no single-device
    fallback (fallback is disabled here, so a regression raises)."""
    import exon_tpu.parallel.distributed as D

    rng = np.random.default_rng(11)
    n_files, rows = 24, 1000
    uid = 0
    truth: dict = {}
    for f in range(n_files):
        lines = []
        for i in range(rows):
            if rng.random() < 0.9 and uid > 0:
                desc = "hotkey"
            else:
                desc = f"u{uid:06d}"
                uid += 1
            truth[desc] = truth.get(desc, 0) + 1
            lines.append(f">f{f}r{i} {desc}\nACGT\n")
        (tmp_path / f"p{f}.fasta").write_text("".join(lines))

    spills = []
    orig_plan = D.plan_distributed_aggregate
    orig_merged = D.DistributedAggregateExec._host_merged

    def small(plan, config):
        ex = orig_plan(plan, config)
        if ex is not None:
            ex.state_cap = 256        # force overflow well below default
            ex.fallback = None        # spill must succeed, not fall back
        return ex

    def spy(self, state):
        spills.append(1)
        return orig_merged(self, state)

    monkeypatch.setattr(D, "plan_distributed_aggregate", small)
    monkeypatch.setattr(D.DistributedAggregateExec, "_host_merged", spy)

    q = (f"SELECT description, count(*) AS n FROM t "
         f"GROUP BY description ORDER BY description")
    dist = _dist_session()
    dist.sql(f"CREATE EXTERNAL TABLE t STORED AS FASTA "
             f"LOCATION '{tmp_path}'")
    got = dist.sql(q).collect_arrow().to_pydict()
    want = dict(sorted(truth.items()))
    assert got["description"] == list(want.keys())
    assert got["n"] == list(want.values())
    # the overflow path must actually have spilled (≥ 2 calls: at least
    # one mid-stream spill plus the final flush)
    assert len(spills) >= 2, f"spill path not exercised: {spills}"
