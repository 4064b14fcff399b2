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
