"""EXPLAIN ANALYZE operator metrics + EXON_LOG tracing
(ExecutionPlanMetricsSet / tracing-span analogs, SURVEY.md §5)."""

import logging


def test_explain_analyze_reports_metrics(session, ref_data):
    path = ref_data("fasta", "test.fasta")
    session.sql(f"CREATE EXTERNAL TABLE t STORED AS FASTA LOCATION '{path}'")
    # length() is not pushable, so a FilterExec stays in the plan
    # (prefix-LIKE now pushes into the scan as an exact decode filter)
    t = session.sql("EXPLAIN ANALYZE SELECT id FROM t "
                    "WHERE length(sequence) > 1").collect_arrow()
    assert t.column("plan_type")[0].as_py() == "Plan with Metrics"
    plan = t.column("plan")[0].as_py()
    assert "ScanExec" in plan
    assert "FilterExec" in plan
    assert "output_rows=2" in plan
    assert "elapsed_ms=" in plan


def test_explain_plain_still_logical(session, ref_data):
    path = ref_data("fasta", "test.fasta")
    session.sql(f"CREATE EXTERNAL TABLE t2 STORED AS FASTA LOCATION '{path}'")
    t = session.sql("EXPLAIN SELECT id FROM t2").collect_arrow()
    assert t.column("plan_type")[0].as_py() == "logical_plan"


def test_tracing_spans_log_at_debug(session, ref_data, caplog):
    from exon_tpu.tracing import logger

    path = ref_data("fasta", "test.fasta")
    with caplog.at_level(logging.DEBUG, logger="exon_tpu"):
        session.read_fasta(path).count()
    assert any("scan open" in r.message for r in caplog.records)


def test_explain_analyze_instruments_distributed_plan():
    """EXPLAIN ANALYZE must instrument the SESSION-configured plan: a
    distributed session shows the distributed operators, not a rebuilt
    single-device plan."""
    from exon_tpu import ExonSession
    from exon_tpu.config import new_exon_config

    gff = "/root/reference/exon/exon-core/test-data/datasources/gff/test.gff"
    ctx = ExonSession.with_config_exon(new_exon_config(distributed=True))
    r = ctx.sql(f"EXPLAIN ANALYZE SELECT seqname, COUNT(*) FROM "
                f"gff_scan('{gff}') GROUP BY seqname").to_pandas()
    assert "DistributedAggregateExec" in r.iloc[0, 1]
