"""Served engine (exon_tpu.serve) + exon-py-analog client round trip."""

import numpy as np
import pytest

from exon_tpu import ExonSession
from exon_tpu.client import ExonClient, ExonClientError
from exon_tpu.serve import ExonServer

FASTA = "/root/reference/exon/exon-core/test-data/datasources/fasta/test.fasta"


@pytest.fixture(scope="module")
def server():
    with ExonServer() as srv:
        yield srv


def test_health(server):
    assert ExonClient(server.address).health()
    assert not ExonClient("http://127.0.0.1:1").health()


def test_sql_roundtrip(server):
    client = ExonClient(server.address)
    tab = client.sql("SELECT 1 AS one, 'x' AS s")
    assert tab.column_names == ["one", "s"]
    assert tab.column("one").to_pylist() == [1]
    assert tab.column("s").to_pylist() == ["x"]


def test_sql_scan_through_server(server):
    client = ExonClient(server.address)
    tab = client.sql(f"SELECT id, sequence FROM fasta_scan('{FASTA}') "
                     f"ORDER BY id")
    assert tab.num_rows == 2
    assert tab.column("id").to_pylist() == ["a", "b"]
    df = client.sql_df(f"SELECT COUNT(*) AS n FROM fasta_scan('{FASTA}')")
    assert int(df["n"][0]) == 2


def test_sql_error_surface(server):
    client = ExonClient(server.address)
    with pytest.raises(ExonClientError):
        client.sql("SELECT definitely_not_a_function(1)")


def test_server_shares_session_state():
    ctx = ExonSession.new_exon()
    with ExonServer(session=ctx) as srv:
        client = ExonClient(srv.address)
        client.sql(f"CREATE EXTERNAL TABLE seqs STORED AS FASTA "
                   f"LOCATION '{FASTA}'")
        tab = client.sql("SELECT COUNT(*) AS n FROM seqs")
        assert tab.column("n").to_pylist() == [2]
        # the registered table is visible on the embedded session too
        assert ctx.sql("SELECT COUNT(*) FROM seqs").collect_arrow() \
            .column(0).to_pylist() == [2]


def test_concurrent_selects_run_in_parallel():
    """SELECTs share a read lock (parallel); DDL takes the write lock
    (exclusive). Instrumented via a wrapper on session.sql that records
    in-flight concurrency."""
    import threading
    import time

    ctx = ExonSession.new_exon()
    state = {"inflight": 0, "peak_read": 0, "peak_write": 0}
    mon = threading.Lock()
    orig = ctx.sql

    def wrapped(q):
        kind = "write" if q.lstrip().lower().startswith("create") else "read"
        with mon:
            state["inflight"] += 1
            state[f"peak_{kind}"] = max(state[f"peak_{kind}"],
                                        state["inflight"])
        try:
            time.sleep(0.25)  # force overlap if the lock allows it
            return orig(q)
        finally:
            with mon:
                state["inflight"] -= 1

    ctx.sql = wrapped
    with ExonServer(session=ctx) as srv:
        client = ExonClient(srv.address)

        def post(q):
            client.sql(q)

        ts = [threading.Thread(target=post, args=("SELECT 1 AS x",))
              for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert state["peak_read"] >= 2, \
            f"concurrent SELECTs serialized: {state}"

        ts = [threading.Thread(
            target=post,
            args=(f"CREATE EXTERNAL TABLE w{i} STORED AS FASTA "
                  f"LOCATION '{FASTA}'",)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert state["peak_write"] == 1, \
            f"DDL did not serialize: {state}"


def test_streamed_result_chunks_reassemble():
    """Chunked-transfer results reassemble exactly on the client."""
    ctx = ExonSession.new_exon()
    with ExonServer(session=ctx) as srv:
        client = ExonClient(srv.address)
        tab = client.sql(f"SELECT id, description, sequence "
                         f"FROM fasta_scan('{FASTA}')")
        assert tab.num_rows == 2
        assert set(tab.column_names) == {"id", "description", "sequence"}
        # empty result still carries a schema
        tab = client.sql(f"SELECT id FROM fasta_scan('{FASTA}') "
                         f"WHERE id = 'nope'")
        assert tab.num_rows == 0 and tab.column_names == ["id"]


def test_multi_statement_body_takes_write_lock():
    """'SELECT 1; CREATE ...' must classify as a writer (every statement
    is considered, not just the head token)."""
    from exon_tpu.serve import _is_readonly

    assert _is_readonly("SELECT 1")
    assert _is_readonly(" ( select 1 ) ")
    assert _is_readonly("SELECT 1; SELECT 2;")
    assert not _is_readonly("SELECT 1; CREATE EXTERNAL TABLE t "
                            "STORED AS FASTA LOCATION '/x'")
    assert not _is_readonly("SELECT 1; SET exon.distributed = true")
    assert not _is_readonly("INSERT INTO t VALUES (1)")
    assert not _is_readonly("")
