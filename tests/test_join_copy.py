"""Join executor + COPY TO write-path tests."""

import os

import pytest

from exon_tpu import ExonSession


@pytest.fixture()
def ctx(ref_data):
    c = ExonSession.new_exon()
    base = "/root/reference/exon/exon-core/test-data/datasources"
    c.sql(f"CREATE EXTERNAL TABLE gff STORED AS GFF LOCATION '{base}/gff/test.gff'")
    c.sql(f"CREATE EXTERNAL TABLE fa STORED AS FASTA LOCATION '{base}/fasta/test.fasta'")
    return c


def test_inner_join_string_keys(ctx):
    # first 50 rows: 40 sq0 + 10 sq1; build: 20 sq0 rows → 800 pairs
    n = ctx.sql("""
      SELECT COUNT(*) FROM (SELECT seqname FROM gff LIMIT 50) a
      JOIN (SELECT seqname AS s FROM gff LIMIT 20) b ON a.seqname = b.s
    """).to_pandas().iloc[0, 0]
    assert n == 800


def test_inner_join_int_keys(ctx):
    n = ctx.sql("""
      SELECT COUNT(*) FROM (SELECT start FROM gff LIMIT 100) x
      JOIN (SELECT start AS st FROM gff LIMIT 100) y ON x.start = y.st
    """).to_pandas().iloc[0, 0]
    assert n == 10000


def test_left_join_unmatched(ctx):
    n = ctx.sql("""
      SELECT COUNT(*) FROM (SELECT seqname FROM gff) g
      LEFT JOIN (SELECT seqname AS s, start FROM gff WHERE seqname = 'sq1' LIMIT 1) h
        ON g.seqname = h.s
    """).to_pandas().iloc[0, 0]
    assert n == 5000  # sq1 rows match the 1 build row; sq0 rows pass through


def test_join_projection_columns(ctx):
    t = ctx.sql("""
      SELECT a.seqname, s FROM (SELECT seqname FROM gff LIMIT 5) a
      JOIN (SELECT seqname AS s FROM gff LIMIT 4) b ON a.seqname = b.s
    """).to_pandas()
    assert len(t) == 20
    assert (t["seqname"] == t["s"]).all()


def test_copy_fasta_roundtrip(ctx, tmp_path):
    out = str(tmp_path / "out.fasta")
    n = ctx.sql(f"COPY fa TO '{out}' STORED AS FASTA").to_pandas().iloc[0, 0]
    assert n == 2
    back = ctx.read_fasta(out).collect_arrow()
    orig = ctx.sql("SELECT * FROM fa").collect_arrow()
    assert back.equals(orig)


def test_copy_fasta_gzip(ctx, tmp_path):
    out = str(tmp_path / "out.fasta.gz")
    ctx.sql(f"COPY fa TO '{out}' STORED AS FASTA").collect()
    assert ctx.read_fasta(out).count() == 2
    with open(out, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"


def test_copy_csv_and_parquet(ctx, tmp_path):
    out = str(tmp_path / "o.csv")
    ctx.sql(f"COPY (SELECT id, sequence FROM fa) TO '{out}'").collect()
    assert '"id","sequence"' in open(out).read()
    pout = str(tmp_path / "o.parquet")
    ctx.sql(f"COPY (SELECT id FROM fa) TO '{pout}' STORED AS PARQUET").collect()
    import pyarrow.parquet as pq

    assert pq.read_table(pout).num_rows == 2


def test_copy_fastq(ctx, ref_data, tmp_path):
    base = "/root/reference/exon/exon-core/test-data/datasources"
    ctx.sql(f"CREATE EXTERNAL TABLE fq STORED AS FASTQ LOCATION '{base}/fastq/test.fastq'")
    out = str(tmp_path / "out.fastq")
    n = ctx.sql(f"COPY fq TO '{out}' STORED AS FASTQ").to_pandas().iloc[0, 0]
    assert n == 2
    back = ctx.read_fastq(out).collect_arrow()
    orig = ctx.sql("SELECT * FROM fq").collect_arrow()
    assert back.equals(orig)


def test_join_var_width_expansion_overflow(tmp_path, session):
    """Row-expanding join whose output string bytes exceed the probe
    column's value capacity (regression: emit buffers were sized at the
    INPUT vcap, corrupting offsets on expansion)."""
    left = tmp_path / "l.gff"
    # 40 rows, every row same (seqname, start) → join expands 40×40 = 1600
    left.write_text("".join(
        f"chromosome_with_long_name\tsrc\tgene\t5\t10\t.\t+\t.\tID=a{i}\n"
        for i in range(40)))
    q = ("SELECT a.seqname, b.type FROM gff_scan('%s') a "
         "JOIN gff_scan('%s') b ON a.seqname = b.seqname "
         "AND a.start = b.start" % (left, left))
    t = session.sql(q).collect_arrow()
    assert t.num_rows == 1600
    assert set(t.column("seqname").to_pylist()) == {"chromosome_with_long_name"}


def test_join_keys_hashing_above_sentinel(session, tmp_path):
    """Regression: build-side padding used a finite 1<<62 sentinel, so any
    key whose 64-bit content hash exceeded it sorted past the padding
    block and the probe's clip dropped ALL its matches (~1/8 of keys).
    Exercise enough random string keys that some hash above 2^62, and
    check exact pandas parity."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(99)
    left = pa.table({
        "k": [f"key{v}" for v in rng.integers(0, 200, 3000)],
        "x": rng.integers(0, 10, 3000),
    })
    right = pa.table({
        "k": [f"key{v}" for v in rng.integers(0, 220, 500)],
        "y": rng.integers(0, 10, 500),
    })
    pl, pr = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(left, pl)
    pq.write_table(right, pr)
    session.sql(f"CREATE EXTERNAL TABLE jl STORED AS PARQUET LOCATION '{pl}'")
    session.sql(f"CREATE EXTERNAL TABLE jr STORED AS PARQUET LOCATION '{pr}'")
    got = session.sql("SELECT COUNT(*) FROM jl JOIN jr ON jl.k = jr.k"
                      ).to_pandas().iloc[0, 0]
    want = len(left.to_pandas().merge(right.to_pandas(), on="k"))
    assert got == want
    g = session.sql("SELECT jl.k AS k, COUNT(*) AS n FROM jl JOIN jr "
                    "ON jl.k = jr.k GROUP BY jl.k ORDER BY jl.k").to_pandas()
    gp = left.to_pandas().merge(right.to_pandas(), on="k") \
        .groupby("k").size().reset_index(name="n").sort_values("k")
    assert g["k"].tolist() == gp["k"].tolist()
    assert g["n"].tolist() == gp["n"].tolist()


def test_right_full_cross_joins(session):
    session.sql("CREATE TABLE ja (k INT, v INT)")
    session.sql("INSERT INTO ja VALUES (1,10),(2,20)")
    session.sql("CREATE TABLE jb (k INT, w INT)")
    session.sql("INSERT INTO jb VALUES (2,200),(3,300)")

    r = session.sql("SELECT * FROM ja RIGHT JOIN jb ON ja.k = jb.k "
                    "ORDER BY jb.k").to_pandas()
    assert r["k_right"].tolist() == [2, 3]
    assert r["v"].isna().tolist() == [False, True]

    r = session.sql("SELECT * FROM ja FULL JOIN jb ON ja.k = jb.k "
                    "ORDER BY ja.k NULLS LAST").to_pandas()
    assert len(r) == 3
    assert r["v"].isna().tolist() == [False, False, True]
    assert r["w"].isna().tolist() == [True, False, False]

    r = session.sql("SELECT * FROM ja CROSS JOIN jb ORDER BY ja.k, jb.k"
                    ).to_pandas()
    assert len(r) == 4
    r = session.sql("SELECT count(*) FROM ja, jb").to_pandas()
    assert int(r.iloc[0, 0]) == 4
    r = session.sql("SELECT * FROM ja, jb WHERE ja.k = jb.k").to_pandas()
    assert r.values.tolist() == [[2, 20, 2, 200]]
    session.sql("DROP TABLE ja")
    session.sql("DROP TABLE jb")


def test_left_join_on_filter_null_extends(session):
    """An ON filter invalidates matches but must not drop probe rows:
    they null-extend instead (the old behavior silently dropped them)."""
    session.sql("CREATE TABLE fa (k INT, v INT)")
    session.sql("INSERT INTO fa VALUES (1,10),(2,20)")
    session.sql("CREATE TABLE fb (k INT, w INT)")
    session.sql("INSERT INTO fb VALUES (2,200),(3,300)")
    r = session.sql("SELECT * FROM fb LEFT JOIN fa ON fb.k = fa.k "
                    "AND fa.v > 15 ORDER BY fb.k").to_pandas()
    assert len(r) == 2 and r["v"].isna().tolist() == [False, True]
    r = session.sql("SELECT * FROM fb LEFT JOIN fa ON fb.k = fa.k "
                    "AND fa.v > 25 ORDER BY fb.k").to_pandas()
    assert len(r) == 2 and r["v"].isna().all()
    # RIGHT JOIN keeps all right rows under a failing ON filter too
    r = session.sql("SELECT fb.w FROM fa RIGHT JOIN fb ON fa.k = fb.k "
                    "AND fa.v > 15 ORDER BY fb.w").to_pandas()
    assert r["w"].tolist() == [200, 300]
    session.sql("DROP TABLE fa")
    session.sql("DROP TABLE fb")


def test_join_and_group_null_key_semantics(session):
    """SQL NULL semantics: equi-joins never match through NULL (not even
    NULL = NULL), while GROUP BY keeps NULLs as one group distinct from
    zero/empty values."""
    import pandas as pd

    session.sql("CREATE TABLE nl (k INT)")
    session.sql("INSERT INTO nl VALUES (1), (0), (NULL)")
    session.sql("CREATE TABLE nr (k INT, v INT)")
    session.sql("INSERT INTO nr VALUES (1, 10), (0, 5), (NULL, 99)")
    r = session.sql("SELECT nl.k, nr.v FROM nl JOIN nr ON nl.k = nr.k "
                    "ORDER BY nl.k").to_pandas()
    assert r.values.tolist() == [[0, 5], [1, 10]]
    r = session.sql("SELECT nl.k, nr.v FROM nl LEFT JOIN nr "
                    "ON nl.k = nr.k ORDER BY nl.k NULLS LAST").to_pandas()
    assert len(r) == 3 and pd.isna(r.iloc[2, 1])
    r = session.sql("SELECT k, COUNT(*) AS n FROM nl GROUP BY k "
                    "ORDER BY k NULLS LAST").to_pandas()
    assert r["n"].tolist() == [1, 1, 1]
    ks = [None if pd.isna(x) else int(x) for x in r["k"]]
    assert ks == [0, 1, None]
    # var-width keys: NULL string vs empty string stay distinct
    session.sql("CREATE TABLE ns (s VARCHAR)")
    session.sql("INSERT INTO ns VALUES ('a'), (''), (NULL), (NULL)")
    r = session.sql("SELECT s, COUNT(*) AS n FROM ns GROUP BY s "
                    "ORDER BY s NULLS LAST").to_pandas()
    assert r["n"].tolist() == [1, 1, 2]
