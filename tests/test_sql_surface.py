"""SQL surface breadth: CASE WHEN, WITH CTEs, scalar/EXISTS/IN subqueries
(VERDICT round-1 gap #9 — the reference inherits these from DataFusion 44)."""

import pytest

from exon_tpu import ExonSession

GFF = "/root/reference/exon/exon-core/test-data/datasources/gff/test.gff"
FASTA = "/root/reference/exon/exon-core/test-data/datasources/fasta/test.fasta"


@pytest.fixture
def s():
    return ExonSession.new_exon()


def test_case_when_numeric(s):
    t = s.sql(
        "SELECT id, CASE WHEN length(sequence) > 4 THEN 1 ELSE 0 END AS big "
        f"FROM fasta_scan('{FASTA}') ORDER BY id").to_pandas()
    assert list(t.columns) == ["id", "big"]
    assert set(t["big"]) <= {0, 1}


def test_case_when_strings(s):
    t = s.sql(
        "SELECT CASE WHEN start < 100 THEN 'small' WHEN start < 100000 "
        "THEN 'mid' ELSE 'large' END AS bucket, count(*) AS n "
        f"FROM gff_scan('{GFF}') GROUP BY bucket ORDER BY bucket").to_pandas()
    assert set(t["bucket"]) <= {"small", "mid", "large"}
    assert t["n"].sum() == 5000


def test_case_operand_form(s):
    t = s.sql(
        "SELECT CASE seqname WHEN 'sq0' THEN 'zero' ELSE 'other' END AS k, "
        f"count(*) AS n FROM gff_scan('{GFF}') GROUP BY k ORDER BY k").to_pandas()
    assert set(t["k"]) == {"zero", "other"}


def test_case_no_else_is_null(s):
    t = s.sql(
        "SELECT CASE WHEN start < 0 THEN 1 END AS never "
        f"FROM gff_scan('{GFF}') LIMIT 5").to_pandas()
    assert t["never"].isna().all()


def test_with_cte(s):
    t = s.sql(
        f"WITH g AS (SELECT seqname, start FROM gff_scan('{GFF}')) "
        "SELECT seqname, count(*) AS n FROM g GROUP BY seqname "
        "ORDER BY seqname").to_pandas()
    assert t["n"].sum() == 5000


def test_with_multiple_ctes(s):
    t = s.sql(
        f"WITH g AS (SELECT * FROM gff_scan('{GFF}')), "
        "f AS (SELECT seqname FROM g WHERE start < 1000) "
        "SELECT count(*) FROM f").to_pandas()
    assert t.iloc[0, 0] > 0


def test_scalar_subquery(s):
    # fixture has constant start=8 → avg is 8: >= keeps all, > keeps none
    t = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') "
        f"WHERE start >= (SELECT avg(start) FROM gff_scan('{GFF}'))").to_pandas()
    assert int(t.iloc[0, 0]) == 5000
    t2 = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') "
        f"WHERE start > (SELECT avg(start) FROM gff_scan('{GFF}'))").to_pandas()
    assert int(t2.iloc[0, 0]) == 0


def test_exists_subquery(s):
    t = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') WHERE EXISTS "
        f"(SELECT 1 FROM fasta_scan('{FASTA}'))").to_pandas()
    assert int(t.iloc[0, 0]) == 5000
    t2 = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') WHERE EXISTS "
        f"(SELECT 1 FROM fasta_scan('{FASTA}') WHERE id = 'nope')").to_pandas()
    assert int(t2.iloc[0, 0]) == 0


def test_in_subquery(s):
    t = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') WHERE seqname IN "
        f"(SELECT seqname FROM gff_scan('{GFF}') WHERE start < 50)").to_pandas()
    assert int(t.iloc[0, 0]) > 0


def test_not_in_subquery(s):
    t = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') WHERE seqname NOT IN "
        f"(SELECT seqname FROM gff_scan('{GFF}'))").to_pandas()
    assert int(t.iloc[0, 0]) == 0


def test_case_in_where(s):
    t = s.sql(
        f"SELECT count(*) FROM gff_scan('{GFF}') "
        "WHERE CASE WHEN seqname = 'sq0' THEN start < 1000 ELSE false END"
    ).to_pandas()
    assert 0 < int(t.iloc[0, 0]) < 5000


# -- window functions --------------------------------------------------------


def test_row_number_over_partition(s):
    t = s.sql(
        "SELECT seqname, start, "
        "row_number() OVER (PARTITION BY seqname ORDER BY \"end\") AS rn "
        f"FROM gff_scan('{GFF}') ORDER BY seqname, rn LIMIT 6").to_pandas()
    assert list(t["rn"][:3]) == [1, 2, 3]


def test_count_over_partition(s):
    t = s.sql(
        "SELECT seqname, count(*) OVER (PARTITION BY seqname) AS n "
        f"FROM gff_scan('{GFF}') LIMIT 5").to_pandas()
    assert set(t["n"]) <= {2513, 2487}


def test_running_sum_matches_pandas(s, tmp_path):
    import pandas as pd

    p = tmp_path / "w.gff"
    rows = []
    vals = [5, 3, 8, 1, 9, 2, 7, 4]
    for i, v in enumerate(vals):
        rows.append(f"chr{i % 2}\tsrc\tgene\t{v}\t{v + 10}\t.\t+\t.\tID=x{i}\n")
    p.write_text("".join(rows))
    t = s.sql(
        "SELECT seqname, start, "
        "sum(start) OVER (PARTITION BY seqname ORDER BY start) AS rs, "
        "rank() OVER (PARTITION BY seqname ORDER BY start) AS rk, "
        "min(start) OVER (PARTITION BY seqname) AS mn "
        f"FROM gff_scan('{p}') ORDER BY seqname, start").to_pandas()
    df = pd.DataFrame({
        "seqname": [f"chr{i % 2}" for i in range(8)],
        "start": vals}).sort_values(["seqname", "start"])
    df["rs"] = df.groupby("seqname")["start"].cumsum()
    df["rk"] = df.groupby("seqname")["start"].rank(method="min").astype(int)
    df["mn"] = df.groupby("seqname")["start"].transform("min")
    for c in ("rs", "rk", "mn"):
        assert list(t[c]) == list(df[c]), c


def test_lag_lead(s, tmp_path):
    p = tmp_path / "w2.gff"
    p.write_text("".join(
        f"c\tsrc\tgene\t{i * 10 + 1}\t{i * 10 + 5}\t.\t+\t.\tID=y{i}\n"
        for i in range(5)))
    t = s.sql(
        "SELECT start, lag(start) OVER (ORDER BY start) AS prev, "
        "lead(start, 1, -1) OVER (ORDER BY start) AS nxt "
        f"FROM gff_scan('{p}') ORDER BY start").to_pandas()
    assert t["prev"].isna().iloc[0]
    assert list(t["prev"][1:]) == list(t["start"][:-1])
    assert int(t["nxt"].iloc[-1]) == -1


def test_dense_rank_and_ties(s, tmp_path):
    p = tmp_path / "w3.gff"
    starts = [5, 5, 7, 7, 7, 9]
    p.write_text("".join(
        f"c\tsrc\tgene\t{v}\t{v + 1}\t.\t+\t.\tID=z{i}\n"
        for i, v in enumerate(starts)))
    t = s.sql(
        "SELECT start, rank() OVER (ORDER BY start) AS rk, "
        "dense_rank() OVER (ORDER BY start) AS dr, "
        "count(*) OVER (ORDER BY start) AS rc "
        f"FROM gff_scan('{p}') ORDER BY start").to_pandas()
    assert list(t["rk"]) == [1, 1, 3, 3, 3, 6]
    assert list(t["dr"]) == [1, 1, 2, 2, 2, 3]
    # RANGE frame: peers share the running count
    assert list(t["rc"]) == [2, 2, 5, 5, 5, 6]


def test_window_first_last_value(s, tmp_path):
    p = tmp_path / "w4.gff"
    p.write_text("".join(
        f"c{i % 2}\tsrc\tgene\t{i + 1}\t{i + 2}\t.\t+\t.\tID=q{i}\n"
        for i in range(6)))
    t = s.sql(
        "SELECT seqname, start, "
        "first_value(start) OVER (PARTITION BY seqname ORDER BY start) AS fv "
        f"FROM gff_scan('{p}') ORDER BY seqname, start").to_pandas()
    assert list(t[t.seqname == "c0"]["fv"]) == [1, 1, 1]


def test_stored_as_aliases(session, tmp_path):
    """FAA/FNA/FA/FQ STORED AS aliases map to FASTA/FASTQ with their own
    default extensions (exon_context_ext.rs:134-140)."""
    base = "/root/reference/exon/exon-core/test-data/datasources"
    session.sql(f"CREATE EXTERNAL TABLE t_fna STORED AS FNA LOCATION "
                f"'{base}/fasta/test.fna'")
    assert session.sql("SELECT COUNT(*) FROM t_fna").to_pandas().iloc[0, 0] == 2
    session.sql(f"CREATE EXTERNAL TABLE t_fa STORED AS FA LOCATION "
                f"'{base}/fasta/test.fa'")
    assert session.sql("SELECT COUNT(*) FROM t_fa").to_pandas().iloc[0, 0] == 2
    session.sql(f"CREATE EXTERNAL TABLE t_fq STORED AS FQ LOCATION "
                f"'{base}/fastq/test.fq'")
    assert session.sql("SELECT COUNT(*) FROM t_fq").to_pandas().iloc[0, 0] == 2
    # .faa content is FASTA; synthesize since the reference ships none
    p = tmp_path / "prot.faa"
    p.write_text(">p1 desc\nMKV\n>p2\nACDEF\n")
    session.sql(f"CREATE EXTERNAL TABLE t_faa STORED AS FAA LOCATION '{p}'")
    assert session.sql("SELECT COUNT(*) FROM t_faa").to_pandas().iloc[0, 0] == 2


def test_create_function_rejected_cleanly(session):
    """CREATE FUNCTION parses, then errors like ExonFunctionFactory
    (function_factory.rs:28-44) — not a syntax error."""
    import pytest

    from exon_tpu.errors import PlanError

    with pytest.raises(PlanError, match="Unsupported function.*my_fn"):
        session.sql("CREATE FUNCTION my_fn(a BIGINT) RETURNS BIGINT "
                    "RETURN a + 1")


def test_correlated_exists_rewrite(session):
    """Correlated subqueries decorrelate into joins: EXISTS/IN over
    outer = inner equality conjunctions (single- and multi-key), scalar
    aggregates as LEFT JOINs; non-equality correlation still raises."""
    import pandas as pd
    import pytest

    from exon_tpu.errors import SqlError

    session.sql("CREATE TABLE ca (k INT, v INT)")
    session.sql("INSERT INTO ca VALUES (1,10),(2,20),(2,21),(3,30)")
    session.sql("CREATE TABLE cb (k INT, w INT)")
    session.sql("INSERT INTO cb VALUES (2,200),(3,300),(4,400)")
    q = lambda s: session.sql(s).to_pandas().iloc[0, 0]
    assert q("SELECT COUNT(*) FROM ca WHERE EXISTS "
             "(SELECT 1 FROM cb WHERE cb.k = ca.k)") == 3
    assert q("SELECT COUNT(*) FROM ca WHERE NOT EXISTS "
             "(SELECT 1 FROM cb WHERE cb.k = ca.k)") == 1
    assert q("SELECT COUNT(*) FROM ca WHERE EXISTS "
             "(SELECT 1 FROM cb WHERE cb.k = ca.k AND cb.w > 250)") == 1
    # multi-key EXISTS / NOT EXISTS (LEFT JOIN on the DISTINCT key set)
    assert q("SELECT COUNT(*) FROM ca WHERE EXISTS "
             "(SELECT 1 FROM cb WHERE cb.k = ca.k "
             "AND cb.w = ca.v * 10)") == 2  # (2,20)->(2,200),(3,30)->(3,300)
    assert q("SELECT COUNT(*) FROM ca WHERE NOT EXISTS "
             "(SELECT 1 FROM cb WHERE cb.k = ca.k "
             "AND cb.w = ca.v * 10)") == 2
    # correlated scalar aggregates (LEFT JOIN on the grouped subquery)
    r = session.sql("SELECT ca.k, (SELECT MAX(w) FROM cb WHERE cb.k = ca.k)"
                    " AS m FROM ca ORDER BY ca.k, ca.v").to_pandas()
    assert [None if pd.isna(x) else x for x in r["m"]] == \
        [None, 200, 200, 300]
    r = session.sql("SELECT ca.k, (SELECT COUNT(*) FROM cb "
                    "WHERE cb.k = ca.k) AS c FROM ca "
                    "ORDER BY ca.k, ca.v").to_pandas()
    assert r["c"].tolist() == [0, 1, 1, 1]
    # correlated IN (membership equality joins the correlation)
    assert q("SELECT COUNT(*) FROM ca WHERE ca.v * 10 IN "
             "(SELECT w FROM cb WHERE cb.k = ca.k)") == 2
    # non-equality correlation and correlated NOT IN still refuse
    with pytest.raises(SqlError, match="correlated|equalit"):
        session.sql("SELECT COUNT(*) FROM ca WHERE EXISTS "
                    "(SELECT 1 FROM cb WHERE cb.w > ca.v)").to_pandas()
    with pytest.raises(SqlError, match="NOT IN"):
        session.sql("SELECT COUNT(*) FROM ca WHERE ca.v NOT IN "
                    "(SELECT w FROM cb WHERE cb.k = ca.k)").to_pandas()


def test_window_frames_and_ranking(session):
    """ROWS frames (count/sum/avg) and ntile/percent_rank/cume_dist."""
    session.sql("CREATE TABLE wf (g INT, o INT, x INT)")
    session.sql("INSERT INTO wf VALUES (1,1,10),(1,2,20),(1,3,30),(1,4,40)")

    def col(q):
        return session.sql(q).to_pandas()["s"].tolist()

    assert col("SELECT SUM(x) OVER (PARTITION BY g ORDER BY o "
               "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM wf "
               "ORDER BY o") == [10, 30, 50, 70]
    assert col("SELECT SUM(x) OVER (PARTITION BY g ORDER BY o "
               "ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS s FROM wf "
               "ORDER BY o") == [30, 50, 70, 40]
    assert col("SELECT AVG(x) OVER (PARTITION BY g ORDER BY o "
               "ROWS 2 PRECEDING) AS s FROM wf ORDER BY o") == \
        [10.0, 15.0, 20.0, 30.0]
    assert col("SELECT NTILE(3) OVER (PARTITION BY g ORDER BY o) AS s "
               "FROM wf ORDER BY o") == [1, 1, 2, 3]
    got = col("SELECT PERCENT_RANK() OVER (PARTITION BY g ORDER BY o) AS s "
              "FROM wf ORDER BY o")
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, [0, 1/3, 2/3, 1.0]))
    got = col("SELECT CUME_DIST() OVER (PARTITION BY g ORDER BY o) AS s "
              "FROM wf ORDER BY o")
    assert got == [0.25, 0.5, 0.75, 1.0]


def test_window_minmax_rows_frames(session):
    """MIN/MAX over explicit ROWS frames (sparse-table range queries),
    checked against a pandas rolling oracle on randomized data."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 200
    g = rng.integers(0, 5, n)
    o = np.arange(n)
    x = rng.integers(-50, 50, n)
    session.sql("CREATE TABLE wmm (g INT, o INT, x INT)")
    vals = ",".join(f"({gi},{oi},{xi})" for gi, oi, xi in zip(g, o, x))
    session.sql(f"INSERT INTO wmm VALUES {vals}")
    df = pd.DataFrame({"g": g, "o": o, "x": x}).sort_values(["g", "o"])

    for fn, lo, hi in [("MIN", 3, 0), ("MAX", 3, 0), ("MIN", 2, 2),
                       ("MAX", 0, 4), ("MIN", 5, 1)]:
        if hi == 0:
            clause = f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW"
        elif lo == 0:
            clause = f"ROWS BETWEEN CURRENT ROW AND {hi} FOLLOWING"
        else:
            clause = f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
        got = session.sql(
            f"SELECT g, o, {fn}(x) OVER (PARTITION BY g ORDER BY o "
            f"{clause}) AS s FROM wmm ORDER BY g, o").to_pandas()
        op = np.min if fn == "MIN" else np.max
        want = []
        for _, sub in df.groupby("g", sort=True):
            xs = sub["x"].to_numpy()
            for i in range(len(xs)):
                a, b = max(0, i - lo), min(len(xs) - 1, i + hi)
                want.append(float(op(xs[a:b + 1])) if a <= b else np.nan)
        ok = np.array_equal(got["s"].to_numpy(float), np.array(want),
                            equal_nan=True)
        assert ok, (fn, clause)

    # empty frame (2..1 PRECEDING beyond partition start) yields NULL
    r = session.sql(
        "SELECT o, MIN(x) OVER (PARTITION BY g ORDER BY o ROWS BETWEEN "
        "3 PRECEDING AND 2 PRECEDING) AS s FROM wmm ORDER BY g, o "
        "LIMIT 2").to_pandas()
    assert r["s"].isna().tolist() == [True, True]
    session.sql("DROP TABLE wmm")


def test_window_range_frames(session):
    """RANGE frames with explicit value offsets vs a direct oracle:
    ints, floats, DESC ordering, NULL keys, and empty value windows."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 150
    g = rng.integers(0, 4, n)
    k = rng.integers(0, 40, n).astype(float)
    k[rng.random(n) < 0.1] = np.nan  # NULL order keys
    x = rng.integers(-30, 30, n)
    session.sql("CREATE TABLE wr (g INT, k DOUBLE, x INT)")
    vals = ",".join(
        f"({gi},{'NULL' if np.isnan(ki) else ki},{xi})"
        for gi, ki, xi in zip(g, k, x))
    session.sql(f"INSERT INTO wr VALUES {vals}")

    def oracle(fn, lo, hi, desc=False):
        # frame: rows j in same g with key within [k_i+lo, k_i+hi] on the
        # ascending-normalized key; NULL-key rows frame over the null run
        out = {}
        for gi in np.unique(g):
            sel = np.where(g == gi)[0]
            ks = np.where(np.isnan(k[sel]), np.nan,
                          -k[sel] if desc else k[sel])
            for i in sel:
                ki = -k[i] if desc else k[i]
                if np.isnan(ki):
                    mem = sel[np.isnan(ks)]
                else:
                    m = (ks >= (ki + lo if lo is not None else -np.inf)) \
                        & (ks <= (ki + hi if hi is not None else np.inf))
                    mem = sel[m & ~np.isnan(ks)]
                    if lo is None:  # UNBOUNDED PRECEDING includes nulls
                        mem = np.union1d(mem, sel[np.isnan(ks)]) \
                            if desc else mem  # nulls sort first only DESC
                vv = x[mem]
                if fn is len:
                    out[i] = len(vv)  # COUNT over an empty frame is 0
                else:
                    out[i] = (fn(vv) if len(vv) else None)
        return out

    def run(q):
        return session.sql(q).to_pandas()

    # ascending int window
    got = run("SELECT g, k, x, SUM(x) OVER (PARTITION BY g ORDER BY k "
              "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS s, "
              "MIN(x) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN "
              "5 PRECEDING AND 5 FOLLOWING) AS mn FROM wr")
    osum = oracle(np.sum, -5, 5)
    omin = oracle(np.min, -5, 5)
    # match rows back by (g, k, x) is ambiguous with dupes; instead sort
    # engine output and oracle the same way and compare multisets per key
    want_s = sorted((v for v in osum.values() if v is not None))
    got_s = sorted(got["s"].dropna().astype(int).tolist())
    assert got_s == [int(v) for v in want_s]
    want_m = sorted((v for v in omin.values() if v is not None))
    assert sorted(got["mn"].dropna().astype(int).tolist()) == \
        [int(v) for v in want_m]
    # every NULL-key row aggregates exactly the null run
    nullrows = got[got["k"].isna()]
    for gi, sub in nullrows.groupby("g"):
        expect = x[(g == gi) & np.isnan(k)].sum()
        assert (sub["s"] == expect).all()

    # descending + forward-only window (may be empty)
    got = run("SELECT g, k, COUNT(x) OVER (PARTITION BY g ORDER BY k DESC "
              "RANGE BETWEEN 2 FOLLOWING AND 6 FOLLOWING) AS c FROM wr")
    ocnt = oracle(len, 2, 6, desc=True)
    want_c = sorted(v for kk, v in ocnt.items() if not np.isnan(k[kk]))
    assert sorted(got[~got["k"].isna()]["c"].astype(int).tolist()) == want_c

    # multiple ORDER BY keys is rejected
    import pytest as _pt
    from exon_tpu.errors import ExonError
    with _pt.raises(Exception):
        run("SELECT SUM(x) OVER (ORDER BY g, k RANGE BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING) AS s FROM wr")
    session.sql("DROP TABLE wr")


def test_first_last_value_with_frames(session):
    """first_value/last_value honor explicit ROWS and RANGE frames."""
    session.sql("CREATE TABLE wfl (g INT, o INT, x INT)")
    session.sql("INSERT INTO wfl VALUES (1,1,10),(1,2,20),(1,5,50),(1,9,90)")

    def col(q):
        return session.sql(q).to_pandas()["s"].tolist()

    assert col("SELECT first_value(x) OVER (ORDER BY o ROWS BETWEEN "
               "1 PRECEDING AND CURRENT ROW) AS s FROM wfl ORDER BY o") == \
        [10, 10, 20, 50]
    assert col("SELECT last_value(x) OVER (ORDER BY o ROWS BETWEEN "
               "CURRENT ROW AND 1 FOLLOWING) AS s FROM wfl ORDER BY o") == \
        [20, 50, 90, 90]
    # RANGE: values within o +/- 3
    assert col("SELECT first_value(x) OVER (ORDER BY o RANGE BETWEEN "
               "3 PRECEDING AND 3 FOLLOWING) AS s FROM wfl ORDER BY o") == \
        [10, 10, 20, 90]
    # default frame unchanged: last_value runs to the current peer group
    assert col("SELECT last_value(x) OVER (ORDER BY o) AS s FROM wfl "
               "ORDER BY o") == [10, 20, 50, 90]
    # empty frame -> NULL
    r = session.sql("SELECT first_value(x) OVER (ORDER BY o ROWS BETWEEN "
                    "3 PRECEDING AND 2 PRECEDING) AS s FROM wfl "
                    "ORDER BY o").to_pandas()["s"]
    assert r.isna().iloc[0] and r.isna().iloc[1]
    session.sql("DROP TABLE wfl")


def test_expressions_over_aggregates(session):
    session.sql("CREATE TABLE ea (g INT, x DOUBLE, y DOUBLE)")
    session.sql("INSERT INTO ea VALUES (1,1.0,2.0),(1,2.0,3.5),(1,4.0,1.0),"
                "(2,8.0,NULL)")
    r = session.sql("SELECT sum(x)/count(x) + 1 AS r FROM ea").to_pandas()
    assert abs(r["r"].iloc[0] - 4.75) < 1e-12
    r = session.sql("SELECT g, max(x) - min(x) AS spread FROM ea GROUP BY g "
                    "ORDER BY g").to_pandas()
    assert r["spread"].tolist() == [3.0, 0.0]
    r = session.sql("SELECT g, g + count(*) AS gc FROM ea GROUP BY g "
                    "ORDER BY g").to_pandas()
    assert r["gc"].tolist() == [4, 3]
    r = session.sql("SELECT CASE WHEN sum(x) > 10 THEN 'big' ELSE 'small' "
                    "END AS c FROM ea").to_pandas()
    assert r["c"].iloc[0] == "big"
    # NULL aggregate propagates through the expression
    r = session.sql("SELECT g, sum(x*y)/sum(x) AS r FROM ea GROUP BY g "
                    "ORDER BY g").to_pandas()
    assert abs(r["r"].iloc[0] - 6.5 / 3.5) < 1e-12 and r["r"].isna().iloc[1]
    session.sql("DROP TABLE ea")


def test_arithmetic_null_propagation(session):
    session.sql("CREATE TABLE np1 (x DOUBLE, y BIGINT)")
    session.sql("INSERT INTO np1 VALUES (2.0, 4), (NULL, 6), (3.0, NULL)")
    r = session.sql("SELECT x + 1 AS a, y / 2 AS b, x * y AS c FROM np1"
                    ).to_pandas()
    assert r["a"].isna().tolist() == [False, True, False]
    assert r["b"].isna().tolist() == [False, False, True]
    assert r["c"].isna().tolist() == [False, True, True]
    # NULL comparison excludes the row
    n = session.sql("SELECT count(*) FROM np1 WHERE x + 1 > 0").to_pandas()
    assert int(n.iloc[0, 0]) == 2
    session.sql("DROP TABLE np1")


def test_bool_corr_approx_aggregates(session):
    """bool_and/bool_or/every, corr/covar, approx_* lower onto the
    streaming partials; checked against numpy on complete pairs only."""
    import numpy as np

    session.sql("CREATE TABLE ba (g INT, x DOUBLE, y DOUBLE)")
    session.sql("INSERT INTO ba VALUES (1,1.0,2.0),(1,2.0,3.5),(1,4.0,1.0),"
                "(2,8.0,NULL)")
    xs, ys = np.array([1.0, 2.0, 4.0]), np.array([2.0, 3.5, 1.0])

    def one(q):
        return session.sql(q).to_pandas().iloc[0, 0]

    assert bool(one("SELECT bool_and(x > 0) FROM ba")) is True
    assert bool(one("SELECT bool_and(x > 5) FROM ba")) is False
    assert bool(one("SELECT bool_or(x > 5) FROM ba")) is True
    assert bool(one("SELECT every(x > 0) FROM ba")) is True
    assert int(one("SELECT approx_distinct(g) FROM ba")) == 2
    assert float(one("SELECT approx_median(x) FROM ba")) == 3.0
    assert abs(one("SELECT corr(x, y) FROM ba")
               - np.corrcoef(xs, ys)[0, 1]) < 1e-9
    assert abs(one("SELECT covar_samp(x, y) FROM ba")
               - np.cov(xs, ys, ddof=1)[0, 1]) < 1e-9
    assert abs(one("SELECT covar_pop(x, y) FROM ba")
               - np.cov(xs, ys, ddof=0)[0, 1]) < 1e-9
    # degenerate: single pair -> NULL
    r = one("SELECT corr(x, x) FROM ba WHERE g = 2")
    assert r is None or np.isnan(r)
    # grouped
    r = session.sql("SELECT g, bool_or(y IS NULL) AS b FROM ba GROUP BY g "
                    "ORDER BY g").to_pandas()
    assert r["b"].tolist() == [False, True]
    session.sql("DROP TABLE ba")


def test_nth_value(session):
    session.sql("CREATE TABLE nv (g INT, x DOUBLE)")
    session.sql("INSERT INTO nv VALUES (1,1.0),(1,2.0),(1,4.0),(2,8.0)")
    r = session.sql("SELECT nth_value(x, 2) OVER (PARTITION BY g ORDER BY x)"
                    " AS r FROM nv ORDER BY g, x").to_pandas()["r"]
    assert r.isna().tolist() == [True, False, False, True]
    assert r.iloc[1] == 2.0 and r.iloc[2] == 2.0
    r = session.sql("SELECT nth_value(x, 2) OVER (ORDER BY x ROWS BETWEEN "
                    "1 PRECEDING AND 1 FOLLOWING) AS r FROM nv WHERE g = 1 "
                    "ORDER BY x").to_pandas()["r"]
    assert r.tolist() == [2.0, 2.0, 4.0]
    session.sql("DROP TABLE nv")


def test_rollup_cube_grouping_sets(session):
    session.sql("CREATE TABLE gs (a VARCHAR, b INT, x DOUBLE)")
    session.sql("INSERT INTO gs VALUES ('p',1,1.0),('p',1,2.0),('p',2,4.0),"
                "('q',1,8.0)")
    r = session.sql(
        "SELECT a, b, sum(x) AS s FROM gs GROUP BY ROLLUP(a, b) "
        "ORDER BY a NULLS LAST, b NULLS LAST").to_pandas()
    rows = [(row["a"] if row["a"] == row["a"] else None,
             int(row["b"]) if row["b"] == row["b"] else None,
             row["s"]) for _, row in r.iterrows()]
    assert rows == [("p", 1, 3.0), ("p", 2, 4.0), ("p", None, 7.0),
                    ("q", 1, 8.0), ("q", None, 8.0), (None, None, 15.0)]
    r = session.sql("SELECT a, sum(x) AS s FROM gs GROUP BY CUBE(a) "
                    "ORDER BY a NULLS LAST").to_pandas()
    assert r["s"].tolist() == [7.0, 8.0, 15.0]
    r = session.sql(
        "SELECT a, b, count(*) AS n FROM gs GROUP BY GROUPING SETS "
        "((a), (b), ()) ORDER BY a NULLS LAST, b NULLS LAST").to_pandas()
    assert r["n"].tolist() == [3, 1, 3, 1, 4]
    assert r["a"].isna().tolist() == [False, False, True, True, True]
    # HAVING applies per branch
    r = session.sql(
        "SELECT a, sum(x) AS s FROM gs GROUP BY ROLLUP(a) "
        "HAVING sum(x) > 7.5 ORDER BY a NULLS LAST").to_pandas()
    assert r["s"].tolist() == [8.0, 15.0]
    session.sql("DROP TABLE gs")


def test_order_by_aggregate_and_grouping_fn(session):
    session.sql("CREATE TABLE oba (g INT, x DOUBLE)")
    session.sql("INSERT INTO oba VALUES (1,1.0),(1,2.0),(2,8.0)")
    r = session.sql("SELECT g, sum(x) AS s FROM oba GROUP BY g "
                    "ORDER BY sum(x) DESC").to_pandas()
    assert r["g"].tolist() == [2, 1] and list(r.columns) == ["g", "s"]
    # aggregate key not in the SELECT list
    r = session.sql("SELECT g FROM oba GROUP BY g ORDER BY count(*) * -1"
                    ).to_pandas()
    assert r["g"].tolist() == [1, 2]
    r = session.sql("SELECT g, grouping(g) AS gr, sum(x) AS s FROM oba "
                    "GROUP BY ROLLUP(g) ORDER BY gr, g").to_pandas()
    assert r["gr"].tolist() == [0, 0, 1] and r["s"].tolist() == [3.0, 8.0, 11.0]
    session.sql("DROP TABLE oba")


def test_named_window_clause(session):
    session.sql("CREATE TABLE nw (g INT, x DOUBLE)")
    session.sql("INSERT INTO nw VALUES (1,1.0),(1,2.0),(2,8.0)")
    r = session.sql(
        "SELECT x, row_number() OVER w AS rn, sum(x) OVER w AS s FROM nw "
        "WINDOW w AS (PARTITION BY g ORDER BY x) ORDER BY g, x").to_pandas()
    assert r["rn"].tolist() == [1, 2, 1]
    assert r["s"].tolist() == [1.0, 3.0, 8.0]
    r = session.sql(
        "SELECT x, sum(x) OVER w1 AS a, count(*) OVER w2 AS b FROM nw "
        "WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY g) "
        "ORDER BY x").to_pandas()
    assert r["a"].tolist() == [1.0, 3.0, 11.0]
    assert r["b"].tolist() == [2, 2, 1]
    import pytest as _pt
    with _pt.raises(Exception, match="window name"):
        session.sql("SELECT row_number() OVER nope FROM nw").to_pandas()
    # a subquery in FROM parses after the outer SELECT list: the outer
    # body's OVER w must not leak into the nested body's unknown-window
    # check (named-OVER scoping is per select body)
    r = session.sql(
        "SELECT x, sum(x) OVER w AS s FROM "
        "(SELECT g, x FROM nw WHERE x < 5) t "
        "WINDOW w AS (PARTITION BY g ORDER BY x) ORDER BY x").to_pandas()
    assert r["s"].tolist() == [1.0, 3.0]
    session.sql("DROP TABLE nw")


def test_distinct_on(session):
    session.sql("CREATE TABLE don (g INT, x DOUBLE, s VARCHAR)")
    session.sql("INSERT INTO don VALUES (1,1.0,'a'),(1,2.0,'b'),"
                "(2,8.0,'c'),(2,5.0,'d')")
    r = session.sql("SELECT DISTINCT ON (g) g, x, s FROM don "
                    "ORDER BY g, x DESC").to_pandas()
    assert r.values.tolist() == [[1, 2.0, "b"], [2, 8.0, "c"]]
    r = session.sql("SELECT DISTINCT ON (g) g, x FROM don "
                    "ORDER BY g, x").to_pandas()
    assert r["x"].tolist() == [1.0, 5.0]
    # plain DISTINCT unaffected
    r = session.sql("SELECT DISTINCT g FROM don ORDER BY g").to_pandas()
    assert r["g"].tolist() == [1, 2]
    session.sql("DROP TABLE don")


def test_subscript_and_map_access(session, tmp_path):
    """DataFusion subscript surface: map value by key (dot or bracket),
    1-based list elements, struct fields by bracket; missing keys and
    out-of-range indexes are NULL."""
    import pandas as pd

    ann = tmp_path / "attrs.gff"
    rows = []
    for i in range(6):
        rows.append(f"chr1\tsrc\tgene\t{i+1}\t{i+10}\t.\t+\t.\t"
                    f"ID=id{i};Tag=a{i},b{i}\n")
    ann.write_text("".join(rows))
    g = f"gff_scan('{ann}')"
    r = session.sql(f"SELECT attributes.ID[1] AS x FROM {g} "
                    f"ORDER BY start").to_pandas()
    assert r["x"].tolist() == [f"id{i}" for i in range(6)]
    r = session.sql(f"SELECT attributes['Tag'][2] AS x FROM {g} "
                    f"ORDER BY start").to_pandas()
    assert r["x"].tolist() == [f"b{i}" for i in range(6)]
    # missing key and out-of-range element → NULL
    r = session.sql(f"SELECT attributes['Nope'] AS a, "
                    f"attributes.ID[5] AS b FROM {g} LIMIT 2").to_pandas()
    assert all(v is None for v in r["a"]) and all(pd.isna(r["b"]))
    # filter + group on extracted values
    r = session.sql(f"SELECT COUNT(*) AS n FROM {g} "
                    f"WHERE attributes.ID[1] = 'id3'").to_pandas()
    assert r["n"].tolist() == [1]
    # struct subscript (SDF data struct)
    sdf = tmp_path / "one.sdf"
    sdf.write_text("m\n p\n\n  1  0  0  0  0  0  0  0  0  0999 V2000\n"
                   "    0.0 0.0 0.0 C 0\nM  END\n> <k1>\nv1\n\n$$$$\n")
    r = session.sql(f"SELECT t.data['k1'] AS v FROM sdf_scan('{sdf}') t"
                    ).to_pandas()
    assert r["v"].tolist() == ["v1"]
