"""Randomized differential tests: engine SQL vs pandas oracles.

This style of test caught two real bugs in round 4 (join padding-sentinel
aliasing dropping ~1/8 of keys; float NaN values destroyed at Arrow
ingest), so it stays as a permanent oracle. Seeds are fixed for
reproducibility; sizes stay small enough for CI.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _eq(a, b, tol=1e-9):
    if len(a) != len(b):
        return False
    for c in a.columns:
        for x, y in zip(a[c], b[c]):
            if x != y and not (pd.isna(x) and pd.isna(y)) and not (
                    isinstance(x, (float, np.floating)) and abs(x - y) < tol):
                return False
    return True


@pytest.fixture(scope="module")
def fuzz_tables(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    rng = np.random.default_rng(21)
    n = 5000
    left = pa.table({
        "k": [f"k{v}" if v % 13 else None for v in rng.integers(0, 50, n)],
        "x": rng.integers(0, 100, n),
    })
    m = 300
    right = pa.table({
        "k": [f"k{v}" for v in rng.integers(0, 60, m)],
        "y": rng.normal(0, 1, m),
    })
    pl, pr = str(d / "l.parquet"), str(d / "r.parquet")
    pq.write_table(left, pl)
    pq.write_table(right, pr)
    return pl, pr, left.to_pandas(), right.to_pandas()


def test_join_aggregate_vs_pandas(session, fuzz_tables):
    pl, pr, dl, dr = fuzz_tables
    session.sql(f"CREATE EXTERNAL TABLE fl STORED AS PARQUET LOCATION '{pl}'")
    session.sql(f"CREATE EXTERNAL TABLE fr STORED AS PARQUET LOCATION '{pr}'")
    got = session.sql("SELECT COUNT(*) FROM fl JOIN fr ON fl.k = fr.k"
                      ).to_pandas().iloc[0, 0]
    assert got == len(dl.merge(dr, on="k"))
    g = session.sql("SELECT fl.k AS k, COUNT(*) AS n FROM fl JOIN fr "
                    "ON fl.k = fr.k GROUP BY fl.k ORDER BY fl.k").to_pandas()
    gp = dl.merge(dr, on="k").groupby("k").size().reset_index(name="n") \
        .sort_values("k").reset_index(drop=True)
    assert _eq(g, gp)
    # SQL equi-join drops NULL keys; matched non-null rows expand, null and
    # unmatched left rows appear once
    nl = session.sql("SELECT COUNT(*) FROM fl LEFT JOIN fr ON fl.k = fr.k"
                     ).to_pandas().iloc[0, 0]
    want = len(dl[dl.k.notna()].merge(dr, on="k", how="left")) + \
        int(dl.k.isna().sum())
    assert nl == want


def test_window_running_aggregates_vs_pandas(session, fuzz_tables, tmp_path):
    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame({
        "g": [f"p{v}" for v in rng.integers(0, 12, n)],
        "o": rng.integers(0, 5000, n),  # ties exercise RANGE peer frames
        "i": rng.integers(-100, 100, n),
    })
    p = str(tmp_path / "w.parquet")
    pq.write_table(pa.table(df), p)
    session.sql(f"CREATE EXTERNAL TABLE wt STORED AS PARQUET LOCATION '{p}'")
    got = session.sql(
        "SELECT g, o, i, SUM(i) OVER (PARTITION BY g ORDER BY o) AS rs, "
        "LAG(i) OVER (PARTITION BY g ORDER BY o, i) AS lg "
        "FROM wt ORDER BY g, o, i").to_pandas()
    w = df.sort_values(["g", "o", "i"], kind="stable").copy()
    w["cs"] = w.groupby("g")["i"].cumsum()
    # RANGE frame: peers (same o) share the value at the LAST peer row
    w["rs"] = w.groupby(["g", "o"])["cs"].transform("last")
    w["lg"] = w.groupby("g")["i"].shift(1)
    w = w.reset_index(drop=True)
    assert _eq(got[["rs"]], w[["rs"]])
    assert _eq(got[["lg"]], w[["lg"]])


def test_null_heavy_group_aggregates_vs_pandas(session, tmp_path):
    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "g": [f"g{v}" if v % 7 else None for v in rng.integers(0, 25, n)],
        "i": np.where(rng.random(n) < 0.1, None,
                      rng.integers(-50, 50, n).astype(object)),
    })
    tbl = pa.table({"g": df.g, "i": pa.array(df.i, type=pa.int64())})
    p = str(tmp_path / "nulls.parquet")
    pq.write_table(tbl, p)
    session.sql(f"CREATE EXTERNAL TABLE nt STORED AS PARQUET LOCATION '{p}'")
    got = session.sql("SELECT g, SUM(i) AS si, COUNT(i) AS ci, "
                      "COUNT(*) AS ca FROM nt GROUP BY g ORDER BY g"
                      ).to_pandas()
    pdf = tbl.to_pandas()
    w = pdf.dropna(subset=["g"]).groupby("g").agg(
        si=("i", "sum"), ci=("i", "count"), ca=("i", "size")).reset_index()
    nullg = pdf[pdf.g.isna()]
    w = pd.concat([w, pd.DataFrame(
        {"g": [None], "si": [nullg.i.sum()], "ci": [nullg.i.count()],
         "ca": [len(nullg)]})], ignore_index=True)
    assert _eq(got, w)


def test_null_both_sides_join_and_decorrelation_vs_pandas(session,
                                                          tmp_path):
    """NULLs on BOTH join sides (SQL: NULL matches nothing) and the
    decorrelated subquery shapes vs pandas oracles."""
    rng = np.random.default_rng(33)
    n, m = 2000, 400
    da = pd.DataFrame({
        "k": [int(v) if v % 7 else None for v in rng.integers(0, 40, n)],
        "x": rng.integers(0, 1000, n).astype(np.int64),
    })
    db = pd.DataFrame({
        "k": [int(v) if v % 5 else None for v in rng.integers(0, 50, m)],
        "y": rng.integers(0, 1000, m).astype(np.int64),
    })
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": pd.array(da["k"], dtype="Int64"),
                             "x": da["x"]}), pa_)
    pq.write_table(pa.table({"k": pd.array(db["k"], dtype="Int64"),
                             "y": db["y"]}), pb)
    session.sql(f"CREATE EXTERNAL TABLE na STORED AS PARQUET LOCATION '{pa_}'")
    session.sql(f"CREATE EXTERNAL TABLE nb STORED AS PARQUET LOCATION '{pb}'")

    # inner join count: pandas merge matches NaN==NaN, SQL must NOT — drop
    # nulls from the oracle frames first
    want = len(da.dropna(subset=["k"]).merge(db.dropna(subset=["k"]),
                                             on="k"))
    got = session.sql("SELECT COUNT(*) FROM na JOIN nb ON na.k = nb.k"
                      ).to_pandas().iloc[0, 0]
    assert got == want

    # correlated scalar agg vs oracle map
    r = session.sql("SELECT na.k AS k, na.x AS x, (SELECT MAX(nb.y) FROM "
                    "nb WHERE nb.k = na.k) AS m FROM na "
                    "ORDER BY x, k NULLS LAST").to_pandas()
    mx = db.dropna(subset=["k"]).groupby("k")["y"].max()
    want_m = [None if pd.isna(k) else mx.get(k) for k in r["k"]]
    got_m = [None if pd.isna(v) else v for v in r["m"]]
    want_m = [None if v is None or pd.isna(v) else int(v) for v in want_m]
    assert got_m == want_m

    # correlated EXISTS count vs oracle
    keys_b = set(db.dropna(subset=["k"])["k"])
    want_e = int(sum(1 for k in da["k"] if not pd.isna(k) and k in keys_b))
    got_e = session.sql("SELECT COUNT(*) FROM na WHERE EXISTS "
                        "(SELECT 1 FROM nb WHERE nb.k = na.k)"
                        ).to_pandas().iloc[0, 0]
    assert got_e == want_e
    got_ne = session.sql("SELECT COUNT(*) FROM na WHERE NOT EXISTS "
                         "(SELECT 1 FROM nb WHERE nb.k = na.k)"
                         ).to_pandas().iloc[0, 0]
    assert got_ne == len(da) - want_e
