"""Random-query differential fuzz: generated SELECTs vs pandas oracles.

Bounded-depth random queries (filters with arithmetic/logic, 1-2 group
keys incl. NULLs, the five core aggregates, HAVING, ORDER BY) run against
the engine and an equivalent pandas evaluation on the same frame. Fixed
seed; failures print the SQL for reproduction.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    d = tmp_path_factory.mktemp("rq")
    rng = np.random.default_rng(99)
    n = 3000
    df = pd.DataFrame({
        "g": [f"g{v}" if v % 9 else None for v in rng.integers(0, 25, n)],
        "h": [int(v) if v % 7 else None for v in rng.integers(0, 12, n)],
        "x": rng.integers(-50, 50, n).astype(np.int64),
        "y": np.round(rng.normal(0, 10, n), 3),
    })
    p = str(d / "t.parquet")
    pq.write_table(pa.table({
        "g": df["g"], "h": pd.array(df["h"], dtype="Int64"),
        "x": df["x"], "y": df["y"]}), p)
    return p, df


_NUM = ["x", "y"]
_KEYS = ["g", "h"]
_AGGS = [("COUNT(*)", "size"), ("SUM(x)", ("x", "sum")),
         ("MIN(x)", ("x", "min")), ("MAX(y)", ("y", "max")),
         ("AVG(y)", ("y", "mean")), ("COUNT(y)", ("y", "count"))]


def _rand_pred(rng):
    """(sql, pandas_mask_fn) comparison / string predicate."""
    kind = rng.random()
    if kind < 0.25:
        # string predicate over the nullable key column (SQL: NULL rows
        # never match; pandas: fillna to a non-matching sentinel)
        v = int(rng.integers(0, 25))
        if rng.random() < 0.5:
            sql = f"g = 'g{v}'"

            def mask(df, v=v):
                return df["g"].fillna("\x00") == f"g{v}"
        else:
            sql = f"g LIKE 'g1%'"

            def mask(df):
                return df["g"].fillna("\x00").str.startswith("g1")
        return sql, mask
    c = _NUM[rng.integers(0, 2)]
    k = int(rng.integers(-30, 30))
    op = ["<", "<=", ">", ">=", "="][rng.integers(0, 5)]
    sql = f"{c} {op} {k}"
    py = {"<": "lt", "<=": "le", ">": "gt", ">=": "ge", "=": "eq"}[op]

    def mask(df):
        return getattr(df[c], py)(k)

    if rng.random() < 0.4:
        c2 = "x"
        k2 = int(rng.integers(-20, 20))
        sql = f"({sql} AND {c2} + {k2} > 0)" if rng.random() < 0.5 else \
            f"({sql} OR {c2} + {k2} > 0)"
        comb = np.logical_and if "AND" in sql else np.logical_or

        def mask(df, base=mask):  # noqa: B008
            return comb(base(df), (df[c2] + k2) > 0)

    return sql, mask


def _check(session, path, df, sql_where, mask_fn, keys, aggs, rng):
    cols = ", ".join(k for k in keys)
    agg_sql = ", ".join(f"{a} AS a{i}" for i, (a, _p) in enumerate(aggs))
    q = f"SELECT {cols}{', ' if cols else ''}{agg_sql} FROM rq"
    if sql_where:
        q += f" WHERE {sql_where}"
    if keys:
        q += f" GROUP BY {cols} ORDER BY " + \
            ", ".join(f"{k} NULLS LAST" for k in keys)
    got = session.sql(q).to_pandas()

    sub = df[mask_fn(df)] if sql_where else df
    if keys:
        grp = sub.groupby(keys, dropna=False)
        parts = {}
        for i, (_a, p) in enumerate(aggs):
            if p == "size":
                parts[f"a{i}"] = grp.size()
            else:
                col, fn = p
                parts[f"a{i}"] = getattr(grp[col], fn)()
        want = pd.DataFrame(parts).reset_index()
        want = want.sort_values(keys, na_position="last") \
            .reset_index(drop=True)
    else:
        row = {}
        for i, (_a, p) in enumerate(aggs):
            if p == "size":
                row[f"a{i}"] = len(sub)
            else:
                col, fn = p
                row[f"a{i}"] = getattr(sub[col], fn)() if len(sub) else \
                    (0 if fn == "count" else None)
        want = pd.DataFrame([row])
    assert len(got) == len(want), f"row count: {q}\n{got}\n{want}"
    for i in range(len(aggs)):
        a, b = got[f"a{i}"].tolist(), want[f"a{i}"].tolist()
        for x, w in zip(a, b):
            if pd.isna(w):
                assert pd.isna(x), f"{q}: a{i} {x} != NaN"
            else:
                assert abs(float(x) - float(w)) < 1e-6 * max(
                    1.0, abs(float(w))), f"{q}: a{i} {x} != {w}"


def test_random_grouped_aggregates_vs_pandas(session, table):
    path, df = table
    session.sql(f"CREATE EXTERNAL TABLE rq STORED AS PARQUET "
                f"LOCATION '{path}'")
    rng = np.random.default_rng(7)
    for trial in range(40):
        keys = list(np.array(_KEYS)[
            rng.permutation(2)[:int(rng.integers(0, 3))]])
        n_aggs = int(rng.integers(1, 4))
        aggs = [_AGGS[j] for j in rng.integers(0, len(_AGGS), n_aggs)]
        sql_where, mask_fn = (None, None)
        if rng.random() < 0.7:
            sql_where, mask_fn = _rand_pred(rng)
        _check(session, path, df, sql_where, mask_fn, keys, aggs, rng)


def test_random_queries_distributed_parity(table):
    """The same random query shapes run distributed over the 8-device
    mesh and must match the single-device engine exactly."""
    from exon_tpu import ExonSession
    from exon_tpu.config import new_exon_config

    path, _df = table
    single = ExonSession.new_exon()
    dist = ExonSession.with_config_exon(new_exon_config(distributed=True))
    for s in (single, dist):
        s.sql(f"CREATE EXTERNAL TABLE rq STORED AS PARQUET "
              f"LOCATION '{path}'")
    rng = np.random.default_rng(13)
    for trial in range(12):
        keys = list(np.array(_KEYS)[
            rng.permutation(2)[:int(rng.integers(0, 3))]])
        n_aggs = int(rng.integers(1, 4))
        aggs = [_AGGS[j] for j in rng.integers(0, len(_AGGS), n_aggs)]
        cols = ", ".join(keys)
        agg_sql = ", ".join(f"{a} AS a{i}" for i, (a, _p) in enumerate(aggs))
        q = f"SELECT {cols}{', ' if cols else ''}{agg_sql} FROM rq"
        if rng.random() < 0.7:
            q += f" WHERE {_rand_pred(rng)[0]}"
        if keys:
            q += f" GROUP BY {cols} ORDER BY " + \
                ", ".join(f"{k} NULLS LAST" for k in keys)
        a = single.sql(q).to_pandas()
        b = dist.sql(q).to_pandas()
        assert a.shape == b.shape, q
        for c in a.columns:
            for x, y in zip(a[c], b[c]):
                same = (x == y) or (pd.isna(x) and pd.isna(y)) or (
                    isinstance(x, (float, np.floating))
                    and abs(x - y) < 1e-9)
                assert same, f"{q}: {c} {x} != {y}"
