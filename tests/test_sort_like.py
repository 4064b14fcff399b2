"""Regression tests for exact string ORDER BY and general LIKE
(round-1 VERDICT.md "What's weak" #1/#2)."""

import os

import pytest

from exon_tpu import ExonSession


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    d = tmp_path_factory.mktemp("sortlike")
    p = os.path.join(d, "t.fasta")
    with open(p, "w") as f:
        f.write(">AAAAAAAAZ d\nACGT\n>AAAAAAAAB d\nAC\n>AAAAAAAAM d\nGG\n"
                ">AAAAAAAA d\nTT\n>ab x\nTT\n>axc foo\nCC\n>abc bar\nAA\n")
    return p


def _ids(ctx, sql):
    return ctx.sql(sql).collect_arrow().column(0).to_pylist()


def test_order_by_long_shared_prefix(ctx, fasta):
    # differs only at byte 9 — beyond the old 8-byte prefix key
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id LIKE 'AAAA%' ORDER BY id")
    assert got == ["AAAAAAAA", "AAAAAAAAB", "AAAAAAAAM", "AAAAAAAAZ"]


def test_order_by_desc_and_shorter_first(ctx, fasta):
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id LIKE 'AAAA%' ORDER BY id DESC")
    assert got == ["AAAAAAAAZ", "AAAAAAAAM", "AAAAAAAAB", "AAAAAAAA"]


def test_like_underscore(ctx, fasta):
    assert _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                     "WHERE id LIKE 'a_'") == ["ab"]


def test_like_underscore_percent(ctx, fasta):
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id LIKE 'a_c%' ORDER BY id")
    assert got == ["abc", "axc"]


def test_like_multi_percent(ctx, fasta):
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id LIKE 'A%B%' ORDER BY id")
    assert got == ["AAAAAAAAB"]


def test_like_middle_chunks(ctx, fasta):
    # greedy middle-chunk search: a...b...c with gaps
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id LIKE 'a%b%c' ORDER BY id")
    assert got == ["abc"]


def test_like_anchored_overlap_is_false(ctx, fasta):
    # 'a%bc' must not let prefix and suffix overlap on 'abc'? they don't
    # overlap here ('a'+'bc' fits len 3) — but 'ab%bc' on 'abc' must be false
    assert _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                     "WHERE id LIKE 'ab%bc'") == []


def test_ilike_underscore(ctx, fasta):
    got = _ids(ctx, f"SELECT id FROM fasta_scan('{fasta}') "
                    "WHERE id ILIKE 'A_C%' ORDER BY id")
    assert got == ["abc", "axc"]


def test_prefix_like_pushdown_exact(session, tmp_path):
    """Prefix [I]LIKE predicates push into the scan as exact decode-time
    filters (FileTable supports_filter_pushdown); results match unpushed
    evaluation including NULLs, case rules, and NOT LIKE (kept residual)."""
    p = tmp_path / "mix.fasta"
    p.write_text(
        ">r1 alpha\nATGGC\n>r2 beta\natgcc\n>r3 Alpha\nCCATG\n"
        ">r4\nATG\n>r5 gamma\nTTT\n")
    path = str(p)
    q = lambda sql: session.sql(sql).to_pandas()

    t = q(f"SELECT id FROM fasta_scan('{path}') WHERE sequence LIKE 'ATG%'")
    assert t["id"].tolist() == ["r1", "r4"]
    t = q(f"SELECT id FROM fasta_scan('{path}') WHERE sequence ILIKE 'atg%'")
    assert t["id"].tolist() == ["r1", "r2", "r4"]
    # description is NULL for r4: LIKE over NULL is NULL -> dropped
    t = q(f"SELECT id FROM fasta_scan('{path}') WHERE description LIKE '%'")
    assert t["id"].tolist() == ["r1", "r2", "r3", "r5"]
    t = q(f"SELECT id FROM fasta_scan('{path}') "
          "WHERE description ILIKE 'alpha%'")
    assert t["id"].tolist() == ["r1", "r3"]
    # NOT LIKE stays residual but still exact
    t = q(f"SELECT id FROM fasta_scan('{path}') "
          "WHERE sequence NOT LIKE 'ATG%'")
    assert t["id"].tolist() == ["r2", "r3", "r5"]
    # combined with a non-pushable predicate
    t = q(f"SELECT id FROM fasta_scan('{path}') "
          "WHERE sequence LIKE 'ATG%' AND length(sequence) > 3")
    assert t["id"].tolist() == ["r1"]
    # COUNT fast path over the pushed filter
    t = q(f"SELECT COUNT(*) FROM fasta_scan('{path}') "
          "WHERE sequence ILIKE 'atg%'")
    assert t.iloc[0, 0] == 3


def test_float_null_ordering_no_sentinel_collision(session):
    """NULL ordering must not use a sentinel value: the bitcast key of any
    double >= 2.0 exceeds 2^62, so sentinel-nulls sorted mid-sequence.
    Validity is its own sort-key column now."""
    session.sql("CREATE TABLE fn (x DOUBLE)")
    session.sql("INSERT INTO fn VALUES (1.0), (NULL), (3.0), (2.5)")
    import pandas as pd

    got = session.sql("SELECT x FROM fn ORDER BY x").to_pandas()["x"].tolist()
    assert got[:3] == [1.0, 2.5, 3.0] and pd.isna(got[3])
    got = session.sql("SELECT x FROM fn ORDER BY x DESC"
                      ).to_pandas()["x"].tolist()
    assert pd.isna(got[0]) and got[1:] == [3.0, 2.5, 1.0]
    # window order keys share the fix
    session.sql("CREATE TABLE fw (g INT, o DOUBLE, v INT)")
    session.sql("INSERT INTO fw VALUES (1,5.5,1),(1,NULL,2),(1,0.5,3),"
                "(1,2.5,4)")
    t = session.sql("SELECT v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY o)"
                    " AS r FROM fw ORDER BY r").to_pandas()
    assert t["v"].tolist() == [3, 4, 1, 2]


def test_nulls_first_last_clauses(session):
    import pandas as pd

    session.sql("CREATE TABLE nf2 (x DOUBLE, s VARCHAR)")
    session.sql("INSERT INTO nf2 VALUES (1.0,'a'), (NULL,'b'), (3.0,NULL), "
                "(2.5,'c')")

    def col(q, c="x"):
        return session.sql(q).to_pandas()[c].tolist()

    got = col("SELECT x FROM nf2 ORDER BY x ASC NULLS FIRST")
    assert pd.isna(got[0]) and got[1:] == [1.0, 2.5, 3.0]
    got = col("SELECT x FROM nf2 ORDER BY x DESC NULLS LAST")
    assert got[:3] == [3.0, 2.5, 1.0] and pd.isna(got[3])
    got = col("SELECT s FROM nf2 ORDER BY s NULLS FIRST", "s")
    assert pd.isna(got[0]) and got[1:] == ["a", "b", "c"]
    t = session.sql("SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC "
                    "NULLS LAST) AS r FROM nf2 ORDER BY r").to_pandas()
    assert t["x"].tolist()[:3] == [3.0, 2.5, 1.0] and pd.isna(t["x"][3])


@pytest.fixture(scope="module")
def esc_fasta(tmp_path_factory):
    # ids with literal '%', '_', and '!' characters for ESCAPE tests
    d = tmp_path_factory.mktemp("likeesc")
    p = os.path.join(d, "e.fasta")
    with open(p, "w") as f:
        f.write(">a_b d\nAC\n>axb d\nAC\n>100% d\nGG\n>100x d\nGG\n"
                ">x%yz d\nTT\n>xAyz d\nTT\n>!bang d\nCC\n>_under d\nCC\n")
    return p


def _esc(ctx, esc_fasta, pred):
    return _ids(ctx, f"SELECT id FROM fasta_scan('{esc_fasta}') "
                     f"WHERE {pred} ORDER BY id")


def test_like_escape_underscore_literal(ctx, esc_fasta):
    assert _esc(ctx, esc_fasta, "id LIKE 'a!_b' ESCAPE '!'") == ["a_b"]


def test_like_escape_percent_literal(ctx, esc_fasta):
    assert _esc(ctx, esc_fasta, "id LIKE '100!%' ESCAPE '!'") == ["100%"]


def test_like_escape_prefix_then_wild(ctx, esc_fasta):
    # literal '%' at position 2, then anything
    assert _esc(ctx, esc_fasta, "id LIKE 'x!%%' ESCAPE '!'") == ["x%yz"]


def test_like_escaped_escape_char(ctx, esc_fasta):
    assert _esc(ctx, esc_fasta, "id LIKE '!!%' ESCAPE '!'") == ["!bang"]


def test_like_escape_mixed_general(ctx, esc_fasta):
    # '_' stays a wildcard when not escaped, '%' escaped mid-pattern
    got = _esc(ctx, esc_fasta, "id LIKE 'x_yz' ESCAPE '!'")
    assert got == ["x%yz", "xAyz"]


def test_not_like_escape(ctx, esc_fasta):
    got = _esc(ctx, esc_fasta, "id NOT LIKE '!_%' ESCAPE '!'")
    assert "_under" not in got and len(got) == 7


def test_ilike_escape(ctx, esc_fasta):
    assert _esc(ctx, esc_fasta, "id ILIKE 'X!%YZ' ESCAPE '!'") == ["x%yz"]


def test_like_escape_backslash_default_none(ctx, esc_fasta):
    # without ESCAPE, '!' is an ordinary character: '!%' = starts with '!'
    assert _esc(ctx, esc_fasta, "id LIKE '!%'") == ["!bang"]
    assert _esc(ctx, esc_fasta, "id LIKE '!!%'") == []
