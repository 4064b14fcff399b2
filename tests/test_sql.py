"""SQL frontend tests (parser + execution over reference fixtures)."""

import pytest

from exon_tpu import ExonSession
from exon_tpu.errors import SqlError


@pytest.fixture()
def ctx(ref_data):
    c = ExonSession.new_exon()
    base = "/root/reference/exon/exon-core/test-data/datasources"
    c.sql(f"CREATE EXTERNAL TABLE gff STORED AS GFF LOCATION '{base}/gff/test.gff'")
    c.sql(f"CREATE EXTERNAL TABLE vcf STORED AS VCF LOCATION '{base}/vcf/index.vcf.gz'")
    c.sql(f"CREATE EXTERNAL TABLE fasta STORED AS FASTA LOCATION '{base}/fasta/test.fasta'")
    return c


def test_select_literal(ctx):
    assert ctx.sql("SELECT 1;").to_pandas().iloc[0, 0] == 1
    assert ctx.sql("SELECT 2 + 3 AS x").to_pandas()["x"][0] == 5


def test_count_star(ctx):
    assert ctx.sql("SELECT COUNT(*) FROM gff").to_pandas().iloc[0, 0] == 5000


def test_group_by_order_limit(ctx):
    df = ctx.sql("SELECT seqname, COUNT(*) AS n FROM gff "
                 "GROUP BY seqname ORDER BY n DESC LIMIT 1").to_pandas()
    assert df["seqname"][0] == "sq0"
    assert df["n"][0] == 2513


def test_where_projection(ctx):
    df = ctx.sql('SELECT seqname, start FROM gff WHERE start >= 8 LIMIT 2').to_pandas()
    assert list(df.columns) == ["seqname", "start"]
    assert len(df) == 2


def test_region_filter_sql(ctx):
    df = ctx.sql("SELECT COUNT(*) AS cnt FROM vcf "
                 "WHERE vcf_region_filter('10', chrom, pos)").to_pandas()
    assert df["cnt"][0] == 211


def test_udtf(ctx):
    df = ctx.sql("SELECT id FROM fasta_scan("
                 "'/root/reference/exon/exon-core/test-data/datasources/fasta/test.fasta')"
                 " ORDER BY id").to_pandas()
    assert list(df["id"]) == ["a", "b"]


def test_show_and_describe(ctx):
    tables = ctx.sql("SHOW TABLES").to_pandas()["table_name"].tolist()
    assert "gff" in tables and "vcf" in tables
    d = ctx.sql("DESCRIBE vcf").to_pandas()
    assert "chrom" in d["column_name"].tolist()


def test_set_option(ctx):
    ctx.sql("SET exon.vcf_parse_info = true")
    assert ctx.config.vcf_parse_info is True


def test_drop_table(ctx):
    ctx.sql("DROP TABLE gff")
    with pytest.raises(Exception):
        ctx.sql("SELECT COUNT(*) FROM gff")


def test_subquery_and_alias(ctx):
    df = ctx.sql("SELECT n FROM (SELECT COUNT(*) AS n FROM gff) t").to_pandas()
    assert df["n"][0] == 5000


def test_distinct(ctx):
    df = ctx.sql("SELECT DISTINCT seqname FROM gff ORDER BY seqname").to_pandas()
    assert list(df["seqname"]) == ["sq0", "sq1"]


def test_between_and_in(ctx):
    n = ctx.sql("SELECT COUNT(*) FROM gff WHERE start BETWEEN 1 AND 100 "
                "AND seqname IN ('sq0')").to_pandas().iloc[0, 0]
    assert n == 2513


def test_parse_error(ctx):
    with pytest.raises(SqlError):
        ctx.sql("SELEC 1")


def test_explain(ctx):
    df = ctx.sql("EXPLAIN SELECT COUNT(*) FROM gff").to_pandas()
    assert "Aggregate" in df["plan"][0]
