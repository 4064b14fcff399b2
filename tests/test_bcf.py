"""BCF decoder + .csi region query tests."""

import pytest

from exon_tpu import ExonSession
from exon_tpu.io.indexes import Region


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def test_bcf_decode_matches_vcf(ctx, ref_data):
    tb = ctx.read_bcf(ref_data("bcf", "index.bcf")).collect_arrow()
    tv = ctx.read_vcf(ref_data("vcf", "index.vcf")).collect_arrow()
    assert tb.num_rows == 621
    assert tb.column("pos").to_pylist() == tv.column("pos").to_pylist()
    assert tb.column("chrom").to_pylist() == tv.column("chrom").to_pylist()
    assert tb.column("ref").to_pylist() == tv.column("ref").to_pylist()
    assert tb.column("info").to_pylist() == tv.column("info").to_pylist()
    # formats identical modulo one fixture difference in record 0
    fb = tb.column("formats").to_pylist()
    fv = tv.column("formats").to_pylist()
    assert sum(1 for a, b in zip(fb, fv) if a == b) >= 620


def test_bcf_region_query(ctx, ref_data):
    # reference asserts 191 rows for region '1' (exon_context_ext.rs:1087)
    path = ref_data("bcf", "index.bcf")
    assert ctx.read_bcf(path, regions=[Region.parse("1")]).count() == 191
    assert ctx.read_bcf(path, regions=[Region.parse("1:9999919-9999919")]).count() == 1
    assert ctx.read_bcf(path, regions=[Region.parse("17")]).count() == 0


def test_bcf_sql_udtf(ctx, ref_data):
    path = ref_data("bcf", "index.bcf")
    n = ctx.sql(f"SELECT COUNT(*) FROM bcf_scan('{path}')").to_pandas().iloc[0, 0]
    assert n == 621
