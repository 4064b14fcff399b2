"""BAM decoder + .bai region query tests."""

import pytest

from exon_tpu import ExonSession, col
from exon_tpu.plan.expressions import FunctionCall, lit


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def marker(region):
    return FunctionCall("bam_region_filter",
                        [lit(region), col("reference"), col("start"), col("end")])


def test_bam_decode(ctx, ref_data):
    t = ctx.read_bam(ref_data("bam", "test.bam")).collect_arrow()
    assert t.num_rows == 61
    row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
    assert row["name"] == "READ_ID"
    assert row["flag"] == 83
    assert row["reference"] == "chr1"
    assert row["start"] == 12203704
    assert row["cigar"] == "55M13394N21M"
    assert row["end"] == 12203704 + 55 + 13394 + 21 - 1
    assert row["mapping_quality"] is None  # 255 in file
    assert len(row["sequence"]) == len(row["quality_score"])


def test_bam_region_parity(ctx, ref_data):
    path = ref_data("bam", "test.bam")
    t = ctx.read_bam(path).collect_arrow()
    refs = t.column("reference").to_pylist()
    ss = t.column("start").to_pylist()
    ee = t.column("end").to_pylist()

    def gt(name, lo, hi):
        return sum(1 for r, s, e in zip(refs, ss, ee)
                   if r == name and s is not None and s <= hi and e >= lo)

    for reg, (nm, lo, hi) in [
        ("chr1:12203704-12217173", ("chr1", 12203704, 12217173)),
        ("chr1", ("chr1", 1, 10 ** 9)),
        ("chr2:1-300000000", ("chr2", 1, 300000000)),
    ]:
        n = ctx.read_bam(path).filter(marker(reg)).count()
        assert n == gt(nm, lo, hi), reg


def test_bam_sql_udtf(ctx, ref_data):
    path = ref_data("bam", "test.bam")
    n = ctx.sql(f"SELECT COUNT(*) FROM bam_scan('{path}')").to_pandas().iloc[0, 0]
    assert n == 61
