"""VCF decode, tabix region pushdown, BGZF, and Region/FAI unit tests."""

import numpy as np
import pytest

from exon_tpu import ExonSession, col, count
from exon_tpu.io import bgzf
from exon_tpu.io.indexes import (FaiRecord, Region, compute_fai_range,
                                 parse_tabix, reg2bins)
from exon_tpu.plan.expressions import FunctionCall, lit


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def marker(region):
    return FunctionCall("vcf_region_filter", [lit(region), col("chrom"), col("pos")])


def test_vcf_decode_reference(ctx, ref_data):
    t = ctx.read_vcf(ref_data("vcf", "index.vcf")).collect_arrow()
    assert t.num_rows == 621
    row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
    assert row["chrom"] == "1"
    assert row["pos"] == 9999919
    assert row["id"] is None
    assert row["alt"] == ["<*>"]
    assert row["info"].startswith("DP=1;")
    assert row["formats"] == "GT:PL:PG\t0/0:0,3,26:0"


def test_vcf_region_query_parity(ctx, ref_data):
    gz = ref_data("vcf", "index.vcf.gz")
    plain = ctx.read_vcf(ref_data("vcf", "index.vcf")).collect_arrow()
    chroms = plain.column("chrom").to_pylist()
    poss = plain.column("pos").to_pylist()
    for region, pred in [
        ("1:9999921-10000120", lambda c, p: c == "1" and 9999921 <= p <= 10000120),
        ("10", lambda c, p: c == "10"),
        ("2:1-10004000", lambda c, p: c == "2" and p <= 10004000),
        ("17", lambda c, p: c == "17"),  # absent contig → 0 rows
    ]:
        n = ctx.read_vcf(gz).filter(marker(region)).count()
        expect = sum(1 for c, p in zip(chroms, poss) if pred(c, p))
        assert n == expect, region


def test_vcf_multifile_region(ctx, ref_data):
    d = ref_data("two-vcf")
    n = ctx.read_vcf(d).filter(marker("1")).count()
    single = ctx.read_vcf(ref_data("vcf", "index.vcf.gz")).filter(marker("1")).count()
    assert n == 2 * single  # the two files are copies of index.vcf


def test_region_parse():
    r = Region.parse("chr1:1,000-2,000")
    assert (r.name, r.start, r.end) == ("chr1", 1000, 2000)
    assert Region.parse("MT").start is None
    assert str(Region.parse("1:5-10")) == "1:5-10"
    from exon_tpu.errors import InvalidRegionError

    with pytest.raises(InvalidRegionError):
        Region.parse("chr1:200-100")


def test_region_intersects():
    r = Region("1", 100, 200)
    assert r.intersects(100, 100)
    assert r.intersects(50, 100)
    assert r.intersects(200, 300)
    assert not r.intersects(201, 300)
    assert not r.intersects(1, 99)


def test_reg2bins_small():
    bins = reg2bins(0, 1)
    assert bins[0] == 0 and 4681 in bins
    # clamps huge intervals
    assert len(reg2bins(0, 1 << 60)) < 40000


def test_fai_range():
    # 60-base lines, 61-byte width
    rec = FaiRecord("chr1", 300, 6, 60, 61)
    s, e = compute_fai_range(rec, Region("chr1", 1, 60))
    assert (s, e) == (6, 66)
    s, e = compute_fai_range(rec, Region("chr1", 61, 120))
    assert (s, e) == (67, 127)


def test_bgzf_roundtrip():
    data = b"hello bgzf world\n" * 5000
    comp = bgzf.compress_bgzf(data)
    assert bgzf.decompress_all(comp) == data
    blk = bgzf.read_block(comp, 0)
    assert blk.data == data[: len(blk.data)]
    # virtual-position range
    text = bgzf.decompress_range(comp, bgzf.make_vpos(0, 5),
                                 bgzf.make_vpos(0, 16))
    assert text == data[5:16]


def test_tabix_parse_reference(ref_data):
    import pathlib

    tbi_path = ref_data("vcf", "index.vcf.gz.tbi")
    tbi = parse_tabix(pathlib.Path(tbi_path).read_bytes())
    assert "1" in tbi.names and "10" in tbi.names
    chunks = tbi.query(Region("1", 9999900, 10000200))
    assert chunks, "expected at least one chunk for populated region"
