"""SAM + HMMDomTab decoder tests."""

import numpy as np
import pytest

from exon_tpu import ExonSession


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def test_sam_reference_fixture(ctx, ref_data):
    t = ctx.read_sam(ref_data("sam", "test.sam")).collect_arrow()
    row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
    assert row["name"] == "ref1_grp1_p001"
    assert row["flag"] == 99
    assert row["reference"] == "ref1"
    assert row["start"] == 1
    assert row["end"] == 10  # 10M cigar → start + 10 - 1
    assert row["mapping_quality"] == "0"
    assert row["cigar"] == "10M"
    assert row["mate_reference"] == "ref1"  # '=' resolved
    assert row["sequence"] == "CGAGCTCGGT"
    assert row["quality_score"] == [0] * 10


def test_sam_flag_udf(ctx, ref_data):
    from exon_tpu.plan.expressions import FunctionCall, col

    df = ctx.read_sam(ref_data("sam", "test.sam"))
    n = df.filter(FunctionCall("is_paired", [col("flag")])).count()
    assert n == 1  # flag 99 has 0x1 set


def test_cigar_spans():
    from exon_tpu.formats.sam import cigar_ref_spans

    data = b"10M 5S10M3D2I7N 76M"
    arr = np.frombuffer(data, np.uint8)
    starts = np.array([0, 4, 16])
    ends = np.array([3, 15, 19])
    spans = cigar_ref_spans(arr, starts, ends)
    assert list(spans) == [10, 10 + 3 + 7, 76]


def test_hmmdomtab_reference_fixture(ctx, ref_data):
    t = ctx.read_hmm_dom_tab(ref_data("hmmdomtab", "test.hmmdomtab")).collect_arrow()
    assert t.num_rows == 100
    assert t.column("target_name")[0].as_py() == "KanNP_rdsDRAFT_30000008001"
    assert t.column("tlen")[0].as_py() == 40
    assert t.column("evalue")[0].as_py() == pytest.approx(1.1e-09)
    assert t.column("accuracy")[0].as_py() == pytest.approx(0.97)


def test_hmmdomtab_sql(ctx, ref_data):
    path = ref_data("hmmdomtab", "test.hmmdomtab")
    n = ctx.sql(f"SELECT COUNT(*) FROM hmm_dom_tab_scan('{path}') "
                "WHERE evalue < 0.001").to_pandas().iloc[0, 0]
    t = ctx.read_hmm_dom_tab(path).collect_arrow()
    expect = sum(1 for v in t.column("evalue").to_pylist() if v < 0.001)
    assert n == expect
