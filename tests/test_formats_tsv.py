"""GFF/GTF/BED/FASTQ decoder tests against reference fixtures."""

import numpy as np
import pytest

from exon_tpu import ExonSession, col, count


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def test_gff_reference_fixture(ctx, ref_data):
    t = ctx.read_gff(ref_data("gff", "test.gff")).collect_arrow()
    assert t.num_rows == 5000
    row = {k: v[0] for k, v in t.slice(0, 1).to_pydict().items()}
    assert row["seqname"] == "sq0"
    assert row["type"] == "gene"
    assert row["start"] == 8 and row["end"] == 13
    assert row["score"] is None and row["phase"] is None
    assert row["strand"] == "+"
    assert dict(row["attributes"]) == {"gene_id": ["caat1"], "gene_name": ["gene0"]}


def test_gff_aggregate(ctx, ref_data):
    out = ctx.read_gff(ref_data("gff", "test.gff")).aggregate(
        ["seqname"], [count().alias("n")]).sort("seqname").collect_arrow()
    assert sum(out.column("n").to_pylist()) == 5000


def test_gtf_reference_fixture(ctx, ref_data):
    t = ctx.read_gtf(ref_data("gtf", "test.gtf")).collect_arrow()
    assert t.num_rows == 77
    attrs = dict(t.column("attributes")[0].as_py())
    assert attrs["gene_id"] == ["ENSG00000223972"]
    assert attrs["gene_name"] == ["DDX11L1"]


def test_bed_reference_fixture(ctx, ref_data):
    t = ctx.read_bed(ref_data("bed", "test.bed"), n_fields=6).collect_arrow()
    assert t.num_rows == 10
    assert t.column_names == ["reference_sequence_name", "start", "end",
                              "name", "score", "strand"]
    assert t.column("start")[0].as_py() == 11873


def test_bed_filter_interval(ctx, ref_data):
    df = ctx.read_bed(ref_data("bed", "test.bed"), n_fields=6)
    n = df.filter((col("start") >= 12000) & (col("end") <= 70000)).count()
    t = df.collect_arrow()
    expect = sum(1 for s, e in zip(t.column("start").to_pylist(),
                                   t.column("end").to_pylist())
                 if s >= 12000 and e <= 70000)
    assert n == expect


def test_fastq_reference_fixture(ctx, ref_data):
    t = ctx.read_fastq(ref_data("fastq", "test.fastq")).collect_arrow()
    assert t.num_rows == 2
    assert t.column("name")[0].as_py() == "SEQ_ID"
    assert t.column("description")[0].as_py() == "This is a description"
    assert t.column("description")[1].as_py() is None
    assert t.column("sequence")[0].as_py().startswith("GATTTGGGGT")
    assert t.column("quality_scores")[0].as_py().startswith("!''*((((")


def test_fastq_device_matches_host(ctx, ref_data):
    import os

    path = ref_data("fastq", "test.fastq")
    t1 = ctx.read_fastq(path).collect_arrow()
    os.environ["EXON_TPU_HOST_DECODE"] = "1"
    try:
        t2 = ctx.read_fastq(path).collect_arrow()
    finally:
        del os.environ["EXON_TPU_HOST_DECODE"]
    assert t1.equals(t2)


def test_gff_projection(ctx, ref_data):
    t = ctx.read_gff(ref_data("gff", "test.gff")).select_columns(
        "seqname", "start").collect_arrow()
    assert t.column_names == ["seqname", "start"]
