"""End-to-end slice: FASTA scan → filter → count/collect.

Parity model: exon-benchmarks FASTACodonScan (src/main.rs:223-231) —
``read_fasta(path).filter(col("sequence").ilike("M%")).count()``.
"""

import numpy as np
import pytest

from exon_tpu import ExonSession, col, count, lit
from exon_tpu.formats.fasta import FastaOptions, decode_buffer


def test_decode_basic():
    data = b">a desc here\nACGT\nACGT\n>b\nTTTT\n"
    d = decode_buffer(data, FastaOptions())
    assert d.n == 2
    assert bytes(d.name_values[d.name_offsets[0]:d.name_offsets[1]]) == b"a"
    assert bytes(d.name_values[d.name_offsets[1]:d.name_offsets[2]]) == b"b"
    s0 = bytes(d.seq_values[d.seq_offsets[0]:d.seq_offsets[1]])
    assert s0 == b"ACGTACGT"
    s1 = bytes(d.seq_values[d.seq_offsets[1]:d.seq_offsets[2]])
    assert s1 == b"TTTT"
    assert d.desc_valid[0] and not d.desc_valid[1]


def test_decode_integer_dna():
    d = decode_buffer(b">x\nACGTN\n", FastaOptions(sequence_data_type="integer_encode_dna"))
    assert list(d.seq_values[:5]) == [1, 2, 3, 4, 5]


def test_decode_no_trailing_newline():
    d = decode_buffer(b">x\nACGT", FastaOptions())
    assert d.n == 1
    assert bytes(d.seq_values[:4]) == b"ACGT"


def test_read_fasta_count(session, tmp_fasta):
    df = session.read_fasta(tmp_fasta)
    assert df.count() == 3


def test_read_fasta_filter_ilike(session, tmp_fasta):
    df = session.read_fasta(tmp_fasta)
    assert df.filter(col("sequence").ilike("M%")).count() == 2
    assert df.filter(col("sequence").like("ACGT%")).count() == 1


def test_read_fasta_collect(session, tmp_fasta):
    table = session.read_fasta(tmp_fasta).collect_arrow()
    assert table.column("id").to_pylist() == ["seq1", "seq2", "seq3"]
    assert table.column("description").to_pylist() == [
        "first sequence", None, "third one"]
    assert table.column("sequence").to_pylist() == [
        "MKVLAC", "ACGTACGT", "MMMM"]


def test_read_fasta_project(session, tmp_fasta):
    t = session.read_fasta(tmp_fasta).select_columns("id").collect_arrow()
    assert t.column_names == ["id"]
    assert t.num_rows == 3


def test_filter_eq_and_udf(session, tmp_fasta):
    from exon_tpu.plan.expressions import FunctionCall

    df = session.read_fasta(tmp_fasta)
    assert df.filter(col("id") == lit("seq2")).count() == 1
    gc = df.select(FunctionCall("gc_content", [col("sequence")]).alias("gc"))
    vals = gc.collect_arrow().column("gc").to_pylist()
    assert vals[1] == pytest.approx(0.5)  # ACGTACGT


def test_aggregate_group_by(session, tmp_fasta):
    from exon_tpu import count

    df = session.read_fasta(tmp_fasta)
    from exon_tpu.plan.expressions import FunctionCall

    # group by length(sequence)
    out = df.aggregate(
        [FunctionCall("length", [col("sequence")]).alias("len")],
        [count().alias("n")],
    ).sort("len").collect_arrow()
    assert out.column("len").to_pylist() == [4, 6, 8]
    assert out.column("n").to_pylist() == [1, 1, 1]


def test_sort_and_limit(session, tmp_fasta):
    df = session.read_fasta(tmp_fasta).sort(("id", False)).limit(2)
    out = df.collect_arrow()
    assert out.column("id").to_pylist() == ["seq3", "seq2"]


def test_reference_fasta_parity(session, ref_data):
    """Row counts on real reference fixtures (read-only)."""
    path = ref_data("fasta", "test.fasta")
    df = session.read_fasta(path)
    n = df.count()
    # ground truth computed independently: number of '>' header lines
    with open(path, "rb") as f:
        data = f.read()
    expected = sum(1 for line in data.split(b"\n") if line.startswith(b">"))
    assert n == expected
