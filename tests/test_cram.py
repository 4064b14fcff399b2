"""CRAM decode — parity with exon-cram
(tests/sqllogictests/slt/cram-select-tests.slt and
exon_context_ext.rs test_cram_file)."""

import pytest


def _rows(df):
    t = df.collect_arrow()
    return t.to_pylist()


def test_cram_count_and_first_record(session, ref_data):
    path = ref_data("cram", "test_input_1_a.cram")
    assert session.read_cram(path).count() == 15
    session.sql(
        f"CREATE EXTERNAL TABLE cram STORED AS CRAM LOCATION '{path}'")
    rows = _rows(session.sql(
        'SELECT name, flag, reference, start, "end", mapping_quality, '
        "cigar, mate_reference, tags FROM cram LIMIT 1"))
    r = rows[0]
    assert r["name"] == "r000"
    assert r["flag"] == 99
    assert r["reference"] == "insert"
    assert r["start"] == 50
    assert r["end"] == 59
    assert r["mapping_quality"] == "30"
    assert r["cigar"] == "10M"
    assert r["mate_reference"] == "insert"
    assert r["tags"] == [{"tag": "PG", "value": "bull"}]


def test_cram_parse_tags_struct(session, ref_data):
    path = ref_data("cram", "test_input_1_a.cram")
    session.sql("SET exon.cram_parse_tags = true")
    session.sql(
        f"CREATE EXTERNAL TABLE cram STORED AS CRAM LOCATION '{path}'")
    rows = _rows(session.sql("SELECT tags FROM cram LIMIT 1"))
    assert rows[0]["tags"] == {"PG": "bull"}
    session.sql("SET exon.cram_parse_tags = false")


def test_cram_with_reference(session, ref_data):
    path = ref_data("cram", "0500_mapped.cram")
    ref = ref_data("cram", "ce.fa")
    session.sql("CREATE EXTERNAL TABLE cram STORED AS CRAM OPTIONS "
                f"(fasta_reference '{ref}') LOCATION '{path}'")
    rows = _rows(session.sql(
        'SELECT name, flag, reference, start, "end" FROM cram LIMIT 1'))
    assert rows[0] == {"name": "match", "flag": 99,
                       "reference": "CHROMOSOME_I", "start": 1000,
                       "end": 1099}


def test_cram_missing_reference_errors(session, ref_data):
    path = ref_data("cram", "0500_mapped.cram")
    session.sql("CREATE EXTERNAL TABLE cram STORED AS CRAM OPTIONS "
                f"(fasta_reference '/does/not/exist') LOCATION '{path}'")
    with pytest.raises(Exception):
        session.sql("SELECT * FROM cram").collect_arrow()


def test_cram_indexed_region_query(session, ref_data):
    path = ref_data("two-cram", "twolib.sorted.cram")
    ref = ref_data("two-cram", "rand1k.fa")
    assert session.read_cram(path, fasta_reference=ref).count() == 4
    session.sql("CREATE EXTERNAL TABLE cram STORED AS CRAM OPTIONS "
                f"(fasta_reference '{ref}', indexed 'true') "
                f"LOCATION '{path}'")
    rows = _rows(session.sql(
        "SELECT * FROM cram WHERE cram_region_filter('rand1k', reference) "
        "= true LIMIT 1"))
    r = rows[0]
    assert r["name"] == "read1-1"
    assert r["flag"] == 0
    assert r["reference"] == "rand1k"
    assert r["start"] == 1
    assert r["end"] == 60
    assert r["mapping_quality"] == "60"
    assert r["cigar"] == "60M"
    assert r["mate_reference"] is None
    assert r["sequence"] == ("TCCTAATTCTGGGTAACCGCCGCCTGAAGCCAAAAAATAAGCC"
                             "GGAGCCAAGGGGGAGTC")
    assert r["quality_score"] == []
    assert r["tags"] == [{"tag": "AS", "value": "60"},
                         {"tag": "XS", "value": "0"}]


def test_cram_multislice(session, ref_data):
    # 1404_index_multislice has no external reference requirement for
    # unmapped-style records; counts all records across slices
    path = ref_data("cram", "1404_index_multislice.cram")
    ref = ref_data("cram", "ce.fa")
    assert session.read_cram(path, fasta_reference=ref).count() == 910
