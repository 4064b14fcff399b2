"""mzML / GenBank / SDF / FCS decoder tests."""

import os
import struct

import numpy as np
import pytest

from exon_tpu import ExonSession


@pytest.fixture(scope="module")
def ctx():
    return ExonSession.new_exon()


def test_mzml_count_and_fields(ctx, ref_data):
    t = ctx.read_mzml(ref_data("mzml", "test.mzML")).collect_arrow()
    assert t.num_rows == 2
    assert t.column("precursor_mz")[0].as_py() == pytest.approx(643.0343966)
    # compressed variants decode identically
    t_gz = ctx.read_mzml(ref_data("mzml", "test.mzML.gz")).collect_arrow()
    assert t_gz.num_rows == 2


def test_genbank_fields(ctx, ref_data):
    t = ctx.read_genbank(ref_data("genbank", "test.gb")).collect_arrow()
    assert t.num_rows == 1
    assert t.column("name")[0].as_py() == "BGC0002746"
    assert t.column("accession")[0].as_py() == "BGC0002746"
    assert t.column("topology")[0].as_py() == "linear"
    assert len(t.column("sequence")[0].as_py()) == 38658
    feats = t.column("features")[0].as_py()
    assert feats[0]["kind"] == "subregion"
    quals = {q["keys"]: q["values"] for q in feats[0]["qualifiers"]}
    assert quals["aStool"] == "mibig"


def test_sdf_count_benchmark_parity(ctx, ref_data):
    # reference asserts 6512 rows (exon_context_ext.rs:751)
    n = ctx.read_sdf(ref_data("sdf", "tox_benchmark_N6512.sdf.gz")).count()
    assert n == 6512


def test_sdf_data_struct(ctx, ref_data):
    t = ctx.read_sdf(ref_data("sdf", "tox_benchmark_N6512.sdf.gz")).limit(3).collect_arrow()
    d = t.column("data")[0].as_py()
    assert "CAS_NO" in d and d["CAS_NO"] == "2475-33-4"
    assert t.column("atom_count")[0].as_py() == 50
    assert t.column("bond_count")[0].as_py() == 60


def _make_fcs(tmp_path, n_events=100, channels=("FSC-A", "SSC-A", "FL1-A")):
    rng = np.random.default_rng(0)
    mat = rng.random((n_events, len(channels))).astype("<f4")
    text_parts = [f"$PAR/{len(channels)}", f"$TOT/{n_events}",
                  "$DATATYPE/F", "$BYTEORD/1,2,3,4", "$MODE/L"]
    for i, c in enumerate(channels):
        text_parts.append(f"$P{i + 1}N/{c}")
    text = "/" + "/".join(p.replace("/", "/", 1) for p in
                          [p.replace("/", "/") for p in text_parts]) + "/"
    # build TEXT segment with '/' delimiter: /key/value/key/value/
    kvs = []
    for p in text_parts:
        k, v = p.split("/", 1)
        kvs.extend([k, v])
    text = "/" + "/".join(kvs) + "/"
    header_len = 58
    text_start = header_len
    text_end = text_start + len(text) - 1
    data_start = text_end + 1
    data_end = data_start + mat.nbytes - 1
    header = (b"FCS3.0    " +
              f"{text_start:>8}{text_end:>8}{data_start:>8}{data_end:>8}".encode() +
              b" " * (header_len - 42))
    payload = header[:58] + text.encode() + mat.tobytes()
    p = tmp_path / "test.fcs"
    p.write_bytes(payload)
    return str(p), mat


def test_fcs_synthetic(ctx, tmp_path):
    path, mat = _make_fcs(tmp_path)
    t = ctx.read_fcs(path).collect_arrow()
    assert t.column_names == ["FSC-A", "SSC-A", "FL1-A"]
    assert t.num_rows == 100
    np.testing.assert_allclose(np.asarray(t.column("FSC-A")), mat[:, 0],
                               rtol=1e-6)


def test_read_inferred(ctx, ref_data):
    df = ctx.read_inferred_exon_table(ref_data("gff", "test.gff"))
    assert df.count() == 5000


def test_bz2_xz_compression_roundtrip(tmp_path):
    """Reference parity: exon_file_type.rs:185-212 infers .bz2/.xz."""
    import bz2 as _bz2
    import lzma as _lzma

    from exon_tpu import ExonSession

    content = b">a desc\nACGT\n>b\nGGGT\n"
    for ext, compress in ((".bz2", _bz2.compress), (".xz", _lzma.compress)):
        p = tmp_path / f"t.fasta{ext}"
        p.write_bytes(compress(content))
        ctx = ExonSession.new_exon()
        df = ctx.read_fasta(str(p))
        out = df.collect_arrow().to_pydict()
        assert out["id"] == ["a", "b"]
        assert out["sequence"] == ["ACGT", "GGGT"]


def test_copy_to_bz2_xz_roundtrip(tmp_path):
    from exon_tpu import ExonSession

    src = tmp_path / "in.fasta"
    src.write_text(">x d1\nAACC\n>y d2\nTTGG\n")
    ctx = ExonSession.new_exon()
    for ext in (".bz2", ".xz"):
        dst = tmp_path / f"out.fasta{ext}"
        ctx.sql(f"COPY (SELECT * FROM fasta_scan('{src}')) "
                f"TO '{dst}' STORED AS FASTA").collect_arrow()
        out = ctx.read_fasta(str(dst)).collect_arrow().to_pydict()
        assert out["id"] == ["x", "y"]
        assert out["sequence"] == ["AACC", "TTGG"]


def test_decoder_edge_cases(session, tmp_path):
    """CRLF line endings, missing trailing newline, multiline sequences,
    blank/comment lines, and '.'-valued optional VCF fields all decode
    exactly (noodles tolerates the same inputs)."""
    def w(name, content):
        p = tmp_path / name
        p.write_text(content)
        return str(p)

    p = w("a.fasta", ">x desc one\r\nACGT\r\nTTAA\r\n>y\r\nGG")
    t = session.sql(f"SELECT id, description, sequence "
                    f"FROM fasta_scan('{p}')").to_pandas()
    assert t["sequence"].tolist() == ["ACGTTTAA", "GG"]
    assert t["description"].tolist()[0] == "desc one"

    p = w("b.fastq", "@r1 d\r\nACGT\r\n+\r\nIIII\r\n@r2\r\nTT\r\n+\r\n!!\r\n")
    t = session.sql(f"SELECT name, sequence, quality_scores "
                    f"FROM fastq_scan('{p}')").to_pandas()
    assert t["sequence"].tolist() == ["ACGT", "TT"]
    assert t["quality_scores"].tolist() == ["IIII", "!!"]

    p = w("c.gff", "##gff-version 3\nchr1\ts\tgene\t1\t10\t.\t+\t.\tID=a\n"
          "\n# mid comment\nchr2\ts\tgene\t5\t9\t.\t-\t.\tID=b")
    t = session.sql(f"SELECT seqname, start, \"end\" "
                    f"FROM gff_scan('{p}')").to_pandas()
    assert t["seqname"].tolist() == ["chr1", "chr2"]
    assert t["end"].tolist() == [10, 9]

    p = w("e.vcf", "##fileformat=VCFv4.2\r\n"
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\r\n"
          "1\t100\t.\tA\t.\t.\t.\t.\r\n"
          "2\t5\trs1\tC\tG,T\t9.5\tPASS\tDP=3\r\n")
    t = session.sql(f"SELECT chrom, pos, id, alt, qual "
                    f"FROM vcf_scan('{p}')").to_pandas()
    assert t["pos"].tolist() == [100, 5]
    assert t["id"][0] is None and list(t["id"][1]) == ["rs1"]
    assert t["alt"][0] is None and list(t["alt"][1]) == ["G", "T"]


def test_map_column_through_breakers(ctx):
    """ORDER BY / window over a table with a Map column (GFF attributes)
    round-trips the map through the breaker's host concat (batch.py
    from_arrow MAP support)."""
    gff = ("/root/reference/exon/exon-core/test-data/datasources/gff/"
           "test.gff")
    plain = ctx.sql(f"SELECT * FROM gff_scan('{gff}')").collect_arrow()
    srt = ctx.sql(f"SELECT * FROM gff_scan('{gff}') "
                  "ORDER BY seqname, start, \"end\"").collect_arrow()
    assert srt.num_rows == plain.num_rows
    assert srt.column_names == plain.column_names
    # multiset equality of (row-key, rendered attributes)
    def keyed(t):
        d = t.to_pydict()
        return sorted(zip(d["seqname"], d["start"], d["end"],
                          [str(a) for a in d["attributes"]]))
    assert keyed(srt) == keyed(plain)
    r = ctx.sql(f"SELECT *, row_number() OVER (ORDER BY start) AS rn "
                f"FROM gff_scan('{gff}') LIMIT 3").collect_arrow()
    assert r.column("attributes")[0] is not None


def test_vcf_header_line_over_1mib(tmp_path):
    """A #CHROM header line longer than the 1 MiB scan window (large-cohort
    sample lists) must still split into lines correctly."""
    from exon_tpu.formats.vcf import _leading_header_lines

    samples = "\t".join(f"SAMP{i:07d}" for i in range(150000))
    chrom_line = ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                  + samples)
    assert len(chrom_line) > (1 << 20)
    body = ("##fileformat=VCFv4.2\n" + chrom_line + "\n"
            "chr1\t5\t.\tA\tT\t50\tPASS\t.\tGT" + "\t0/1" * 150000 + "\n")
    arr = np.frombuffer(body.encode(), np.uint8)
    lines = _leading_header_lines(arr)
    assert len(lines) == 2
    assert lines[0] == b"##fileformat=VCFv4.2"
    assert lines[1] == chrom_line.encode()


def test_sdf_fast_path_edge_cases(ctx, tmp_path):
    """Vectorized SDF property/header extraction matches the reference
    semantics on CRLF endings, space-only value terminators, duplicate
    keys (last wins), empty values, and multi-line values."""
    rec = (
        "  Title\r\n"
        " prog\r\n"
        "\r\n"
        "  1  0  0  0  0  0  0  0  0  0999 V2000\r\n"
        "    0.0000    0.0000    0.0000 C   0  0\r\n"
        "M  END\r\n"
        "> <a>\r\n"
        "line1\r\n"
        "line2\r\n"
        "\r\n"
        ">  <b>\r\n"
        "val\r\n"
        "   \r\n"
        "ignored-after-spaces\r\n"
        "\r\n"
        "> <a>\r\n"
        "wins\r\n"
        "\r\n"
        "> <empty>\r\n"
        "\r\n"
        "$$$$\r\n")
    p = tmp_path / "edge.sdf"
    p.write_bytes(rec.encode() * 2)
    t = ctx.read_sdf(str(p)).collect_arrow()
    assert t.num_rows == 2
    assert t.column("header").to_pylist() == ["Title\nprog"] * 2
    data = t.column("data").to_pylist()
    assert data[0]["a"] == "wins"          # duplicate key: last wins
    assert data[0]["b"] == "val"           # space-only line terminates
    assert data[0]["empty"] == ""          # key present, empty value
    assert data[0] == data[1]
    # multi-line join must be '\n' (not '\r\n') — check via engine value
    q = ctx.sql(
        f"SELECT COUNT(*) AS n FROM sdf_scan('{p}') t "
        f"WHERE t.data.a = 'wins'").to_pandas()
    assert q["n"].tolist() == [2]


def test_corrupt_input_never_crashes(ctx, tmp_path):
    """Truncated / bit-flipped inputs raise clean Python errors (or parse
    a prefix) — never segfault the native paths or hard-kill the process.
    Exercises the bounds checks in native/decomp.cpp and the per-format
    validators."""
    base = "/root/reference/exon/exon-core/test-data/datasources"
    fixtures = [
        ("fasta/test.fasta", "read_fasta"),
        ("gff/test.gff.gz", "read_gff"),
        ("bam/test.bam", "read_bam"),
        ("vcf/index.vcf.gz", "read_vcf"),
        ("bcf/index.bcf", "read_bcf"),
        ("mzml/test.mzML", "read_mzml"),
    ]
    rng = np.random.default_rng(3)
    for rel, fn in fixtures:
        src = os.path.join(base, rel)
        if not os.path.exists(src):
            continue
        data = open(src, "rb").read()
        for trial in range(4):
            buf = bytearray(data)
            if trial % 2 == 0 and len(buf) > 10:
                buf = buf[:int(rng.integers(1, len(buf)))]
            else:
                for _ in range(5):
                    i = int(rng.integers(0, len(buf)))
                    buf[i] = int(rng.integers(0, 256))
            ext = os.path.splitext(rel)[1]
            p = str(tmp_path / f"c{trial}{ext}")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            try:
                getattr(ctx, fn)(p).count()
            except Exception:
                pass  # any clean Python error is acceptable
