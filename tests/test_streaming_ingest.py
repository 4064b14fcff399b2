"""Bounded-memory streaming ingest: chunked decode must equal whole-file
decode exactly (ref: streaming BatchReader, exon-fasta/src/batch_reader.rs).
"""

import gzip

import numpy as np
import pytest

from exon_tpu import ExonSession
from exon_tpu.io.compression import Compression
from exon_tpu.io.streaming import stream_record_chunks


def test_chunker_line_alignment():
    lines = [b"l%04d some text" % i for i in range(5000)]
    data = b"\n".join(lines) + b"\n"
    gz = gzip.compress(data)
    chunks = list(stream_record_chunks(gz, Compression.GZIP, "line",
                                       chunk_size=4096))
    assert b"".join(chunks) == data
    for c in chunks:
        assert c.endswith(b"\n")


def test_chunker_fasta_alignment():
    recs = [b">r%d desc\nACGTACGT\nGGGG\n" % i for i in range(3000)]
    data = b"".join(recs)
    gz = gzip.compress(data)
    chunks = list(stream_record_chunks(gz, Compression.GZIP, "fasta",
                                       chunk_size=2048))
    assert b"".join(chunks) == data
    for c in chunks:
        assert c.startswith(b">")


def test_chunker_fastq_line_mod4():
    recs = [b"@r%d\nACGT\n+\nIIII\n" % i for i in range(4000)]
    data = b"".join(recs)
    gz = gzip.compress(data)
    chunks = list(stream_record_chunks(gz, Compression.GZIP, "fastq",
                                       chunk_size=1024))
    assert b"".join(chunks) == data
    for c in chunks:
        assert c.count(b"\n") % 4 == 0
        assert c.startswith(b"@")


def test_chunker_header_prepend():
    header = b"##meta\n#CHROM\tPOS\n"
    rows = b"".join(b"chr1\t%d\n" % i for i in range(1, 3001))
    gz = gzip.compress(header + rows)
    chunks = list(stream_record_chunks(gz, Compression.GZIP, "line",
                                       header_prefixes=(b"#",),
                                       chunk_size=2048))
    assert chunks[0].startswith(b"##meta")
    for c in chunks[1:]:
        assert c.startswith(header)  # header replayed on every chunk
    body = chunks[0] + b"".join(c[len(header):] for c in chunks[1:])
    assert body == header + rows


@pytest.mark.parametrize("fmt,make", [
    ("vcf", lambda n: (b"##fileformat=VCFv4.2\n"
                       b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" +
                       b"".join(b"chr1\t%d\t.\tA\tT\t50\tPASS\tDP=%d\n"
                                % (i + 1, i) for i in range(n)))),
    ("gff", lambda n: b"".join(b"chr1\tsrc\tgene\t%d\t%d\t.\t+\t.\tID=g%d\n"
                               % (i + 1, i + 100, i) for i in range(n))),
])
def test_streaming_scan_parity(tmp_path, fmt, make, monkeypatch):
    """Chunked scan of a compressed file == whole-file scan, same order."""
    import exon_tpu.io.streaming as st

    data = make(6000)
    p = tmp_path / f"t.{fmt}.gz"
    p.write_bytes(gzip.compress(data))
    ctx = ExonSession.new_exon()
    read = getattr(ctx, f"read_{fmt}")
    # force the streaming path: tiny chunks, lower the size threshold
    monkeypatch.setattr(st, "DEFAULT_CHUNK", 8192)
    streamed = read(str(p)).collect_arrow()
    whole = gzip.decompress(p.read_bytes())
    pw = tmp_path / f"w.{fmt}"
    pw.write_bytes(whole)
    plain = read(str(pw)).collect_arrow()
    assert streamed.to_pydict() == plain.to_pydict()
    assert streamed.num_rows == 6000


def test_streaming_fastq_scan(tmp_path, monkeypatch):
    import exon_tpu.io.streaming as st

    data = b"".join(b"@r%d\nACGTTGCA\n+\nIIIIIIII\n" % i for i in range(5000))
    p = tmp_path / "t.fastq.gz"
    p.write_bytes(gzip.compress(data))
    monkeypatch.setattr(st, "DEFAULT_CHUNK", 8192)
    ctx = ExonSession.new_exon()
    out = ctx.read_fastq(str(p)).collect_arrow()
    assert out.num_rows == 5000
    assert out.to_pydict()["name"][0] == "r0"
    assert out.to_pydict()["name"][-1] == "r4999"
