"""Synthetic benchmark fixtures mirroring the reference suite's workload
files (exon-benchmarks/run_benchmarks.py:38-101):

- uniprot_sprot-scale FASTA (~560k protein records, ~250 MB) + gz/zstd
- a >=1 GB coordinate-sorted bgzf VCF + .tbi (reference uses a 2.6 GB
  1000-genomes chr1 file; we report throughput, not just wall time)
- a ~300 MB coordinate-sorted BAM + .bai
- a chembl-style SDF (~100 MB gzipped)

All fixtures are generated once into .bench_cache/ and reused. Index files
are built with exon_tpu.io.index_build (the tabix/samtools-index analogs),
so the whole pipeline is self-contained.
"""

from __future__ import annotations

import gzip
import os
import struct
import zlib

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")

FASTA_RECORDS = 560_000
VCF_RECORDS = 25_000_000   # ~4 GB text -> ~1.1 GB bgzf (ref file: 2.6 GB)
BAM_RECORDS = 2_850_000
SDF_RECORDS = 210_000


def _done(path: str) -> bool:
    return os.path.exists(path) and os.path.getsize(path) > 0


# ---------------------------------------------------------------------------
# FASTA (kept byte-compatible with the round-1/2 fixture)
# ---------------------------------------------------------------------------


def make_fasta(n_records: int = FASTA_RECORDS, mean_len: int = 400,
               seed: int = 42, name: str | None = None) -> str:
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, name or f"sprot_like_{n_records}.fasta")
    if _done(path):
        return path
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    lens = rng.integers(120, 2 * mean_len - 120, size=n_records).astype(np.int64)
    starts_m = rng.random(n_records) < 0.23
    with open(path + ".tmp", "wb") as f:
        chunk = 40_000
        for lo in range(0, n_records, chunk):
            hi = min(lo + chunk, n_records)
            clens = lens[lo:hi]
            total = int(clens.sum())
            flat = alphabet[rng.integers(0, 20, size=total)]
            offs = np.zeros(len(clens) + 1, np.int64)
            np.cumsum(clens, out=offs[1:])
            flat[offs[:-1][starts_m[lo:hi]]] = ord("M")
            parts = []
            for i in range(hi - lo):
                body = flat[offs[i]:offs[i + 1]].tobytes()
                wrapped = b"\n".join(body[j:j + 60]
                                     for j in range(0, len(body), 60))
                idx = lo + i
                parts.append(b">sp|P%06d|PROT%d synthetic protein %d\n"
                             % (idx, idx, idx))
                parts.append(wrapped)
                parts.append(b"\n")
            f.write(b"".join(parts))
    os.replace(path + ".tmp", path)
    return path


def make_fasta_gzip(src: str) -> str:
    path = src + ".gz"
    if _done(path):
        return path
    with open(src, "rb") as fi, open(path + ".tmp", "wb") as fo:
        gz = gzip.GzipFile(fileobj=fo, mode="wb", compresslevel=4)
        while True:
            b = fi.read(8 << 20)
            if not b:
                break
            gz.write(b)
        gz.close()
    os.replace(path + ".tmp", path)
    return path


def make_fasta_zstd(src: str) -> str | None:
    path = src + ".zst"
    if _done(path):
        return path
    try:
        import zstandard as zstd
    except ImportError:
        return None
    cctx = zstd.ZstdCompressor(level=3)
    with open(src, "rb") as fi, open(path + ".tmp", "wb") as fo:
        cctx.copy_stream(fi, fo)
    os.replace(path + ".tmp", path)
    return path


def make_fasta_parallel(n_files: int = 8) -> list[str]:
    """8-file parallel-scan fixture (reference: 4,437,864 total rows)."""
    out = []
    for i in range(n_files):
        out.append(make_fasta(FASTA_RECORDS, seed=100 + i,
                              name=f"par_{i}.fasta"))
    return out


# ---------------------------------------------------------------------------
# VCF (bgzf + .tbi)
# ---------------------------------------------------------------------------

_VCF_HEADER = (b"##fileformat=VCFv4.2\n"
               b"##contig=<ID=chr1,length=249250621>\n"
               b'##INFO=<ID=DP,Number=1,Type=Integer,Description="depth">\n'
               b'##INFO=<ID=AF,Number=1,Type=Float,Description="freq">\n'
               b'##INFO=<ID=RS,Number=1,Type=Integer,Description="rsid">\n'
               b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")


def make_vcf_bgzf(n_records: int = VCF_RECORDS) -> tuple[str, str]:
    """Generate a coordinate-sorted bgzf VCF (~1+ GB compressed) + .tbi."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"chr1_{n_records}.vcf.gz")
    tbi = path + ".tbi"
    if _done(path) and _done(tbi):
        return path, tbi
    from exon_tpu.io.index_build import BgzfWriter, TabixBuilder

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    tb = TabixBuilder(["chr1"], fmt=2, col_seq=1, col_beg=2, col_end=0)
    with open(path + ".tmp", "wb") as f:
        w = BgzfWriter(f, level=4)
        w.write(_VCF_HEADER)
        chunk = 250_000
        pos = 10
        for lo in range(0, n_records, chunk):
            hi = min(lo + chunk, n_records)
            m = hi - lo
            gaps = rng.integers(1, 54, size=m)
            positions = pos + np.cumsum(gaps)
            pos = int(positions[-1])
            refs = bases[rng.integers(0, 4, size=m)]
            alts = bases[rng.integers(0, 4, size=m)]
            quals = rng.integers(10, 4000, size=m)
            dps = rng.integers(1, 9000, size=m)
            afs = rng.integers(0, 10_000_000, size=m)
            rss = rng.integers(10**7, 10**9, size=m)
            ans = rng.integers(2, 5008, size=m)
            mqs = rng.integers(20, 60, size=m)
            bqs = rng.integers(-3000, 3000, size=m)
            lines = []
            for i in range(m):
                lines.append(b"chr1\t%d\trs%d\t%c\t%c\t%d\tPASS\t"
                             b"DP=%d;AF=0.%07d;RS=%d;AN=%d;AC=%d;MQ=%d;"
                             b"BaseQRankSum=%.3f;MQRankSum=%.3f\n"
                             % (positions[i], rss[i], refs[i], alts[i],
                                quals[i], dps[i], afs[i], rss[i], ans[i],
                                ans[i] // 2, mqs[i], bqs[i] / 1000.0,
                                bqs[(i + 1) % m] / 1000.0))
            # record virtual positions per line for the index
            for i in range(m):
                vs = w.tell_vpos()
                w.write(lines[i])
                ve = w.tell_vpos()
                p0 = int(positions[i]) - 1
                tb.add(0, p0, p0 + 1, vs, ve)
        w.finish()
    with open(tbi + ".tmp", "wb") as f:
        f.write(tb.finish())
    os.replace(path + ".tmp", path)
    os.replace(tbi + ".tmp", tbi)
    return path, tbi


# ---------------------------------------------------------------------------
# BAM (bgzf binary + .bai)
# ---------------------------------------------------------------------------


def _bam_header(ref_names: list[str], ref_lens: list[int]) -> bytes:
    text = b"@HD\tVN:1.6\tSO:coordinate\n" + b"".join(
        b"@SQ\tSN:%s\tLN:%d\n" % (n.encode(), ln)
        for n, ln in zip(ref_names, ref_lens))
    out = [b"BAM\x01", struct.pack("<i", len(text)), text,
           struct.pack("<i", len(ref_names))]
    for n, ln in zip(ref_names, ref_lens):
        nb = n.encode() + b"\x00"
        out.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))
    return b"".join(out)


_SEQ_CODE = {0: 1, 1: 2, 2: 4, 3: 8}  # A C G T in BAM 4-bit encoding


def make_bam(n_records: int = BAM_RECORDS, read_len: int = 100
             ) -> tuple[str, str]:
    """Coordinate-sorted single-ref ('20') BAM + .bai (~300 MB)."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"chr20_{n_records}.bam")
    bai = path + ".bai"
    if _done(path) and _done(bai):
        return path, bai
    from exon_tpu.io.bgzf import BGZF_EOF
    from exon_tpu.io.index_build import BaiBuilder, BgzfWriter

    rng = np.random.default_rng(11)
    # fixed-size records -> fully vectorized construction per chunk
    name_len = 12  # "r" + 10 digits + NUL
    n_cigar = 1
    seq_bytes = (read_len + 1) // 2
    body = 32 + name_len + 4 * n_cigar + seq_bytes + read_len
    rec_size = 4 + body
    ref_len = 63_025_520  # GRCh38 chr20
    span = ref_len - read_len - 1000
    gaps = rng.integers(1, max(2 * span // n_records, 2), size=n_records)
    positions = 100 + np.cumsum(gaps)
    bb = BaiBuilder(1)
    from exon_tpu.io.index_build import reg2bin

    with open(path + ".tmp", "wb") as f:
        w = BgzfWriter(f, level=4)
        w.write(_bam_header(["20"], [ref_len]))
        chunk = 100_000
        code4 = np.asarray([1, 2, 4, 8], np.uint8)
        for lo in range(0, n_records, chunk):
            hi = min(lo + chunk, n_records)
            m = hi - lo
            buf = np.zeros((m, rec_size), np.uint8)
            pos0 = positions[lo:hi].astype(np.int64)
            flat = buf.reshape(-1)
            rows = buf  # alias
            def put_i32(col, vals):
                rows[:, col:col + 4] = np.asarray(vals, "<i4").view(np.uint8).reshape(m, 4)
            put_i32(0, np.full(m, body))            # block_size
            put_i32(4, np.zeros(m))                 # refID = 0
            put_i32(8, pos0)                        # POS (0-based)
            rows[:, 12] = name_len                  # l_read_name
            rows[:, 13] = 60                        # MAPQ
            bins = np.asarray([reg2bin(int(p), int(p) + read_len)
                               for p in pos0], "<u2")
            rows[:, 14:16] = bins.view(np.uint8).reshape(m, 2)
            rows[:, 16:18] = np.asarray([n_cigar], "<u2").view(np.uint8)
            rows[:, 18:20] = np.zeros((m, 2), np.uint8)  # FLAG = 0
            put_i32(20, np.full(m, read_len))       # l_seq
            put_i32(24, np.full(m, -1))             # next_refID
            put_i32(28, np.full(m, -1))             # next_pos
            put_i32(32, np.zeros(m))                # tlen
            # read names
            names = np.frombuffer(
                b"".join(b"r%010d\x00" % i for i in range(lo, hi)),
                np.uint8).reshape(m, name_len)
            rows[:, 36:36 + name_len] = names
            cg_off = 36 + name_len
            cigar = np.asarray([(read_len << 4) | 0], "<u4").view(np.uint8)
            rows[:, cg_off:cg_off + 4] = cigar
            sq_off = cg_off + 4
            codes = code4[rng.integers(0, 4, size=(m, read_len))]
            packed = (codes[:, 0::2] << 4) | codes[:, 1::2]
            rows[:, sq_off:sq_off + seq_bytes] = packed
            ql_off = sq_off + seq_bytes
            rows[:, ql_off:ql_off + read_len] = rng.integers(
                20, 40, size=(m, read_len)).astype(np.uint8)
            # index chunks: record vpos before/after each record write
            raw = flat.tobytes()
            for i in range(m):
                vs = w.tell_vpos()
                w.write(raw[i * rec_size:(i + 1) * rec_size])
                ve = w.tell_vpos()
                p = int(pos0[i])
                bb.add(0, p, p + read_len, vs, ve)
        w.finish()
    with open(bai + ".tmp", "wb") as f:
        f.write(bb.finish())
    os.replace(path + ".tmp", path)
    os.replace(bai + ".tmp", bai)
    return path, bai


# ---------------------------------------------------------------------------
# SDF (gzip)
# ---------------------------------------------------------------------------


def make_sdf_gz(n_records: int = SDF_RECORDS) -> str:
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"chembl_like_{n_records}.sdf.gz")
    if _done(path):
        return path
    rng = np.random.default_rng(5)
    atoms = ["C", "N", "O", "S", "P", "F", "Cl"]
    with open(path + ".tmp", "wb") as fo:
        gz = gzip.GzipFile(fileobj=fo, mode="wb", compresslevel=4)
        chunk = []
        for i in range(n_records):
            na = int(rng.integers(8, 40))
            nb = na - 1
            lines = [f"CHEMBL{i}", "  exon-tpu-bench", "",
                     f"{na:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000"]
            coords = rng.normal(0, 5, size=(na, 3))
            for a in range(na):
                el = atoms[int(rng.integers(0, len(atoms)))]
                lines.append("%10.4f%10.4f%10.4f %-3s 0  0  0  0  0  0  0  0  0  0  0  0"
                             % (coords[a, 0], coords[a, 1], coords[a, 2], el))
            for b in range(nb):
                lines.append("%3d%3d%3d  0" % (b + 1, b + 2, 1))
            lines.append("M  END")
            lines.append(">  <canonical_smiles>")
            lines.append("C" * int(rng.integers(10, 60)))
            lines.append("")
            lines.append(">  <chembl_id>")
            lines.append(f"CHEMBL{i}")
            lines.append("")
            lines.append("$$$$")
            chunk.append("\n".join(lines) + "\n")
            if len(chunk) >= 5000:
                gz.write("".join(chunk).encode())
                chunk = []
        if chunk:
            gz.write("".join(chunk).encode())
        gz.close()
    os.replace(path + ".tmp", path)
    return path


# ---------------------------------------------------------------------------
# mzML (reference MzMLScan workload, exon-benchmarks/src/main.rs:31-93;
# fixture scale per exon-benchmarks/README.md: ~6k spectra)
# ---------------------------------------------------------------------------

MZML_SPECTRA = 6_000


def make_mzml(n_spectra: int = MZML_SPECTRA) -> str:
    import base64
    import struct
    import zlib

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"bench_{n_spectra}.mzML")
    if _done(path):
        return path
    rng = np.random.default_rng(7)

    def b64(values: np.ndarray) -> str:
        raw = struct.pack(f"<{len(values)}d", *values)
        return base64.b64encode(zlib.compress(raw, 1)).decode()

    head = ('<?xml version="1.0" encoding="utf-8"?>\n'
            '<mzML xmlns="http://psi.hupo.org/ms/mzml" version="1.1.0">\n'
            '  <run id="bench">\n'
            f'    <spectrumList count="{n_spectra}">\n')
    tail = "    </spectrumList>\n  </run>\n</mzML>\n"
    with open(path + ".tmp", "w") as f:
        f.write(head)
        for i in range(n_spectra):
            n_peaks = int(rng.integers(64, 512))
            mz = np.sort(rng.uniform(100, 2000, n_peaks))
            inten = rng.uniform(0, 1e6, n_peaks)
            enc_mz, enc_in = b64(mz), b64(inten)
            f.write(
                f'      <spectrum index="{i}" id="scan={i}" '
                f'defaultArrayLength="{n_peaks}">\n'
                '        <cvParam cvRef="MS" accession="MS:1000511" '
                'name="ms level" value="1"/>\n'
                '        <binaryDataArrayList count="2">\n'
                f'          <binaryDataArray encodedLength="{len(enc_mz)}">\n'
                '            <cvParam cvRef="MS" accession="MS:1000523" '
                'name="64-bit float" value=""/>\n'
                '            <cvParam cvRef="MS" accession="MS:1000574" '
                'name="zlib compression" value=""/>\n'
                '            <cvParam cvRef="MS" accession="MS:1000514" '
                'name="m/z array" value=""/>\n'
                f'            <binary>{enc_mz}</binary>\n'
                '          </binaryDataArray>\n'
                f'          <binaryDataArray encodedLength="{len(enc_in)}">\n'
                '            <cvParam cvRef="MS" accession="MS:1000523" '
                'name="64-bit float" value=""/>\n'
                '            <cvParam cvRef="MS" accession="MS:1000574" '
                'name="zlib compression" value=""/>\n'
                '            <cvParam cvRef="MS" accession="MS:1000515" '
                'name="intensity array" value=""/>\n'
                f'            <binary>{enc_in}</binary>\n'
                '          </binaryDataArray>\n'
                '        </binaryDataArrayList>\n'
                '      </spectrum>\n')
        f.write(tail)
    os.replace(path + ".tmp", path)
    return path
