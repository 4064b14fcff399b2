"""Index construction: tabix (.tbi) and BAM (.bai) writers.

The reference consumes these indexes (exon-core/src/datasources/indexed_file/
indexed_bgzf_file.rs:27-112) but relies on external `tabix`/`samtools index`
to create them. Here building is first-class: the writers invert the binary
formats parsed in exon_tpu/io/indexes.py (same 5-level binning, 16 kb linear
index), so region-query benchmarks and COPY pipelines are self-contained.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from .bgzf import BGZF_EOF, make_vpos, read_block
from .indexes import parse_bai, parse_tabix  # noqa: F401 (round-trip tests)

_MAX_BIN_POS = 1 << 29


def reg2bin(beg: int, end: int) -> int:
    """Smallest 5-level bin fully containing 0-based [beg, end)."""
    beg = min(beg, _MAX_BIN_POS - 1)
    end = min(end, _MAX_BIN_POS) - 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


class BgzfWriter:
    """Incremental BGZF writer that reports virtual positions.

    ``tell_vpos()`` returns the virtual position (coffset<<16 | uoffset) of
    the NEXT byte written — record it before/after appending a record to
    get that record's chunk for index building.
    """

    def __init__(self, fileobj, block_size: int = 0xFF00, level: int = 6):
        self._f = fileobj
        self._block = bytearray()
        self._block_size = block_size
        self._level = level
        self._coffset = 0  # compressed offset of the current open block

    def tell_vpos(self) -> int:
        return make_vpos(self._coffset, len(self._block))

    def write(self, data: bytes) -> None:
        self._block += data
        while len(self._block) >= self._block_size:
            self._flush_block(self._block[:self._block_size])
            del self._block[:self._block_size]

    def _flush_block(self, chunk) -> None:
        chunk = bytes(chunk)
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 26
        header = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 +
                  struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2) +
                  struct.pack("<H", bsize - 1))
        trailer = struct.pack("<II", zlib.crc32(chunk), len(chunk))
        self._f.write(header + cdata + trailer)
        self._coffset += bsize

    def finish(self) -> None:
        if self._block:
            self._flush_block(self._block)
            self._block = bytearray()
        self._f.write(BGZF_EOF)


@dataclass
class _RefIndexBuilder:
    bins: dict = field(default_factory=dict)          # bin -> [vs, ve, ...]
    intervals: list = field(default_factory=list)     # 16kb linear index
    # per-ref stats for the samtools pseudo-bin (bin 37450)
    first_voff: int = -1
    last_voff: int = 0
    n_mapped: int = 0

    def add(self, beg: int, end: int, vstart: int, vend: int) -> None:
        b = reg2bin(beg, max(end, beg + 1))
        chunks = self.bins.setdefault(b, [])
        if chunks and vstart <= chunks[-1]:
            chunks[-1] = max(chunks[-1], vend)  # extend adjacent chunk
        else:
            chunks.extend((vstart, vend))
        iv_hi = max(end - 1, beg) >> 14
        while len(self.intervals) <= iv_hi:
            self.intervals.append(0)
        for iv in range(beg >> 14, iv_hi + 1):
            if self.intervals[iv] == 0 or vstart < self.intervals[iv]:
                self.intervals[iv] = vstart
        if self.first_voff < 0:
            self.first_voff = vstart
        self.last_voff = max(self.last_voff, vend)
        self.n_mapped += 1

    def fill_intervals(self) -> None:
        """Linear index semantics: interval i holds the minimum voffset of
        records overlapping window i; empty windows inherit the previous."""
        prev = 0
        for i, v in enumerate(self.intervals):
            if v == 0:
                self.intervals[i] = prev
            else:
                prev = v

    def pack(self, pseudo: bool) -> bytes:
        self.fill_intervals()
        out = [struct.pack("<i", len(self.bins) + (1 if pseudo and
                                                   self.n_mapped else 0))]
        for b in sorted(self.bins):
            chunks = self.bins[b]
            out.append(struct.pack("<Ii", b, len(chunks) // 2))
            out.append(struct.pack(f"<{len(chunks)}Q", *chunks))
        if pseudo and self.n_mapped:
            out.append(struct.pack("<Ii", 37450, 2))
            out.append(struct.pack("<4Q", self.first_voff, self.last_voff,
                                   self.n_mapped, 0))
        out.append(struct.pack("<i", len(self.intervals)))
        if self.intervals:
            out.append(struct.pack(f"<{len(self.intervals)}Q",
                                   *self.intervals))
        return b"".join(out)


class TabixBuilder:
    """Build a .tbi for a coordinate-sorted bgzf text file.

    fmt: 2 = VCF preset, 0 = generic (col numbers are 1-based, SAM-style).
    """

    def __init__(self, names: list[str], fmt: int = 2, col_seq: int = 1,
                 col_beg: int = 2, col_end: int = 0, meta: str = "#",
                 skip: int = 0):
        self.names = list(names)
        self.refs = [_RefIndexBuilder() for _ in names]
        self.fmt, self.col_seq, self.col_beg, self.col_end = \
            fmt, col_seq, col_beg, col_end
        self.meta, self.skip = meta, skip

    def add(self, ref_id: int, beg0: int, end0: int, vstart: int,
            vend: int) -> None:
        self.refs[ref_id].add(beg0, end0, vstart, vend)

    def finish(self) -> bytes:
        names_blob = b"".join(n.encode() + b"\x00" for n in self.names)
        raw = [b"TBI\x01",
               struct.pack("<8i", len(self.names), self.fmt, self.col_seq,
                           self.col_beg, self.col_end, ord(self.meta),
                           self.skip, len(names_blob)),
               names_blob]
        for r in self.refs:
            raw.append(r.pack(pseudo=False))
        from .bgzf import compress_bgzf

        return compress_bgzf(b"".join(raw))


class BaiBuilder:
    def __init__(self, n_ref: int):
        self.refs = [_RefIndexBuilder() for _ in range(n_ref)]

    def add(self, ref_id: int, beg0: int, end0: int, vstart: int,
            vend: int) -> None:
        self.refs[ref_id].add(beg0, end0, vstart, vend)

    def finish(self) -> bytes:
        raw = [b"BAI\x01", struct.pack("<i", len(self.refs))]
        for r in self.refs:
            raw.append(r.pack(pseudo=True))
        return b"".join(raw)  # .bai is NOT bgzf-compressed


# ---------------------------------------------------------------------------
# File-level indexers (the `tabix -p vcf` / `samtools index` analogs)
# ---------------------------------------------------------------------------


def _iter_bgzf_lines(buf: bytes):
    """Yield (line_bytes, vstart, vend) for newline-terminated lines of a
    BGZF stream, tracking virtual positions across block boundaries."""
    pos = 0
    carry = b""
    carry_vpos = 0
    while pos < len(buf):
        blk = read_block(buf, pos)
        if blk.comp_size == 28 and not blk.data:  # EOF marker
            break
        data = blk.data
        start = 0
        while True:
            nl = data.find(b"\n", start)
            if nl == -1:
                rest = data[start:]
                if rest or carry:
                    if not carry:
                        carry_vpos = make_vpos(pos, start)
                    carry += rest
                break
            if carry:
                line = carry + data[start:nl]
                vstart = carry_vpos
                carry = b""
            else:
                line = data[start:nl]
                vstart = make_vpos(pos, start)
            vend = make_vpos(pos, nl + 1)
            if nl + 1 == len(data):
                vend = make_vpos(pos + blk.comp_size, 0)
            yield line, vstart, vend
            start = nl + 1
            if start >= len(data):
                break
        pos += blk.comp_size
    if carry:
        yield carry, carry_vpos, make_vpos(len(buf), 0)


def build_tabix_vcf(bgzf_data: bytes) -> bytes:
    """Index a coordinate-sorted bgzf VCF: the `tabix -p vcf` analog."""
    names: list[str] = []
    name_id: dict[str, int] = {}
    recs: list[tuple[int, int, int, int, int]] = []
    for line, vstart, vend in _iter_bgzf_lines(bgzf_data):
        if line.startswith(b"#"):
            continue
        f = line.split(b"\t", 8)
        chrom = f[0].decode()
        pos1 = int(f[1])
        rlen = len(f[3])
        rid = name_id.get(chrom)
        if rid is None:
            rid = len(names)
            name_id[chrom] = rid
            names.append(chrom)
        recs.append((rid, pos1 - 1, pos1 - 1 + rlen, vstart, vend))
    tb = TabixBuilder(names, fmt=2, col_seq=1, col_beg=2, col_end=0)
    for rid, b0, e0, vs, ve in recs:
        tb.add(rid, b0, e0, vs, ve)
    return tb.finish()


def _cigar_ref_len(cigar_u32s) -> int:
    ref = 0
    for c in cigar_u32s:
        op = c & 0xF
        ln = c >> 4
        if op in (0, 2, 3, 7, 8):  # M, D, N, =, X
            ref += ln
    return ref


def build_bai(bam_data: bytes) -> bytes:
    """Index a coordinate-sorted BAM: the `samtools index` analog."""
    from .bgzf import decompress_all

    # walk records with virtual positions: decompress per block, tracking
    # record starts. Records may span blocks, so parse over a flat buffer
    # while mapping flat offsets -> virtual positions.
    blocks = []  # (flat_start, comp_offset, ulen)
    flat = []
    pos = 0
    total = 0
    while pos < len(bam_data):
        blk = read_block(bam_data, pos)
        if blk.comp_size == 28 and not blk.data:
            break
        blocks.append((total, pos, len(blk.data)))
        flat.append(blk.data)
        total += len(blk.data)
        pos += blk.comp_size
    raw = b"".join(flat)

    def flat_to_vpos(off: int) -> int:
        import bisect

        i = bisect.bisect_right(blocks, (off, float("inf"), 0)) - 1
        fs, co, _ = blocks[i]
        return make_vpos(co, off - fs)

    if raw[:4] != b"BAM\x01":
        raise ValueError("not a BAM file")
    l_text = struct.unpack_from("<i", raw, 4)[0]
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", raw, off)[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", raw, off)[0]
        off += 4 + l_name + 4
    bb = BaiBuilder(n_ref)
    while off + 4 <= len(raw):
        block_size = struct.unpack_from("<i", raw, off)[0]
        rec_start = off
        off += 4
        body = raw[off:off + block_size]
        off += block_size
        ref_id, pos0 = struct.unpack_from("<ii", body, 0)
        l_read_name = body[8]
        n_cigar = struct.unpack_from("<H", body, 12)[0]
        if ref_id >= 0 and pos0 >= 0:
            cg_off = 32 + l_read_name
            cigars = struct.unpack_from(f"<{n_cigar}I", body, cg_off)
            rlen = _cigar_ref_len(cigars) or 1
            bb.add(ref_id, pos0, pos0 + rlen,
                   flat_to_vpos(rec_start), flat_to_vpos(off))
    return bb.finish()
