"""Genomic index parsing + byte-range queries: FAI, Tabix (.tbi), BAI, CSI.

Replaces the reference's indexed_file machinery (compute_fai_range,
indexed_file/fai.rs:29-65; IndexedBGZFFile::get_byte_range_for_file,
indexed_file/indexed_bgzf_file.rs:27-155): a region query consults the
index host-side and yields virtual-position chunks; scans then read only
those compressed byte ranges.

Regions are 1-based inclusive (`docs/vcf_expression_rewriting.md:92`).
"""

from __future__ import annotations

import functools
import re
import struct
from dataclasses import dataclass
from typing import Optional

from ..errors import InvalidRegionError
from .bgzf import decompress_all


@dataclass(frozen=True)
class Region:
    """1-based inclusive genomic interval; start/end None → whole contig."""

    name: str
    start: Optional[int] = None  # 1-based
    end: Optional[int] = None    # inclusive

    _RE = re.compile(r"^([^:]+)(?::([\d,]+)?(?:-([\d,]+)?)?)?$")

    @classmethod
    def parse(cls, s: str) -> "Region":
        m = cls._RE.match(s.strip())
        if not m or not m.group(1):
            raise InvalidRegionError(f"invalid region {s!r}")
        start = int(m.group(2).replace(",", "")) if m.group(2) else None
        end = int(m.group(3).replace(",", "")) if m.group(3) else None
        if start is not None and end is not None and end < start:
            raise InvalidRegionError(f"invalid interval in {s!r}")
        return cls(m.group(1), start, end)

    @property
    def zero_start(self) -> int:
        return (self.start - 1) if self.start else 0

    @property
    def excl_end(self) -> int:
        return self.end if self.end is not None else 1 << 60

    def intersects(self, start_1b: int, end_1b: int) -> bool:
        return self.zero_start < end_1b and (self.end is None or
                                             start_1b <= self.end)

    def __str__(self) -> str:
        if self.start is None:
            return self.name
        if self.end is None:
            return f"{self.name}:{self.start}"
        return f"{self.name}:{self.start}-{self.end}"


# ---------------------------------------------------------------------------
# FAI (FASTA index)
# ---------------------------------------------------------------------------


@dataclass
class FaiRecord:
    name: str
    length: int
    offset: int       # file offset of first sequence byte
    line_bases: int
    line_width: int


def parse_fai(text: bytes) -> dict[str, FaiRecord]:
    out = {}
    for line in text.split(b"\n"):
        if not line.strip():
            continue
        parts = line.decode().split("\t")
        rec = FaiRecord(parts[0], int(parts[1]), int(parts[2]),
                        int(parts[3]), int(parts[4]))
        out[rec.name] = rec
    return out


def compute_fai_range(rec: FaiRecord, region: Region) -> tuple[int, int]:
    """File byte range covering the region's sequence lines
    (reference: indexed_file/fai.rs:29-47)."""
    start = region.zero_start
    end = min(region.excl_end, rec.length)
    if start >= rec.length:
        raise InvalidRegionError(
            f"region {region} beyond contig length {rec.length}")
    byte_start = rec.offset + (start // rec.line_bases) * rec.line_width + \
        start % rec.line_bases
    byte_end = rec.offset + ((end - 1) // rec.line_bases) * rec.line_width + \
        (end - 1) % rec.line_bases + 1
    return byte_start, byte_end


# ---------------------------------------------------------------------------
# Binning (tabix/BAI shared)
# ---------------------------------------------------------------------------


def reg2bins(beg: int, end: int) -> list[int]:
    """5-level binning scheme bins overlapping [beg, end) (0-based).
    Coordinates clamp to the scheme's 2^29 limit."""
    beg = min(beg, (1 << 29) - 1)
    end = min(end, 1 << 29)
    end -= 1
    bins = [0]
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return bins


@dataclass
class Chunk:
    vstart: int
    vend: int


@dataclass
class BinIndex:
    """Per-reference binning + linear index."""

    bins: dict[int, list[Chunk]]
    intervals: list[int]  # 16kb linear index of virtual offsets

    def query(self, beg: int, end: int) -> list[Chunk]:
        """Chunks possibly overlapping 0-based [beg, end)."""
        min_off = 0
        iv = beg >> 14
        if self.intervals:
            iv = min(iv, len(self.intervals) - 1)
            min_off = self.intervals[iv]
        out = []
        for b in reg2bins(beg, end):
            for c in self.bins.get(b, ()):
                if c.vend > min_off:
                    out.append(c)
        out.sort(key=lambda c: c.vstart)
        # merge adjacent/overlapping chunks
        merged: list[Chunk] = []
        for c in out:
            if merged and c.vstart <= merged[-1].vend:
                merged[-1] = Chunk(merged[-1].vstart, max(merged[-1].vend, c.vend))
            else:
                merged.append(Chunk(c.vstart, c.vend))
        return merged


@dataclass
class TabixIndex:
    names: list[str]
    refs: list[BinIndex]
    col_seq: int
    col_beg: int
    col_end: int
    meta_char: str
    skip: int

    def ref_id(self, name: str) -> Optional[int]:
        try:
            return self.names.index(name)
        except ValueError:
            return None

    def query(self, region: Region) -> list[Chunk]:
        rid = self.ref_id(region.name)
        if rid is None:
            return []
        return self.refs[rid].query(region.zero_start, region.excl_end)


def parse_tabix(data: bytes) -> TabixIndex:
    """Parse a .tbi file (bgzf-compressed binary). Cached by content —
    repeated region queries against the same table skip the re-parse."""
    return _parse_tabix_cached(bytes(data))


@functools.lru_cache(maxsize=32)
def _parse_tabix_cached(data: bytes) -> "TabixIndex":
    raw = decompress_all(data)
    if raw[:4] != b"TBI\x01":
        raise ValueError("not a tabix index")
    (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = \
        struct.unpack_from("<8i", raw, 4)
    off = 36
    names_blob = raw[off:off + l_nm]
    names = [n.decode() for n in names_blob.split(b"\x00") if n]
    off += l_nm
    refs = []
    for _ in range(n_ref):
        idx, off = _parse_binindex(raw, off)
        refs.append(idx)
    return TabixIndex(names, refs, col_seq, col_beg, col_end,
                      chr(meta & 0xFF), skip)


def _parse_binindex(raw: bytes, off: int, pseudo_bin: Optional[int] = 37450
                    ) -> tuple[BinIndex, int]:
    (n_bin,) = struct.unpack_from("<i", raw, off)
    off += 4
    bins: dict[int, list[Chunk]] = {}
    for _ in range(n_bin):
        b, n_chunk = struct.unpack_from("<Ii", raw, off)
        off += 8
        chunks = []
        for _ in range(n_chunk):
            vs, ve = struct.unpack_from("<QQ", raw, off)
            off += 16
            chunks.append(Chunk(vs, ve))
        if pseudo_bin is None or b != pseudo_bin:
            bins[b] = chunks
    (n_intv,) = struct.unpack_from("<i", raw, off)
    off += 4
    intervals = list(struct.unpack_from(f"<{n_intv}Q", raw, off))
    off += 8 * n_intv
    return BinIndex(bins, intervals), off


def reg2bins_csi(beg: int, end: int, min_shift: int, depth: int) -> list[int]:
    """Generalized CSI binning (min_shift/depth parameterized)."""
    max_pos = 1 << (min_shift + 3 * depth)
    beg = min(beg, max_pos - 1)
    end = min(end, max_pos)
    end -= 1
    bins = []
    l, t, s = 0, 0, min_shift + depth * 3
    while l <= depth:
        bins.extend(range(t + (beg >> s), t + (end >> s) + 1))
        s -= 3
        t += 1 << (3 * l)
        l += 1
    return bins


@dataclass
class CsiIndex:
    names: list[str]
    refs: list[BinIndex]
    min_shift: int
    depth: int

    def ref_id(self, name: str) -> Optional[int]:
        try:
            return self.names.index(name)
        except ValueError:
            return None

    def query(self, region: Region) -> list[Chunk]:
        rid = self.ref_id(region.name)
        if rid is None or rid >= len(self.refs):
            return []
        ref = self.refs[rid]
        out = []
        for b in reg2bins_csi(region.zero_start, region.excl_end,
                              self.min_shift, self.depth):
            out.extend(ref.bins.get(b, ()))
        out.sort(key=lambda c: c.vstart)
        merged: list[Chunk] = []
        for c in out:
            if merged and c.vstart <= merged[-1].vend:
                merged[-1] = Chunk(merged[-1].vstart, max(merged[-1].vend, c.vend))
            else:
                merged.append(Chunk(c.vstart, c.vend))
        return merged


def parse_csi(data: bytes, contig_names: Optional[list[str]] = None) -> CsiIndex:
    """Parse a .csi file. Names come from the aux blob (tabix-style) or the
    caller (BCF headers carry their own contig list)."""
    raw = decompress_all(data)
    if raw[:4] != b"CSI\x01":
        raise ValueError("not a CSI index")
    min_shift, depth, l_aux = struct.unpack_from("<3i", raw, 4)
    off = 16
    names: list[str] = []
    if l_aux >= 28:
        # tabix-format aux: 7 int32 config values + names blob
        (l_nm,) = struct.unpack_from("<i", raw, off + 24)
        blob = raw[off + 28: off + 28 + l_nm]
        names = [n.decode() for n in blob.split(b"\x00") if n]
    off += l_aux
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", raw, off)
        off += 4
        bins: dict[int, list[Chunk]] = {}
        for _ in range(n_bin):
            b, _loffset, n_chunk = struct.unpack_from("<IQi", raw, off)
            off += 16
            chunks = []
            for _ in range(n_chunk):
                vs, ve = struct.unpack_from("<QQ", raw, off)
                off += 16
                chunks.append(Chunk(vs, ve))
            bins[b] = chunks
        refs.append(BinIndex(bins, []))
    if contig_names:
        names = contig_names
    return CsiIndex(names, refs, min_shift, depth)


@dataclass
class BaiIndex:
    refs: list[BinIndex]  # indexed by BAM reference id

    def query(self, ref_id: int, region: Region) -> list[Chunk]:
        if ref_id < 0 or ref_id >= len(self.refs):
            return []
        return self.refs[ref_id].query(region.zero_start, region.excl_end)


def parse_bai(data: bytes) -> BaiIndex:
    """Parse a .bai file (plain binary, NOT bgzf). Content-cached."""
    return _parse_bai_cached(bytes(data))


@functools.lru_cache(maxsize=32)
def _parse_bai_cached(data: bytes) -> "BaiIndex":
    if data[:4] != b"BAI\x01":
        raise ValueError("not a BAI index")
    (n_ref,) = struct.unpack_from("<i", data, 4)
    off = 8
    refs = []
    for _ in range(n_ref):
        idx, off = _parse_binindex(data, off)
        refs.append(idx)
    return BaiIndex(refs)
