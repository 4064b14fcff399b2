"""BGZF (blocked gzip) reading/writing with virtual positions.

Replaces the reference's streaming_bgzf.rs (AsyncBGZFReader::
scan_to_virtual_position, streaming_bgzf.rs:56-118) and noodles-bgzf usage.

A virtual position packs (compressed_block_offset << 16) | within_block
uncompressed offset. Index chunk reads decompress only the needed blocks —
the byte-range pruning that makes region queries index-driven.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def coffset(vpos: int) -> int:
    return vpos >> 16


def uoffset(vpos: int) -> int:
    return vpos & 0xFFFF


def make_vpos(comp: int, unc: int) -> int:
    return (comp << 16) | unc


@dataclass
class BlockInfo:
    comp_offset: int
    comp_size: int
    data: bytes  # decompressed


def read_block(buf: bytes, offset: int) -> BlockInfo:
    """Parse + decompress one BGZF block starting at ``offset``."""
    if buf[offset:offset + 2] != b"\x1f\x8b":
        raise ValueError(f"not a gzip block at {offset}")
    xlen = struct.unpack_from("<H", buf, offset + 10)[0]
    extra = buf[offset + 12: offset + 12 + xlen]
    bsize = None
    i = 0
    while i + 4 <= len(extra):
        si1, si2 = extra[i], extra[i + 1]
        slen = struct.unpack_from("<H", extra, i + 2)[0]
        if si1 == 66 and si2 == 67:  # 'BC'
            bsize = struct.unpack_from("<H", extra, i + 4)[0] + 1
            break
        i += 4 + slen
    if bsize is None:
        raise ValueError(f"missing BGZF BC subfield at {offset}")
    cdata_start = offset + 12 + xlen
    cdata_end = offset + bsize - 8
    data = zlib.decompress(buf[cdata_start:cdata_end], -15)
    return BlockInfo(offset, bsize, data)


def decompress_range(buf: bytes, vstart: int, vend: int) -> bytes:
    """Decompress the uncompressed byte range [vstart, vend) given the
    containing compressed buffer (virtual positions)."""
    out = []
    pos = coffset(vstart)
    first = True
    while pos < len(buf):
        blk = read_block(buf, pos)
        lo = uoffset(vstart) if first else 0
        if pos == coffset(vend):
            out.append(blk.data[lo: uoffset(vend)])
            break
        if pos > coffset(vend):
            break
        out.append(blk.data[lo:])
        pos += blk.comp_size
        first = False
        if blk.comp_size == 0:
            break
    return b"".join(out)


def decompress_all(buf: bytes) -> bytes:
    """Decompress a whole BGZF stream (multi-member gzip fast path)."""
    import gzip

    return gzip.decompress(buf)


def compress_bgzf(data: bytes, block_size: int = 0xFF00, level: int = 6) -> bytes:
    """Compress data into BGZF blocks + EOF marker (writer path)."""
    out = []
    for lo in range(0, len(data), block_size):
        chunk = data[lo:lo + block_size]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25 + 1
        header = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 +
                  struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2) +
                  struct.pack("<H", bsize - 1))
        trailer = struct.pack("<II", zlib.crc32(chunk), len(chunk))
        out.append(header + cdata + trailer)
    out.append(BGZF_EOF)
    return b"".join(out)
