"""CRAM 3.0 primitive codecs: ITF8/LTF8 varints, block compression
(gzip/bzip2/lzma/rANS 4x8), core bit reader, and the CRAM encoding family
(EXTERNAL, HUFFMAN, BETA, GAMMA, SUBEXP, BYTE_ARRAY_LEN, BYTE_ARRAY_STOP).

From-scratch implementation of the public CRAM 3.0 specification
(samtools/hts-specs CRAMv3.pdf). The reference consumes these via the
``noodles-cram`` crate (exon-cram/Cargo.toml); here they are plain Python —
the fixtures are small and decode is IO-bound, with a native path reserved
for bulk workloads.
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..errors import ExonError


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------


class ByteReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def u32le(self) -> int:
        (v,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return v

    def i32le(self) -> int:
        (v,) = struct.unpack_from("<i", self.data, self.pos)
        self.pos += 4
        return v

    def itf8(self) -> int:
        b0 = self.u8()
        if b0 < 0x80:
            v = b0
        elif b0 < 0xC0:
            v = ((b0 & 0x7F) << 8) | self.u8()
        elif b0 < 0xE0:
            v = ((b0 & 0x3F) << 16) | (self.u8() << 8)
            v |= self.u8()
        elif b0 < 0xF0:
            v = ((b0 & 0x1F) << 24) | (self.u8() << 16)
            v |= self.u8() << 8
            v |= self.u8()
        else:
            v = ((b0 & 0x0F) << 28) | (self.u8() << 20)
            v |= self.u8() << 12
            v |= self.u8() << 4
            v |= self.u8() & 0x0F
        # signed 32-bit
        if v >= 1 << 31:
            v -= 1 << 32
        return v

    def ltf8(self) -> int:
        b0 = self.u8()
        if b0 < 0x80:
            n_extra, v = 0, b0
        elif b0 < 0xC0:
            n_extra, v = 1, b0 & 0x7F
        elif b0 < 0xE0:
            n_extra, v = 2, b0 & 0x3F
        elif b0 < 0xF0:
            n_extra, v = 3, b0 & 0x1F
        elif b0 < 0xF8:
            n_extra, v = 4, b0 & 0x0F
        elif b0 < 0xFC:
            n_extra, v = 5, b0 & 0x07
        elif b0 < 0xFE:
            n_extra, v = 6, b0 & 0x03
        elif b0 == 0xFE:
            n_extra, v = 7, 0
        else:
            n_extra, v = 8, 0
        for _ in range(n_extra):
            v = (v << 8) | self.u8()
        if v >= 1 << 63:
            v -= 1 << 64
        return v

    def itf8_array(self) -> list[int]:
        n = self.itf8()
        return [self.itf8() for _ in range(n)]

    def eof(self) -> bool:
        return self.pos >= len(self.data)


# ---------------------------------------------------------------------------
# rANS 4x8 (CRAM spec section 13)
# ---------------------------------------------------------------------------

RANS_L = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


def _read_freqs0(r: ByteReader) -> np.ndarray:
    """Order-0 frequency table: symbol RLE + ITF8 frequencies."""
    F = np.zeros(256, np.int64)
    sym = r.u8()
    last_sym = sym
    rle = 0
    while True:
        F[sym] = r.itf8()
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = r.u8()
            if sym == last_sym + 1:
                rle = r.u8()
        last_sym = sym
        if sym == 0 and rle == 0:
            # spec loop terminates when the next symbol byte is 0
            break
    return F


def _cumulative(F: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    C = np.zeros(257, np.int64)
    np.cumsum(F, out=C[1:])
    # slot → symbol lookup over TOTFREQ slots
    R = np.zeros(TOTFREQ, np.uint8)
    syms = np.flatnonzero(F)
    for s in syms:
        R[C[s]:C[s] + F[s]] = s
    return C, R


def rans4x8_decode(data: bytes) -> bytes:
    """Decode one rANS 4x8 stream (order byte + sizes + freqs + states)."""
    r = ByteReader(data)
    order = r.u8()
    _comp_size = r.u32le()
    n_out = r.u32le()
    if order == 0:
        return _rans0_decode(r, n_out)
    if order == 1:
        return _rans1_decode(r, n_out)
    raise ExonError(f"rANS4x8: unknown order {order}")


def _rans0_decode(r: ByteReader, n_out: int) -> bytes:
    F = _read_freqs0(r)
    C, R = _cumulative(F)
    data = r.data
    pos = r.pos
    S = list(struct.unpack_from("<4I", data, pos))
    pos += 16
    out = bytearray(n_out)
    Fl = F.tolist()
    Cl = C.tolist()
    Rl = R.tolist()
    nd = len(data)
    for i in range(n_out):
        j = i & 3
        st = S[j]
        f = st & (TOTFREQ - 1)
        s = Rl[f]
        out[i] = s
        st = Fl[s] * (st >> TF_SHIFT) + f - Cl[s]
        while st < RANS_L and pos < nd:
            st = (st << 8) | data[pos]
            pos += 1
        S[j] = st
    return bytes(out)


def _rans1_decode(r: ByteReader, n_out: int) -> bytes:
    # order-1: context tables, outer symbol RLE mirrors the inner one
    Fs = {}
    Cs = {}
    Rs = {}
    sym = r.u8()
    last_sym = sym
    rle = 0
    while True:
        F = _read_freqs0(r)
        C, Rt = _cumulative(F)
        Fs[sym] = F.tolist()
        Cs[sym] = C.tolist()
        Rs[sym] = Rt.tolist()
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = r.u8()
            if sym == last_sym + 1:
                rle = r.u8()
        last_sym = sym
        if sym == 0 and rle == 0:
            break
    data = r.data
    pos = r.pos
    S = list(struct.unpack_from("<4I", data, pos))
    pos += 16
    out = bytearray(n_out)
    isz4 = n_out >> 2
    ctx = [0, 0, 0, 0]
    nd = len(data)
    zeros = [0] * 256

    def tbl(d, c):
        t = d.get(c)
        return t if t is not None else zeros

    for i in range(isz4):
        for j in range(4):
            st = S[j]
            f = st & (TOTFREQ - 1)
            c = ctx[j]
            s = tbl(Rs, c)[f]
            out[j * isz4 + i] = s
            st = tbl(Fs, c)[s] * (st >> TF_SHIFT) + f - tbl(Cs, c)[s]
            while st < RANS_L and pos < nd:
                st = (st << 8) | data[pos]
                pos += 1
            S[j] = st
            ctx[j] = s
    # remainder handled by state 3
    for i in range(4 * isz4, n_out):
        st = S[3]
        f = st & (TOTFREQ - 1)
        c = ctx[3]
        s = tbl(Rs, c)[f]
        out[i] = s
        st = tbl(Fs, c)[s] * (st >> TF_SHIFT) + f - tbl(Cs, c)[s]
        while st < RANS_L and pos < nd:
            st = (st << 8) | data[pos]
            pos += 1
        S[3] = st
        ctx[3] = s
    return bytes(out)


# ---------------------------------------------------------------------------
# block decompression
# ---------------------------------------------------------------------------

METHOD_RAW, METHOD_GZIP, METHOD_BZIP2, METHOD_LZMA, METHOD_RANS = range(5)


def decompress_block(method: int, data: bytes, raw_size: int) -> bytes:
    if method == METHOD_RAW:
        return data
    if method == METHOD_GZIP:
        return zlib.decompress(data, wbits=zlib.MAX_WBITS | 32)
    if method == METHOD_BZIP2:
        return bz2.decompress(data)
    if method == METHOD_LZMA:
        return lzma.decompress(data)
    if method == METHOD_RANS:
        return rans4x8_decode(data)
    raise ExonError(f"CRAM: unsupported block compression method {method}")


# ---------------------------------------------------------------------------
# core bit reader (MSB first)
# ---------------------------------------------------------------------------


class BitReader:
    __slots__ = ("data", "byte_pos", "bit_pos")

    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0  # bits consumed in current byte

    def read_bit(self) -> int:
        b = self.data[self.byte_pos]
        bit = (b >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# ---------------------------------------------------------------------------
# encodings (CRAM spec section 12)
# ---------------------------------------------------------------------------

ENC_NULL, ENC_EXTERNAL, ENC_GOLOMB, ENC_HUFFMAN, ENC_BYTE_ARRAY_LEN, \
    ENC_BYTE_ARRAY_STOP, ENC_BETA, ENC_SUBEXP, ENC_GOLOMB_RICE, ENC_GAMMA = \
    range(10)


@dataclass
class EncodingSpec:
    codec: int
    params: bytes

    @classmethod
    def parse(cls, r: ByteReader) -> "EncodingSpec":
        codec = r.itf8()
        n = r.itf8()
        return cls(codec, r.read(n))


class Decoder:
    """Decodes one value per call, given the slice's streams."""

    def decode(self, core: BitReader, ext: dict[int, ByteReader]) -> int:
        raise NotImplementedError

    def decode_bytes(self, core: BitReader, ext: dict[int, ByteReader]
                     ) -> bytes:
        raise NotImplementedError


class NullDecoder(Decoder):
    def decode(self, core, ext):
        return 0

    def decode_bytes(self, core, ext):
        return b""


class ExternalDecoder(Decoder):
    def __init__(self, params: bytes):
        self.content_id = ByteReader(params).itf8()

    def decode(self, core, ext):
        return ext[self.content_id].itf8()

    def decode_byte(self, core, ext):
        return ext[self.content_id].u8()

    def read_n(self, ext, n: int) -> bytes:
        return ext[self.content_id].read(n)


class HuffmanDecoder(Decoder):
    """Canonical Huffman (spec 12.4). The common degenerate form — a single
    symbol with code length 0 — decodes to a constant without consuming
    bits."""

    def __init__(self, params: bytes):
        r = ByteReader(params)
        self.symbols = r.itf8_array()
        self.lengths = r.itf8_array()
        self.constant = None
        if len(self.symbols) == 1 and self.lengths[0] == 0:
            self.constant = self.symbols[0]
            return
        # canonical code assignment: sort by (length, symbol value) —
        # htslib cram_codecs.c code_sort semantics
        order = sorted(range(len(self.symbols)),
                       key=lambda i: (self.lengths[i], self.symbols[i]))
        codes = {}
        code = 0
        prev_len = 0
        for i in order:
            ln = self.lengths[i]
            code <<= (ln - prev_len)
            codes[(ln, code)] = self.symbols[i]
            code += 1
            prev_len = ln
        self.codes = codes
        self.max_len = max(self.lengths)

    def decode(self, core, ext):
        if self.constant is not None:
            return self.constant
        code = 0
        ln = 0
        while ln <= self.max_len:
            code = (code << 1) | core.read_bit()
            ln += 1
            sym = self.codes.get((ln, code))
            if sym is not None:
                return sym
        raise ExonError("CRAM: bad Huffman code")


class BetaDecoder(Decoder):
    def __init__(self, params: bytes):
        r = ByteReader(params)
        self.offset = r.itf8()
        self.nbits = r.itf8()

    def decode(self, core, ext):
        return core.read_bits(self.nbits) - self.offset


class GammaDecoder(Decoder):
    def __init__(self, params: bytes):
        self.offset = ByteReader(params).itf8()

    def decode(self, core, ext):
        n = 0
        while core.read_bit() == 0:
            n += 1
        v = 1
        for _ in range(n):
            v = (v << 1) | core.read_bit()
        return v - 1 - self.offset


class SubExpDecoder(Decoder):
    def __init__(self, params: bytes):
        r = ByteReader(params)
        self.offset = r.itf8()
        self.k = r.itf8()

    def decode(self, core, ext):
        i = 0
        while core.read_bit() == 1:
            i += 1
        if i == 0:
            n = self.k
            u = core.read_bits(n)
        else:
            n = i + self.k - 1
            u = (1 << n) | core.read_bits(n)
        return u - self.offset


class ByteArrayLenDecoder(Decoder):
    def __init__(self, params: bytes):
        r = ByteReader(params)
        self.len_dec = make_decoder(EncodingSpec.parse(r))
        self.val_dec = make_decoder(EncodingSpec.parse(r))

    def decode_bytes(self, core, ext):
        n = self.len_dec.decode(core, ext)
        vd = self.val_dec
        if isinstance(vd, ExternalDecoder):
            return vd.read_n(ext, n)
        return bytes(vd.decode(core, ext) & 0xFF for _ in range(n))


class ByteArrayStopDecoder(Decoder):
    def __init__(self, params: bytes):
        r = ByteReader(params)
        self.stop = r.u8()
        self.content_id = r.itf8()

    def decode_bytes(self, core, ext):
        stream = ext[self.content_id]
        data = stream.data
        start = stream.pos
        idx = data.find(self.stop, start)
        if idx < 0:
            idx = len(data)
        stream.pos = idx + 1
        return data[start:idx]


def make_decoder(spec: EncodingSpec) -> Decoder:
    if spec.codec == ENC_NULL:
        return NullDecoder()
    if spec.codec == ENC_EXTERNAL:
        return ExternalDecoder(spec.params)
    if spec.codec == ENC_HUFFMAN:
        return HuffmanDecoder(spec.params)
    if spec.codec == ENC_BETA:
        return BetaDecoder(spec.params)
    if spec.codec == ENC_GAMMA:
        return GammaDecoder(spec.params)
    if spec.codec == ENC_SUBEXP:
        return SubExpDecoder(spec.params)
    if spec.codec == ENC_BYTE_ARRAY_LEN:
        return ByteArrayLenDecoder(spec.params)
    if spec.codec == ENC_BYTE_ARRAY_STOP:
        return ByteArrayStopDecoder(spec.params)
    raise ExonError(f"CRAM: unsupported encoding codec {spec.codec}")


def decode_byte(dec: Decoder, core: BitReader, ext: dict[int, ByteReader]
                ) -> int:
    """Decode a single byte value (BA/QS/FC-style series): EXTERNAL reads a
    raw byte, others decode an int."""
    if isinstance(dec, ExternalDecoder):
        return dec.decode_byte(core, ext)
    return dec.decode(core, ext)
