"""CRAM 3.0 decoder: reference-compressed alignments → columnar batches.

Parity: exon-cram + exon-core/src/datasources/cram/ (which wrap
``noodles-cram``). Schema matches the SAM family default
(exon-sam/src/schema_builder.rs:370-400): ``name, flag Int32,
reference Utf8, start, end, mapping_quality Utf8, cigar, mate_reference,
sequence, quality_score List<Int64>, tags`` — tags is
``List<Struct{tag,value}>`` by default or a per-tag Struct when
``cram_parse_tags`` is set (with_tags_data_type_from_data,
schema_builder.rs:70-349).

From-scratch implementation of the public CRAM 3.0 container format:
file definition → containers → compression header (preservation map, data
series encodings, tag encodings) → slices (core bit stream + external
blocks) → per-record feature decode with reference-based sequence
reconstruction (fasta_reference + .fai, or embedded reference blocks) and
intra-slice mate resolution. ``.crai`` indexes drive region-query container
pruning (ListingCRAMTableOptions indexed path,
exon-core/src/datasources/cram/indexed_file_opener.rs).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from .. import datatypes as dt
from ..batch import (Batch, FixedColumn, ListColumn, Schema, StructColumn,
                     VarColumn, batch_from_host, utf8_column)
from ..errors import ExonError
from .cram_codecs import (BitReader, ByteReader, Decoder, EncodingSpec,
                          ExternalDecoder, decode_byte, decompress_block,
                          make_decoder)

BASES = b"ACGTN"

CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_SLICE_HEADER, _CT_RESERVED, \
    CT_EXTERNAL, CT_CORE = range(6)


@dataclass
class CramOptions:
    file_extension: str = ".cram"
    batch_size: int = 8192
    parse_tags: bool = False
    fasta_reference: Optional[str] = None
    indexed: bool = False
    projection: Optional[list[str]] = None
    regions: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# container structure
# ---------------------------------------------------------------------------


@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    data: bytes  # decompressed


def read_block(r: ByteReader) -> Block:
    method = r.u8()
    ctype = r.u8()
    content_id = r.itf8()
    comp_size = r.itf8()
    raw_size = r.itf8()
    payload = r.read(comp_size)
    r.pos += 4  # CRC32
    return Block(method, ctype, content_id,
                 decompress_block(method, payload, raw_size))


@dataclass
class ContainerHeader:
    length: int
    ref_seq_id: int
    start_pos: int
    align_span: int
    n_records: int
    record_counter: int
    bases: int
    n_blocks: int
    landmarks: list[int]


def read_container_header(r: ByteReader) -> ContainerHeader:
    length = r.i32le()
    ref_seq_id = r.itf8()
    start = r.itf8()
    span = r.itf8()
    n_records = r.itf8()
    counter = r.ltf8()
    bases = r.ltf8()
    n_blocks = r.itf8()
    landmarks = r.itf8_array()
    r.pos += 4  # CRC32 (CRAM 3.0)
    return ContainerHeader(length, ref_seq_id, start, span, n_records,
                           counter, bases, n_blocks, landmarks)


@dataclass
class Preservation:
    read_names: bool = True
    ap_delta: bool = True
    ref_required: bool = True
    sub_matrix: bytes = b"\x00" * 5
    tag_lines: list[list[tuple[str, str]]] = field(default_factory=list)


# CRAM 3.0 data series two-char keys
_DS_KEYS = ("BF CF RI RL AP RG RN MF NS NP TS NF TL FN FC FP DL BB QQ BS "
            "IN SC HC PD RS BA QS MQ TC TN TM TV").split()


@dataclass
class CompressionHeader:
    preservation: Preservation
    ds: dict[str, Decoder]
    tag_decoders: dict[int, Decoder]
    sub_codes: dict[int, bytes]  # ref base → 4 alternatives ordered by code


def parse_compression_header(data: bytes) -> CompressionHeader:
    r = ByteReader(data)
    pres = Preservation()
    # preservation map
    _size = r.itf8()
    n = r.itf8()
    for _ in range(n):
        key = r.read(2).decode()
        if key == "RN":
            pres.read_names = bool(r.u8())
        elif key == "AP":
            pres.ap_delta = bool(r.u8())
        elif key == "RR":
            pres.ref_required = bool(r.u8())
        elif key == "SM":
            pres.sub_matrix = r.read(5)
        elif key == "TD":
            ln = r.itf8()
            td = r.read(ln)
            pres.tag_lines = _parse_td(td)
        else:
            raise ExonError(f"CRAM: unknown preservation key {key!r}")
    # data series encodings
    _size = r.itf8()
    n = r.itf8()
    ds: dict[str, Decoder] = {}
    for _ in range(n):
        key = r.read(2).decode()
        spec = EncodingSpec.parse(r)
        ds[key] = make_decoder(spec)
    # tag encodings
    _size = r.itf8()
    n = r.itf8()
    tag_decoders: dict[int, Decoder] = {}
    for _ in range(n):
        key = r.itf8()
        spec = EncodingSpec.parse(r)
        tag_decoders[key] = make_decoder(spec)
    # substitution matrix: byte per ref base; 2-bit code per alternative,
    # alternatives in ACGTN-minus-ref order, code at bits (6 - 2k)
    sub_codes: dict[int, bytes] = {}
    for ri, ref_base in enumerate(BASES):
        byte = pres.sub_matrix[ri]
        alts = bytes(b for b in BASES if b != ref_base)
        by_code = bytearray(4)
        for k, alt in enumerate(alts):
            code = (byte >> (6 - 2 * k)) & 3
            by_code[code] = alt
        sub_codes[ref_base] = bytes(by_code)
    return CompressionHeader(pres, ds, tag_decoders, sub_codes)


def _parse_td(td: bytes) -> list[list[tuple[str, str]]]:
    lines = []
    for chunk in td.split(b"\x00"):
        line = []
        for i in range(0, len(chunk) - 2, 3):
            tag = chunk[i:i + 2].decode()
            typ = chr(chunk[i + 2])
            line.append((tag, typ))
        lines.append(line)
    if lines and lines[-1] == []:
        lines.pop()  # trailing separator
    return lines


@dataclass
class SliceHeader:
    ref_seq_id: int
    align_start: int
    align_span: int
    n_records: int
    record_counter: int
    n_blocks: int
    content_ids: list[int]
    embedded_ref_id: int


def parse_slice_header(data: bytes) -> SliceHeader:
    r = ByteReader(data)
    return SliceHeader(
        ref_seq_id=r.itf8(), align_start=r.itf8(), align_span=r.itf8(),
        n_records=r.itf8(), record_counter=r.ltf8(), n_blocks=r.itf8(),
        content_ids=r.itf8_array(), embedded_ref_id=r.itf8())


# ---------------------------------------------------------------------------
# reference repository
# ---------------------------------------------------------------------------


class FastaRepository:
    """Reference FASTA access by name, .fai-aware — the
    ObjectStoreFastaRepositoryAdapter analog
    (exon-cram/src/object_store_fasta_repository_adapter.rs:21-70)."""

    def __init__(self, store, path: str):
        self.store = store
        self.path = path
        self._cache: dict[str, bytes] = {}
        self._fai = None
        self._full: Optional[dict[str, bytes]] = None
        if not store.exists(path):
            raise ExonError(f"CRAM: reference FASTA not found: {path}")

    def get(self, name: str) -> bytes:
        # NOTE: .fai byte offsets are deliberately NOT used for slicing —
        # the reference adapter also only consults the index for name
        # lookup and re-reads the FASTA itself
        # (object_store_fasta_repository_adapter.rs:103-135), and fixture
        # .fai files exist whose offsets disagree with the file.
        if name in self._cache:
            return self._cache[name]
        if self._full is None:
            self._full = {}
            cur = None
            parts: list[bytes] = []
            for line in self.store.get(self.path).split(b"\n"):
                if line.startswith(b">"):
                    if cur is not None:
                        self._full[cur] = b"".join(parts)
                    cur = line[1:].split()[0].decode()
                    parts = []
                else:
                    parts.append(line.strip())
            if cur is not None:
                self._full[cur] = b"".join(parts)
        if name not in self._full:
            raise ExonError(f"CRAM: reference sequence {name!r} "
                            f"not in {self.path}")
        seq = self._full[name].upper()
        self._cache[name] = seq
        return seq


# ---------------------------------------------------------------------------
# record decode
# ---------------------------------------------------------------------------


@dataclass
class CramRecord:
    bf: int = 0
    cf: int = 0
    ref_id: int = -1
    read_len: int = 0
    apos: int = 0
    rg: int = -1
    name: Optional[bytes] = None
    mf: int = 0
    mate_ref_id: int = -1
    mate_pos: int = 0
    template_size: int = 0
    nf: int = 0
    tags: list = field(default_factory=list)  # (tag, type, value)
    mq: int = 255
    seq: bytes = b""
    quals: Optional[bytes] = None
    cigar: str = ""
    ref_span: int = 0  # reference bases consumed


_FEATURE_BYTES = {ord("I"): "IN", ord("S"): "SC", ord("b"): "BB",
                  ord("q"): "QQ"}


def _decode_tag_value(typ: str, raw: bytes):
    if typ in ("c",):
        return struct.unpack("<b", raw[:1])[0]
    if typ in ("C", "A"):
        return raw[0] if typ == "C" else chr(raw[0])
    if typ == "s":
        return struct.unpack("<h", raw[:2])[0]
    if typ == "S":
        return struct.unpack("<H", raw[:2])[0]
    if typ == "i":
        return struct.unpack("<i", raw[:4])[0]
    if typ == "I":
        return struct.unpack("<I", raw[:4])[0]
    if typ == "f":
        return struct.unpack("<f", raw[:4])[0]
    if typ == "Z":
        return raw.rstrip(b"\x00").decode("utf-8", "replace")
    if typ == "H":
        return raw.rstrip(b"\x00").decode("ascii", "replace")
    if typ == "B":
        sub = chr(raw[0])
        (cnt,) = struct.unpack("<I", raw[1:5])
        fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I",
               "f": "f"}[sub]
        vals = struct.unpack(f"<{cnt}{fmt}", raw[5:5 + cnt *
                                                 struct.calcsize(fmt)])
        return sub + "," + ",".join(str(v) for v in vals)
    return raw.decode("utf-8", "replace")


def render_tag_value(v) -> str:
    if isinstance(v, float):
        s = f"{v:g}"
        return s
    return str(v)


class SliceDecoder:
    def __init__(self, comp: CompressionHeader, sl: SliceHeader,
                 core: BitReader, ext: dict[int, ByteReader],
                 ref_getter, ref_names: list[str],
                 embedded_ref: Optional[bytes]):
        self.comp = comp
        self.sl = sl
        self.core = core
        self.ext = ext
        self.ref_getter = ref_getter
        self.ref_names = ref_names
        self.embedded_ref = embedded_ref
        self._ref_cache: dict[int, Optional[bytes]] = {}

    def _ds(self, key: str) -> Decoder:
        dec = self.comp.ds.get(key)
        if dec is None:
            raise ExonError(f"CRAM: missing data series encoding {key}")
        return dec

    def _int(self, key: str) -> int:
        return self._ds(key).decode(self.core, self.ext)

    def _byte(self, key: str) -> int:
        return decode_byte(self._ds(key), self.core, self.ext)

    def _bytes(self, key: str) -> bytes:
        return self._ds(key).decode_bytes(self.core, self.ext)

    def _ref_bases(self, ref_id: int) -> Optional[bytes]:
        if ref_id < 0:
            return None
        if ref_id in self._ref_cache:
            return self._ref_cache[ref_id]
        seq = None
        if self.embedded_ref is not None:
            seq = None  # embedded handled positionally in _ref_slice
        elif self.ref_getter is not None and ref_id < len(self.ref_names):
            seq = self.ref_getter(self.ref_names[ref_id])
        self._ref_cache[ref_id] = seq
        return seq

    def _ref_slice(self, ref_id: int, pos1: int, ln: int) -> bytes:
        """ln reference bases starting at 1-based pos1."""
        if ln <= 0:
            return b""
        if self.embedded_ref is not None:
            off = pos1 - self.sl.align_start
            if off < 0:
                raise ExonError("CRAM: embedded reference underflow")
            chunk = self.embedded_ref[off:off + ln]
        else:
            seq = self._ref_bases(ref_id)
            if seq is None:
                if self.comp.preservation.ref_required:
                    raise ExonError(
                        "CRAM: reference sequence required but not "
                        "available (set fasta_reference)")
                return b"N" * ln
            chunk = seq[pos1 - 1:pos1 - 1 + ln]
        if len(chunk) < ln:
            chunk = chunk + b"N" * (ln - len(chunk))
        return chunk

    def decode_records(self) -> list[CramRecord]:
        records: list[CramRecord] = []
        prev_apos = self.sl.align_start
        pres = self.comp.preservation
        counter = self.sl.record_counter
        for _ in range(self.sl.n_records):
            rec = CramRecord()
            rec.bf = self._int("BF")
            rec.cf = self._int("CF")
            if self.sl.ref_seq_id == -2:
                rec.ref_id = self._int("RI")
            else:
                rec.ref_id = self.sl.ref_seq_id
            rec.read_len = self._int("RL")
            ap = self._int("AP")
            if pres.ap_delta:
                rec.apos = prev_apos + ap
                prev_apos = rec.apos
            else:
                rec.apos = ap
            rec.rg = self._int("RG")
            if pres.read_names:
                rec.name = self._bytes("RN")
            if rec.cf & 0x2:  # detached
                rec.mf = self._int("MF")
                if not pres.read_names:
                    rec.name = self._bytes("RN")
                rec.mate_ref_id = self._int("NS")
                rec.mate_pos = self._int("NP")
                rec.template_size = self._int("TS")
                if rec.mf & 0x1:
                    rec.bf |= 0x20  # mate reverse strand
                if rec.mf & 0x2:
                    rec.bf |= 0x8   # mate unmapped
            elif rec.cf & 0x4:  # mate downstream in this slice
                rec.nf = self._int("NF")
            if rec.name is None:
                rec.name = str(counter).encode()
            counter += 1
            # tags
            tl = self._int("TL")
            if 0 <= tl < len(pres.tag_lines):
                for tag, typ in pres.tag_lines[tl]:
                    key = (ord(tag[0]) << 16) | (ord(tag[1]) << 8) | ord(typ)
                    dec = self.comp.tag_decoders.get(key)
                    if dec is None:
                        raise ExonError(f"CRAM: missing tag encoding "
                                        f"{tag}:{typ}")
                    raw = dec.decode_bytes(self.core, self.ext)
                    rec.tags.append((tag, typ, _decode_tag_value(typ, raw)))
            if not (rec.bf & 0x4):
                self._decode_mapped(rec)
            else:
                self._decode_unmapped(rec)
            records.append(rec)
        self._resolve_mates(records)
        return records

    # -- mapped reads: feature decode + sequence reconstruction ------------

    def _decode_mapped(self, rec: CramRecord) -> None:
        n_features = self._int("FN")
        seq = bytearray()
        quals = bytearray(b"\xff" * rec.read_len)
        cigar_ops: list[tuple[int, str]] = []
        read_pos = 1   # 1-based position in read
        ref_pos = rec.apos
        fpos = 0
        sub_codes = self.comp.sub_codes

        def add_op(n: int, op: str) -> None:
            if n <= 0:
                return
            if cigar_ops and cigar_ops[-1][1] == op:
                cigar_ops[-1] = (cigar_ops[-1][0] + n, op)
            else:
                cigar_ops.append((n, op))

        for _ in range(n_features):
            fc = chr(self._byte("FC"))
            fpos += self._int("FP")
            # copy reference-matching gap before this feature; quality-only
            # features ('Q'/'q') may address positions already consumed by
            # an insertion, so the gap clamps at zero
            gap = fpos - read_pos
            if gap > 0:
                seq += self._ref_slice(rec.ref_id, ref_pos, gap)
                add_op(gap, "M")
                read_pos += gap
                ref_pos += gap
            if fc == "B":
                base = self._byte("BA")
                q = self._byte("QS")
                seq.append(base)
                quals[read_pos - 1] = q
                add_op(1, "M")
                read_pos += 1
                ref_pos += 1
            elif fc == "X":
                code = self._byte("BS")
                ref_base = self._ref_slice(rec.ref_id, ref_pos, 1)
                alts = sub_codes.get(ref_base[0] if ref_base else ord("N"),
                                     b"NNNN")
                seq.append(alts[code & 3])
                add_op(1, "M")
                read_pos += 1
                ref_pos += 1
            elif fc == "D":
                ln = self._int("DL")
                add_op(ln, "D")
                ref_pos += ln
            elif fc == "I":
                ins = self._bytes("IN")
                seq += ins
                add_op(len(ins), "I")
                read_pos += len(ins)
            elif fc == "S":
                sc = self._bytes("SC")
                seq += sc
                add_op(len(sc), "S")
                read_pos += len(sc)
            elif fc == "H":
                ln = self._int("HC")
                add_op(ln, "H")
            elif fc == "P":
                ln = self._int("PD")
                add_op(ln, "P")
            elif fc == "N":
                ln = self._int("RS")
                add_op(ln, "N")
                ref_pos += ln
            elif fc == "i":
                base = self._byte("BA")
                seq.append(base)
                add_op(1, "I")
                read_pos += 1
            elif fc == "b":
                bb = self._bytes("BB")
                seq += bb
                add_op(len(bb), "M")
                read_pos += len(bb)
                ref_pos += len(bb)
            elif fc == "q":
                qq = self._bytes("QQ")
                quals[fpos - 1:fpos - 1 + len(qq)] = qq
            elif fc == "Q":
                if 0 < fpos <= rec.read_len:
                    quals[fpos - 1] = self._byte("QS")
                else:
                    self._byte("QS")
            else:
                raise ExonError(f"CRAM: unknown feature code {fc!r}")
        # trailing reference match
        tail = rec.read_len - read_pos + 1
        if tail > 0:
            seq += self._ref_slice(rec.ref_id, ref_pos, tail)
            add_op(tail, "M")
            ref_pos += tail
        rec.mq = self._int("MQ")
        if rec.cf & 0x1:  # quality scores stored verbatim
            qs = self._ds("QS")
            if isinstance(qs, ExternalDecoder):
                quals = bytearray(qs.read_n(self.ext, rec.read_len))
            else:
                quals = bytearray(decode_byte(qs, self.core, self.ext)
                                  for _ in range(rec.read_len))
        rec.seq = bytes(seq[:rec.read_len])
        rec.quals = bytes(quals) if any(q != 0xFF for q in quals) else None
        rec.cigar = "".join(f"{n}{op}" for n, op in cigar_ops)
        rec.ref_span = ref_pos - rec.apos

    def _decode_unmapped(self, rec: CramRecord) -> None:
        ba = self._ds("BA")
        if isinstance(ba, ExternalDecoder):
            rec.seq = ba.read_n(self.ext, rec.read_len)
        else:
            rec.seq = bytes(decode_byte(ba, self.core, self.ext)
                            for _ in range(rec.read_len))
        if rec.cf & 0x1:
            qs = self._ds("QS")
            if isinstance(qs, ExternalDecoder):
                rec.quals = qs.read_n(self.ext, rec.read_len)
            else:
                rec.quals = bytes(decode_byte(qs, self.core, self.ext)
                                  for _ in range(rec.read_len))
        rec.cigar = ""
        rec.ref_span = 0

    # -- intra-slice mate resolution (htslib cram_decode restore_mate_info)

    def _resolve_mates(self, records: list[CramRecord]) -> None:
        n = len(records)
        mate_of: dict[int, int] = {}
        for i, rec in enumerate(records):
            if rec.cf & 0x4:
                j = i + rec.nf + 1
                if 0 <= j < n:
                    mate_of[i] = j
        # close chains: the last fragment points back to the chain head
        heads = set(mate_of.keys()) - set(mate_of.values())
        for head in heads:
            tail = head
            seen = {head}
            while tail in mate_of and mate_of[tail] not in seen:
                tail = mate_of[tail]
                seen.add(tail)
            if tail != head:
                mate_of.setdefault(tail, head)
        for i, j in mate_of.items():
            a, b = records[i], records[j]
            a.mate_ref_id = b.ref_id
            a.mate_pos = b.apos
            if b.bf & 0x10:
                a.bf |= 0x20
            if b.bf & 0x4:
                a.bf |= 0x8


# ---------------------------------------------------------------------------
# file-level iteration
# ---------------------------------------------------------------------------


@dataclass
class CramFile:
    version: tuple[int, int]
    header_text: str
    ref_names: list[str]
    containers_start: int


def parse_file_header(data: bytes) -> CramFile:
    if data[:4] != b"CRAM":
        raise ExonError("not a CRAM file (bad magic)")
    major, minor = data[4], data[5]
    r = ByteReader(data, 26)
    ch = read_container_header(r)
    end = r.pos + ch.length
    block = read_block(r)
    if block.content_type != CT_FILE_HEADER:
        raise ExonError("CRAM: first block is not the file header")
    br = ByteReader(block.data)
    text_len = br.i32le()
    text = br.read(text_len).decode("utf-8", "replace")
    names = []
    for line in text.split("\n"):
        if line.startswith("@SQ"):
            for part in line.split("\t"):
                if part.startswith("SN:"):
                    names.append(part[3:])
    return CramFile((major, minor), text, names, end)


EOF_START_POS = 4542278


def iter_containers(data: bytes, start: int
                    ) -> Iterator[tuple[int, ContainerHeader, ByteReader]]:
    pos = start
    n = len(data)
    while pos < n:
        r = ByteReader(data, pos)
        try:
            ch = read_container_header(r)
        except (IndexError, struct.error):
            return
        body_end = r.pos + ch.length
        if ch.ref_seq_id == -1 and ch.start_pos == EOF_START_POS:
            return  # EOF container
        yield pos, ch, r
        pos = body_end


def decode_container(ch: ContainerHeader, r: ByteReader, ref_getter,
                     ref_names: list[str]) -> list[CramRecord]:
    """Decode every slice in one container."""
    if ch.n_records == 0:
        return []
    first = read_block(r)
    if first.content_type != CT_COMPRESSION_HEADER:
        raise ExonError("CRAM: expected compression header block")
    comp = parse_compression_header(first.data)
    records: list[CramRecord] = []
    blocks_read = 1
    while blocks_read < ch.n_blocks:
        sh_block = read_block(r)
        blocks_read += 1
        if sh_block.content_type != CT_SLICE_HEADER:
            continue
        sl = parse_slice_header(sh_block.data)
        core: Optional[BitReader] = None
        ext: dict[int, ByteReader] = {}
        embedded = None
        for _ in range(sl.n_blocks):
            b = read_block(r)
            blocks_read += 1
            if b.content_type == CT_CORE:
                core = BitReader(b.data)
            elif b.content_type == CT_EXTERNAL:
                ext[b.content_id] = ByteReader(b.data)
                if b.content_id == sl.embedded_ref_id:
                    embedded = b.data
        if core is None:
            core = BitReader(b"")
        dec = SliceDecoder(comp, sl, core, ext, ref_getter, ref_names,
                           embedded)
        records.extend(dec.decode_records())
    return records


# ---------------------------------------------------------------------------
# schema + batches
# ---------------------------------------------------------------------------

TAGS_TYPE = dt.list_(dt.struct([dt.Field("tag", dt.utf8, False),
                                dt.Field("value", dt.utf8, True)]))


def cram_schema(options=None, tag_fields: Optional[list] = None) -> Schema:
    fields = [
        dt.Field("name", dt.utf8, nullable=False),
        dt.Field("flag", dt.int32, nullable=False),
        dt.Field("reference", dt.utf8, nullable=True),
        dt.Field("start", dt.int64, nullable=True),
        dt.Field("end", dt.int64, nullable=True),
        dt.Field("mapping_quality", dt.utf8, nullable=True),
        dt.Field("cigar", dt.utf8, nullable=False),
        dt.Field("mate_reference", dt.utf8, nullable=True),
        dt.Field("sequence", dt.utf8, nullable=False),
        dt.Field("quality_score", dt.list_(dt.int64), nullable=False),
    ]
    if tag_fields is not None:
        fields.append(dt.Field("tags", dt.struct(tag_fields), nullable=True))
    else:
        fields.append(dt.Field("tags", TAGS_TYPE, nullable=True))
    return Schema.of(*fields)


_TAG_FIELD_TYPES = {"c": dt.int64, "C": dt.int64, "s": dt.int64,
                    "S": dt.int64, "i": dt.int64, "I": dt.int64,
                    "f": dt.float32}


def infer_tag_fields(records: list[CramRecord]) -> list:
    """Per-tag struct fields from the first record with tags
    (with_tags_data_type_from_data, exon-sam schema_builder.rs:70-349)."""
    for rec in records:
        if rec.tags:
            return [dt.Field(tag, _TAG_FIELD_TYPES.get(typ, dt.utf8), True)
                    for tag, typ, _ in rec.tags]
    return []


def records_to_batch(records: list[CramRecord], ref_names: list[str],
                     schema: Schema, proj: list[str],
                     parse_tags: bool) -> Batch:
    n = len(records)
    cols = []
    for name in proj:
        if name == "name":
            cols.append(utf8_column([r.name.decode("utf-8", "replace")
                                     for r in records]))
        elif name == "flag":
            cols.append(FixedColumn(
                np.array([r.bf for r in records], np.int32),
                np.ones(n, bool)))
        elif name in ("reference", "mate_reference"):
            ids = [(r.ref_id if name == "reference" else r.mate_ref_id)
                   for r in records]
            cols.append(utf8_column([
                ref_names[i] if 0 <= i < len(ref_names) else None
                for i in ids]))
        elif name == "start":
            vals = np.array([r.apos for r in records], np.int64)
            valid = np.array([not (r.bf & 0x4) and r.apos > 0
                              for r in records], bool)
            cols.append(FixedColumn(vals, valid))
        elif name == "end":
            vals = np.array([r.apos + max(r.ref_span - 1, 0)
                             for r in records], np.int64)
            valid = np.array([not (r.bf & 0x4) and r.apos > 0
                              for r in records], bool)
            cols.append(FixedColumn(vals, valid))
        elif name == "mapping_quality":
            cols.append(utf8_column([
                None if (r.mq == 255 or (r.bf & 0x4)) else str(r.mq)
                for r in records]))
        elif name == "cigar":
            cols.append(utf8_column([r.cigar for r in records]))
        elif name == "sequence":
            cols.append(utf8_column([r.seq.decode("ascii", "replace")
                                     for r in records]))
        elif name == "quality_score":
            lens = np.array([len(r.quals) if r.quals else 0 for r in records],
                            np.int64)
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            flat = np.frombuffer(
                b"".join(r.quals for r in records if r.quals), np.uint8
            ).astype(np.int64) if offs[-1] else np.zeros(0, np.int64)
            cols.append(VarColumn(flat, offs.astype(np.int32),
                                  np.ones(n, bool)))
        elif name == "tags":
            cols.append(_tags_column(records, schema, parse_tags))
        else:
            raise KeyError(name)
    return batch_from_host(schema.project(proj), cols, n)


def _tags_column(records: list[CramRecord], schema: Schema, parse_tags: bool):
    n = len(records)
    if parse_tags:
        field_ = next(f for f in schema.fields if f.name == "tags")
        children = {}
        for f in field_.dtype.children:
            vals = []
            for r in records:
                v = next((v for t, _ty, v in r.tags if t == f.name), None)
                vals.append(v)
            if f.dtype == dt.int64:
                arr = np.array([0 if v is None else int(v) for v in vals],
                               np.int64)
                children[f.name] = FixedColumn(
                    arr, np.array([v is not None for v in vals], bool))
            elif f.dtype == dt.float32:
                arr = np.array([0.0 if v is None else float(v)
                                for v in vals], np.float32)
                children[f.name] = FixedColumn(
                    arr, np.array([v is not None for v in vals], bool))
            else:
                children[f.name] = utf8_column(
                    [None if v is None else render_tag_value(v)
                     for v in vals])
        return StructColumn(children, np.ones(n, bool))
    # List<Struct{tag, value}>
    counts = np.array([len(r.tags) for r in records], np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    flat_tags = [t for r in records for t, _ty, _v in r.tags]
    flat_vals = [render_tag_value(v) for r in records for _t, _ty, v in r.tags]
    child = StructColumn({"tag": utf8_column(flat_tags),
                          "value": utf8_column(flat_vals)},
                         np.ones(int(offs[-1]), bool))
    return ListColumn(child, offs.astype(np.int32), np.ones(n, bool))


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_host(data: bytes, options: CramOptions,
                projection: Optional[list[str]] = None,
                store=None) -> Iterator[Batch]:
    cf = parse_file_header(data)
    ref_getter = None
    if options.fasta_reference:
        from ..io.object_store import get_store

        if store is None:
            store, ref_path = get_store(options.fasta_reference)
        else:
            ref_path = options.fasta_reference
        repo = FastaRepository(store, ref_path)
        ref_getter = repo.get
    records: list[CramRecord] = []
    tag_fields = None
    schema = None
    for _off, ch, r in iter_containers(data, cf.containers_start):
        records.extend(decode_container(ch, r, ref_getter, cf.ref_names))
    if options.parse_tags:
        tag_fields = infer_tag_fields(records)
    schema = cram_schema(options, tag_fields)
    proj = list(projection) if projection is not None else schema.names
    proj = [p for p in proj if p in schema.names]
    bs = options.batch_size
    for lo in range(0, len(records), bs):
        yield records_to_batch(records[lo:lo + bs], cf.ref_names, schema,
                               proj, options.parse_tags)
    if not records:
        yield records_to_batch([], cf.ref_names, schema, proj,
                               options.parse_tags)


# ---------------------------------------------------------------------------
# .crai index
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CraiEntry:
    seq_id: int
    align_start: int
    align_span: int
    container_offset: int
    slice_offset: int
    slice_size: int


def parse_crai(raw: bytes) -> list[CraiEntry]:
    text = zlib.decompress(raw, wbits=zlib.MAX_WBITS | 32)
    out = []
    for line in text.split(b"\n"):
        if not line.strip():
            continue
        parts = line.split(b"\t")
        out.append(CraiEntry(int(parts[0]), int(parts[1]), int(parts[2]),
                             int(parts[3]), int(parts[4]), int(parts[5])))
    return out
