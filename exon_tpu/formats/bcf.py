"""BCF (binary VCF) decoder.

Parity: exon-bcf (src/batch_reader.rs) — same output schema as VCF
(chrom/pos/id/ref/alt/qual/filter/info/formats). BCF 2.2 layout: BGZF
container, ``BCF\\x02\\x02`` magic, embedded VCF text header (provides the
contig and INFO/FORMAT/FILTER string dictionaries), then length-prefixed
records with BCF "typed values". The untyped info/formats strings are
reconstructed from the typed data using the header dictionaries.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np

from ..errors import ExonError
from .vcf import VcfHeader, VcfOptions, vcf_schema

MISSING_INT = {1: -128, 2: -32768, 3: -2147483648}
EOV_INT = {1: -127, 2: -32767, 3: -2147483647}
MISSING_FLOAT_BITS = 0x7F800001
EOV_FLOAT_BITS = 0x7F800002


@dataclass
class BcfOptions(VcfOptions):
    file_extension: str = ".bcf"


def _read_typed(data: bytes, off: int):
    """Read one typed value → (value(s), new_off). Strings → bytes; numeric
    vectors → list of ints/floats (missing → None, EOV trimmed)."""
    tb = data[off]
    off += 1
    t = tb & 0xF
    ln = tb >> 4
    if ln == 15:
        ln, off = _read_typed_scalar_int(data, off)
    if t == 0:
        return None, off
    if t == 7:  # char string
        return data[off:off + ln], off + ln
    out = []
    for _ in range(ln):
        if t == 1:
            (v,) = struct.unpack_from("<b", data, off)
            off += 1
        elif t == 2:
            (v,) = struct.unpack_from("<h", data, off)
            off += 2
        elif t == 3:
            (v,) = struct.unpack_from("<i", data, off)
            off += 4
        elif t == 5:
            (bits,) = struct.unpack_from("<I", data, off)
            off += 4
            if bits == MISSING_FLOAT_BITS:
                out.append(None)
                continue
            if bits == EOV_FLOAT_BITS:
                continue
            (v,) = struct.unpack_from("<f", data, off - 4)
            out.append(v)
            continue
        else:
            raise ExonError(f"bad BCF type {t}")
        if t in (1, 2, 3):
            if v == MISSING_INT[t]:
                out.append(None)
            elif v == EOV_INT[t]:
                continue
            else:
                out.append(v)
    return out, off


def _read_typed_scalar_int(data: bytes, off: int):
    tb = data[off]
    off += 1
    t = tb & 0xF
    if t == 1:
        (v,) = struct.unpack_from("<b", data, off)
        return v, off + 1
    if t == 2:
        (v,) = struct.unpack_from("<h", data, off)
        return v, off + 2
    if t == 3:
        (v,) = struct.unpack_from("<i", data, off)
        return v, off + 4
    raise ExonError(f"bad typed int {t}")


def _fmt_num(v) -> str:
    if v is None:
        return "."
    if isinstance(v, float):
        s = f"{v:g}"
        return s
    return str(v)


@dataclass
class BcfRecord:
    chrom: str
    pos: int
    id: Optional[str]
    ref: str
    alt: list[str]
    qual: Optional[float]
    filter: Optional[list[str]]
    info: Optional[str]
    formats: Optional[str]


def parse_bcf_header(data: bytes) -> tuple[VcfHeader, list[str], list[str], int]:
    """Returns (header, string-dictionary, contigs, records-start offset)."""
    if data[:5] != b"BCF\x02\x02":
        raise ExonError("not a BCF2.2 file")
    (l_text,) = struct.unpack_from("<I", data, 5)
    text = data[9:9 + l_text].split(b"\x00", 1)[0]
    header_lines = text.split(b"\n")
    header = VcfHeader.parse([l for l in header_lines if l])
    # string dictionary: FILTER/INFO/FORMAT ids in order of appearance
    str_dict: list[str] = []
    seen = set()
    for line in header_lines:
        for kind in (b"##FILTER=", b"##INFO=", b"##FORMAT="):
            if line.startswith(kind):
                m = line.split(b"ID=", 1)
                if len(m) > 1:
                    name = m[1].split(b",", 1)[0].split(b">", 1)[0].decode()
                    if name not in seen:
                        seen.add(name)
                        str_dict.append(name)
    if "PASS" not in seen:
        str_dict.insert(0, "PASS")
    return header, str_dict, header.contigs, 9 + l_text


def parse_bcf(data: bytes) -> tuple[VcfHeader, list[BcfRecord]]:
    header, str_dict, contigs, off = parse_bcf_header(data)
    return header, parse_bcf_records(data, off, str_dict, contigs)


def parse_bcf_records(data: bytes, off: int, str_dict: list[str],
                      contigs: list[str]) -> list[BcfRecord]:
    records: list[BcfRecord] = []
    n = len(data)
    while off + 8 <= n:
        l_shared, l_indiv = struct.unpack_from("<II", data, off)
        off += 8
        if l_shared == 0 and l_indiv == 0:
            break
        rec_end = off + l_shared + l_indiv
        rid, pos0, _rlen = struct.unpack_from("<iii", data, off)
        (qual_bits,) = struct.unpack_from("<I", data, off + 12)
        qual = None
        if qual_bits != MISSING_FLOAT_BITS:
            (qual,) = struct.unpack_from("<f", data, off + 12)
        (n_allele_info,) = struct.unpack_from("<I", data, off + 16)
        n_info = n_allele_info & 0xFFFF
        n_allele = n_allele_info >> 16
        (n_fmt_sample,) = struct.unpack_from("<I", data, off + 20)
        n_sample = n_fmt_sample & 0xFFFFFF
        n_fmt = n_fmt_sample >> 24
        p = off + 24
        idval, p = _read_typed(data, p)
        alleles = []
        for _ in range(n_allele):
            a, p = _read_typed(data, p)
            alleles.append(a.decode() if isinstance(a, bytes) else ".")
        filt, p = _read_typed(data, p)
        filter_names = None
        if isinstance(filt, list) and filt:
            filter_names = [str_dict[i] if i is not None and i < len(str_dict)
                            else "." for i in filt]
        info_parts = []
        for _ in range(n_info):
            key_id, p = _read_typed_scalar_or_vec(data, p)
            val, p = _read_typed(data, p)
            key = str_dict[key_id] if key_id < len(str_dict) else f"K{key_id}"
            if val is None:
                info_parts.append(key)
            elif isinstance(val, bytes):
                info_parts.append(f"{key}={val.decode()}")
            else:
                info_parts.append(f"{key}={','.join(_fmt_num(v) for v in val)}")
        # FORMAT/samples
        formats = None
        if n_fmt and n_sample:
            q = off + l_shared
            keys = []
            cols = []
            for _ in range(n_fmt):
                key_id, q = _read_typed_scalar_or_vec(data, q)
                key = str_dict[key_id] if key_id < len(str_dict) else f"K{key_id}"
                tb = data[q]
                t = tb & 0xF
                ln = tb >> 4
                q += 1
                if ln == 15:
                    ln, q = _read_typed_scalar_int(data, q)
                per_sample = []
                for _s in range(n_sample):
                    vals = []
                    for _k in range(ln):
                        v, q = _read_one(data, q, t)
                        vals.append(v)
                    per_sample.append(vals)
                keys.append(key)
                if key == "GT":
                    cols.append([_gt_string(vs) for vs in per_sample])
                elif t == 7:
                    cols.append(["".join(chr(c) for c in vs if c is not None)
                                 for vs in per_sample])
                else:
                    cols.append([",".join(_fmt_num(v) for v in _trim_eov(vs))
                                 for vs in per_sample])
            sample_strs = []
            for s in range(n_sample):
                sample_strs.append(":".join(cols[k][s] for k in range(n_fmt)))
            formats = ":".join(keys) + "\t" + "\t".join(sample_strs)
        records.append(BcfRecord(
            chrom=contigs[rid] if rid < len(contigs) else str(rid),
            pos=pos0 + 1,
            id=(idval.decode() if isinstance(idval, bytes) and idval and
                idval != b"." else None),
            ref=alleles[0] if alleles else ".",
            alt=alleles[1:],
            qual=qual,
            filter=filter_names,
            info=";".join(info_parts) if info_parts else None,
            formats=formats,
        ))
        off = rec_end
    return records


def _read_one(data: bytes, off: int, t: int):
    if t == 1:
        (v,) = struct.unpack_from("<b", data, off)
        return (None if v == MISSING_INT[1] else v), off + 1
    if t == 2:
        (v,) = struct.unpack_from("<h", data, off)
        return (None if v == MISSING_INT[2] else v), off + 2
    if t == 3:
        (v,) = struct.unpack_from("<i", data, off)
        return (None if v == MISSING_INT[3] else v), off + 4
    if t == 5:
        (bits,) = struct.unpack_from("<I", data, off)
        if bits in (MISSING_FLOAT_BITS, EOV_FLOAT_BITS):
            return None, off + 4
        (v,) = struct.unpack_from("<f", data, off)
        return v, off + 4
    if t == 7:
        return data[off], off + 1
    raise ExonError(f"bad BCF fmt type {t}")


def _read_one_raw(data, off, t):
    return _read_one(data, off, t)


def _trim_eov(vals):
    return [v for v in vals if v is not None] or [None]


def _gt_string(vals) -> str:
    parts = []
    for i, v in enumerate(vals):
        if v is None:
            continue
        allele = (v >> 1) - 1
        phased = v & 1
        s = "." if allele < 0 else str(allele)
        if i == 0:
            parts.append(s)
        else:
            parts.append(("|" if phased else "/") + s)
    return "".join(parts) if parts else "."


def _read_typed_scalar_or_vec(data: bytes, off: int):
    v, off = _read_typed(data, off)
    if isinstance(v, list):
        return (v[0] if v else 0), off
    return v, off


def decode_host(data: bytes, options: BcfOptions,
                projection: Optional[list[str]] = None):
    """data = decompressed BCF bytes."""
    _header, records = parse_bcf(data)
    yield from records_to_batches(records, options, projection)


def records_to_batches(records: list[BcfRecord], options: BcfOptions,
                       projection: Optional[list[str]] = None):
    from ..batch import FixedColumn, batch_from_host, utf8_column

    n = len(records)
    if n == 0:
        return
    schema = vcf_schema(options)
    proj = projection if projection is not None else schema.names
    out_schema = schema.project(proj)
    bs = options.batch_size
    for lo in range(0, n, bs):
        hi = min(lo + bs, n)
        chunk = records[lo:hi]
        m = hi - lo
        cols = []
        for name in proj:
            if name == "chrom":
                from ..batch import DictColumn

                vocab = list(dict.fromkeys(r.chrom for r in chunk))
                codes = np.asarray([vocab.index(r.chrom) for r in chunk],
                                   np.int32)
                cols.append(DictColumn(codes, np.ones(m, bool), tuple(vocab)))
            elif name == "pos":
                cols.append(FixedColumn(
                    np.asarray([r.pos for r in chunk], np.int64),
                    np.ones(m, bool)))
            elif name == "id":
                cols.append(_str_list_col([[r.id] if r.id else None
                                           for r in chunk]))
            elif name == "ref":
                cols.append(utf8_column([r.ref for r in chunk]))
            elif name == "alt":
                cols.append(_str_list_col([r.alt or None for r in chunk]))
            elif name == "qual":
                vals = np.asarray([r.qual if r.qual is not None else 0.0
                                   for r in chunk], np.float32)
                valid = np.asarray([r.qual is not None for r in chunk])
                cols.append(FixedColumn(vals, valid))
            elif name == "filter":
                cols.append(_str_list_col([r.filter for r in chunk]))
            elif name == "info":
                cols.append(utf8_column([r.info for r in chunk]))
            elif name == "formats":
                cols.append(utf8_column([r.formats for r in chunk]))
        yield batch_from_host(out_schema, cols, m)


def _str_list_col(values: list):
    from ..batch import ListColumn, utf8_column
    from .textutil import cumsum_exclusive

    lens = np.asarray([0 if v is None else len(v) for v in values], np.int64)
    offs = cumsum_exclusive(lens)
    flat = [x for v in values if v is not None for x in v]
    valid = np.asarray([v is not None for v in values])
    return ListColumn(utf8_column(flat), offs.astype(np.int32), valid)
