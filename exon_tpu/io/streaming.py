"""Bounded-memory streaming ingest: decompress + record-align in chunks.

The reference streams 8192-row batches without materializing whole files
(exon-fasta/src/batch_reader.rs:72-111, streaming_bgzf.rs:56-80). Here the
equivalent is chunk-granular: a compressed file is decompressed
incrementally (the compressed source stays an mmap view — page cache, not
RSS) and yielded as ~48 MB chunks cut at format record boundaries, so each
chunk feeds the existing whole-buffer vectorized decoders unchanged. Peak
RSS is O(chunk + decoded-chunk), independent of file size.
"""

from __future__ import annotations

import bz2
import lzma
import zlib
from typing import Callable, Iterator, Optional

from .compression import Compression

DEFAULT_CHUNK = 48 << 20


def prefetch(gen: Iterator, depth: int = 2) -> Iterator:
    """Run ``gen`` in a background thread with a bounded queue so the
    producer (decompression) overlaps the consumer (decode + device
    compute). Exceptions propagate to the consumer. If the consumer
    abandons the iterator early (LIMIT queries), the pump thread notices a
    stop flag on its next bounded put and exits instead of blocking forever
    holding the underlying mmap/decompressor alive."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE, ERR = object(), object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    def pump():
        try:
            for item in gen:
                if not _put(item):
                    break
            else:
                _put(DONE)
        except BaseException as e:  # noqa: BLE001 - re-raised consumer-side
            _put((ERR, e))
        finally:
            close = getattr(gen, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] is ERR:
                raise item[1]
            yield item
    finally:
        stop.set()


def _iter_gzip_zlib(mv: memoryview, read_size: int) -> Iterator[bytes]:
    pos = 0
    d = zlib.decompressobj(31)
    while pos < len(mv):
        piece = d.decompress(bytes(mv[pos:pos + read_size]))
        pos += read_size
        if piece:
            yield piece
        # multi-member gzip (BGZF): restart at member boundaries
        while d.eof and d.unused_data:
            tail = d.unused_data
            d = zlib.decompressobj(31)
            piece = d.decompress(tail)
            if piece:
                yield piece
    tail = d.flush()
    if tail:
        yield tail


def _iter_bgzf_native(src, target_out: int = 32 << 20
                      ) -> Optional[Iterator[bytes]]:
    """BGZF members are independent deflate streams: group blocks into
    ~target_out-sized slices and inflate each slice natively with all
    cores (libdeflate). Returns None when the source isn't wholly BGZF
    or the native library is absent."""
    import numpy as np

    from .. import native

    if not native.available():
        return None
    arr = src if isinstance(src, np.ndarray) else np.frombuffer(src, np.uint8)
    table = native.bgzf_blocks(arr)
    if table is None:
        return None
    in_off, in_size, out_size = table

    def gen() -> Iterator[bytes]:
        n = len(in_off)
        i = 0
        while i < n:
            j, out_total = i, 0
            while j < n and (out_total < target_out or j == i):
                out_total += int(out_size[j])
                j += 1
            lo = int(in_off[i])
            hi = int(in_off[j - 1] + in_size[j - 1])
            piece = native.gunzip(arr[lo:hi])
            if piece is None:  # corrupt mid-file: surface as zlib would
                raise zlib.error(f"bad BGZF block near offset {lo}")
            yield piece.tobytes()
            i = j

    return gen()


def _iter_decompressed(src, comp: Compression, read_size: int = 8 << 20
                       ) -> Iterator[bytes]:
    """Yield decompressed pieces from a bytes/memoryview/ndarray source."""
    if comp in (Compression.GZIP, Compression.BGZF):
        native_gen = _iter_bgzf_native(src)
        if native_gen is not None:
            yield from native_gen
        else:
            yield from _iter_gzip_zlib(memoryview(src), read_size)
        return
    mv = memoryview(src)
    if comp == Compression.ZSTD:
        import zstandard

        d = zstandard.ZstdDecompressor().decompressobj()
        pos = 0
        while pos < len(mv):
            piece = d.decompress(bytes(mv[pos:pos + read_size]))
            pos += read_size
            if piece:
                yield piece
    elif comp == Compression.BZIP2:
        d = bz2.BZ2Decompressor()
        pos = 0
        while pos < len(mv):
            piece = d.decompress(bytes(mv[pos:pos + read_size]))
            pos += read_size
            if piece:
                yield piece
    elif comp == Compression.XZ:
        d = lzma.LZMADecompressor()
        pos = 0
        while pos < len(mv):
            piece = d.decompress(bytes(mv[pos:pos + read_size]))
            pos += read_size
            if piece:
                yield piece
    else:
        # uncompressed: pass through in read_size pieces
        pos = 0
        while pos < len(mv):
            yield bytes(mv[pos:pos + read_size])
            pos += read_size


# -- record boundary finders -------------------------------------------------
# Each returns the cut offset (exclusive) within ``buf`` such that
# buf[:cut] is whole records, or -1 if no safe cut exists yet.


def _cut_line(buf: bytes, state: dict) -> int:
    i = buf.rfind(b"\n")
    return i + 1 if i >= 0 else -1


def _cut_fasta(buf: bytes, state: dict) -> int:
    i = buf.rfind(b"\n>")
    return i + 1 if i >= 0 else -1


def _cut_fastq(buf: bytes, state: dict) -> int:
    """Cut at a line boundary where the total emitted line count ≡ 0 mod 4
    (FASTQ records are exactly 4 lines)."""
    emitted = state.get("lines", 0)
    cut = len(buf)
    lines_here = buf.count(b"\n")
    # walk the cut back to the latest '\n' making the count divisible by 4
    while cut > 0:
        i = buf.rfind(b"\n", 0, cut)
        if i < 0:
            return -1
        if (emitted + _count_nl(buf, i + 1)) % 4 == 0:
            state["lines"] = emitted + _count_nl(buf, i + 1)
            return i + 1
        cut = i
    return -1


def _count_nl(buf: bytes, upto: int) -> int:
    return buf.count(b"\n", 0, upto)


def _cut_sdf(buf: bytes, state: dict) -> int:
    i = buf.rfind(b"$$$$\n")
    return i + 5 if i >= 0 else -1


_CUTTERS: dict[str, Callable] = {
    "line": _cut_line,
    "fasta": _cut_fasta,
    "fastq": _cut_fastq,
    "sdf": _cut_sdf,
}


def stream_record_chunks(src, comp: Compression, boundary: str,
                         header_prefixes: tuple = (),
                         chunk_size: int = DEFAULT_CHUNK
                         ) -> Iterator[bytes]:
    """Yield record-aligned decompressed chunks of ~chunk_size bytes.

    header_prefixes: leading lines starting with any of these bytes (e.g.
    b"#" for VCF, b"@" for SAM) are captured from the file head and
    PREPENDED to every subsequent chunk, so schema-bearing headers reach
    the per-chunk decoder (the reference's readers hold the parsed header
    in the BatchReader instead).
    """
    cutter = _CUTTERS[boundary]
    state: dict = {}
    pending = bytearray()
    header: Optional[bytes] = None if header_prefixes else b""
    first = True
    for piece in _iter_decompressed(src, comp):
        pending += piece
        while len(pending) >= chunk_size:
            cut = cutter(bytes(pending[:chunk_size + (1 << 20)]), state)
            if cut <= 0:
                break  # no boundary yet — keep accumulating
            chunk = bytes(pending[:cut])
            del pending[:cut]
            if header is None:
                header = _extract_header(chunk, header_prefixes)
                yield chunk
            else:
                yield (header + chunk) if (header and not first) else chunk
            first = False
    if pending:
        chunk = bytes(pending)
        if header is None:
            header = _extract_header(chunk, header_prefixes)
            yield chunk
        else:
            yield (header + chunk) if (header and not first) else chunk


def _extract_header(chunk: bytes, prefixes: tuple) -> bytes:
    """Capture the leading header lines (first chunk only)."""
    end = 0
    while end < len(chunk):
        nl = chunk.find(b"\n", end)
        if nl < 0:
            break
        line = chunk[end:nl]
        if line[:1] in prefixes:
            end = nl + 1
        else:
            break
    return chunk[:end]
