"""Loopback S3 endpoint for the S3-BAM benchmark.

The reference benchmarks a BAM region query against real S3
(exon-bam-s3-query, exon-benchmarks/run_benchmarks.py:59-66). This image
has zero egress, so the workload runs the engine's REAL S3 client
(exon_tpu/io/cloud.py S3Store: SigV4, ListObjectsV2, HEAD, ranged GETs)
against a local HTTP server that speaks just enough S3 — measuring the full
remote-read code path (HTTP round trips, range slicing, index-driven
chunking) minus WAN latency.
"""

from __future__ import annotations

import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from xml.sax.saxutils import escape


class _S3Handler(BaseHTTPRequestHandler):
    latency_s = 0.0  # per-request injected RTT (WAN simulation)

    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def _file(self):
        # path-style: /bucket/key
        parts = self.path.split("?")[0].lstrip("/").split("/", 1)
        if len(parts) < 2 or not parts[1]:
            return None
        return os.path.join(self.server.root, parts[1])  # type: ignore

    def _lat(self):
        if self.latency_s:
            import time as _t

            _t.sleep(self.latency_s)

    def do_HEAD(self):
        self._lat()
        p = self._file()
        if p is None or not os.path.isfile(p):
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(p)))
        self.end_headers()

    def do_GET(self):
        self._lat()
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        if "list-type" in q:
            prefix = q.get("prefix", [""])[0]
            root = self.server.root  # type: ignore
            items = []
            for name in sorted(os.listdir(root)):
                if name.startswith(prefix):
                    size = os.path.getsize(os.path.join(root, name))
                    items.append(f"<Contents><Key>{escape(name)}</Key>"
                                 f"<Size>{size}</Size></Contents>")
            body = ("<?xml version='1.0'?><ListBucketResult>"
                    + "".join(items)
                    + "<IsTruncated>false</IsTruncated></ListBucketResult>"
                    ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        p = self._file()
        if p is None or not os.path.isfile(p):
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        size = os.path.getsize(p)
        rng = self.headers.get("Range")
        start, end = 0, size - 1
        status = 200
        if rng and rng.startswith("bytes="):
            a, _, b = rng[6:].partition("-")
            if a:
                start = int(a)
                end = min(int(b), size - 1) if b else size - 1
            else:  # suffix range bytes=-n
                start = max(0, size - int(b))
                end = size - 1
            status = 206
        length = end - start + 1
        self.send_response(status)
        self.send_header("Content-Length", str(length))
        if status == 206:
            self.send_header("Content-Range",
                             f"bytes {start}-{end}/{size}")
        self.end_headers()
        with open(p, "rb") as f:
            f.seek(start)
            remaining = length
            while remaining > 0:
                chunk = f.read(min(remaining, 1 << 20))
                if not chunk:
                    break
                self.wfile.write(chunk)
                remaining -= len(chunk)


class LocalS3Endpoint:
    """Serve a directory as bucket contents over loopback HTTP."""

    def __init__(self, root: str, latency_s: float = 0.0):
        handler = type("_S3HandlerL", (_S3Handler,),
                       {"latency_s": latency_s})
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._httpd.root = root  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def __enter__(self) -> "LocalS3Endpoint":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
