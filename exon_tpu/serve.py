"""Served-engine endpoint: SQL over HTTP, results as Arrow IPC streams.

The reference ships ``exon-py`` — a client for a hosted "Exome" catalog
service speaking gRPC + ADBC/FlightSQL (exon-py/exon_py/__init__.py:30-80;
the server is not in that repo). The TPU engine's analog is self-contained:
``ExonServer`` hosts an ``ExonSession`` behind a tiny HTTP endpoint that
accepts SQL (POST /sql, body = query text) and streams the result back as
an Arrow IPC stream — the same wire format FlightSQL rides — and
``exon_tpu.client.ExonClient`` is the exon-py-shaped consumer.

Design: stdlib http.server (no gRPC dependency in the image) + pyarrow IPC.
Connections are handled concurrently but query execution serializes behind
a session lock (CREATE EXTERNAL TABLE mutates catalog state, and engine
execution is not documented thread-safe); the IPC stream is encoded to a
buffer, then written with Content-Length. Health check at GET /health
(exon-py health proto analog).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class _Handler(BaseHTTPRequestHandler):
    server_version = "exon-tpu"

    def log_message(self, fmt, *args):  # route through engine tracing
        from .tracing import logger

        logger.debug("serve: " + fmt, *args)

    def do_GET(self):
        if self.path == "/health":
            body = json.dumps({"status": "SERVING"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        if self.path != "/sql":
            self.send_error(404)
            return
        import pyarrow as pa

        n = int(self.headers.get("Content-Length", 0))
        sql = self.rfile.read(n).decode("utf-8")
        session = self.server.exon_session  # type: ignore[attr-defined]
        try:
            # one query at a time: session catalog mutations (CREATE
            # EXTERNAL TABLE) and engine execution race otherwise
            with self.server.exon_lock:  # type: ignore[attr-defined]
                df = session.sql(sql)
                tab = df.collect_arrow()
        except Exception as e:  # surface engine errors as 400 + message
            body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, tab.schema) as w:
            for rb in tab.to_batches(max_chunksize=8192):
                w.write_batch(rb)
        body = sink.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/vnd.apache.arrow.stream")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class ExonServer:
    """Host an ExonSession over HTTP (SQL in, Arrow IPC out)."""

    def __init__(self, session=None, host: str = "127.0.0.1",
                 port: int = 0):
        if session is None:
            from .session import ExonSession

            session = ExonSession.new_exon()
        self.session = session
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.exon_session = session  # type: ignore[attr-defined]
        self._httpd.exon_lock = threading.Lock()  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "ExonServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name="exon-tpu-serve")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self._httpd.server_close()

    def __enter__(self) -> "ExonServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def main(argv=None) -> None:
    """``python -m exon_tpu.serve [--host H] [--port P]``"""
    import argparse

    ap = argparse.ArgumentParser(description="exon-tpu SQL server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8815)
    args = ap.parse_args(argv)
    srv = ExonServer(host=args.host, port=args.port)
    print(f"exon-tpu serving on {srv.address}")
    srv._httpd.serve_forever()


if __name__ == "__main__":
    main()
