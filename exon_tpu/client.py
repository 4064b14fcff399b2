"""exon-py-shaped client for a served exon-tpu engine.

Parity target: ``exon-py``'s ExomeConnection (exon-py/exon_py/
__init__.py:30-80) — connect to a host, run SQL, get Arrow results back.
The transport here is the engine's own HTTP + Arrow IPC endpoint
(exon_tpu.serve) instead of gRPC/ADBC FlightSQL, with the same surface:

    client = ExonClient("http://127.0.0.1:8815")
    assert client.health()
    table = client.sql("SELECT 1 AS one")       # pyarrow.Table
    df = client.sql_df("SELECT ...")            # pandas.DataFrame
"""

from __future__ import annotations

import json
import urllib.request
from urllib.error import HTTPError


class ExonClientError(RuntimeError):
    pass


class ExonClient:
    def __init__(self, uri: str, timeout: float = 600.0):
        self.uri = uri.rstrip("/")
        self.timeout = timeout

    def health(self) -> bool:
        try:
            with urllib.request.urlopen(self.uri + "/health",
                                        timeout=self.timeout) as r:
                return json.load(r).get("status") == "SERVING"
        except OSError:
            return False

    def sql(self, query: str):
        """Run SQL on the server; returns a pyarrow.Table."""
        import pyarrow as pa

        req = urllib.request.Request(
            self.uri + "/sql", data=query.encode("utf-8"), method="POST",
            headers={"Content-Type": "text/plain; charset=utf-8"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                data = r.read()
        except HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", str(e))
            except Exception:
                msg = str(e)
            raise ExonClientError(msg) from None
        with pa.ipc.open_stream(data) as reader:
            return reader.read_all()

    def sql_df(self, query: str):
        return self.sql(query).to_pandas()
