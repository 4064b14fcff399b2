"""Real S3/GCS clients against in-process fake endpoints (the LocalStack
analog, docker-compose.yml:5-18 in the reference): signed HTTP requests,
SigV4 verification server-side, range GETs, and an end-to-end s3:// table.
"""

import gzip
import hashlib
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from exon_tpu import ExonSession
from exon_tpu.io.cloud import (AwsCredentials, GcsStore, S3Store,
                               resolve_aws_credentials, sign_v4)
from exon_tpu.io.object_store import register_store

CREDS = AwsCredentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG")


class _FakeS3(BaseHTTPRequestHandler):
    objects: dict = {}
    require_sig = True

    def log_message(self, *a):
        pass

    def _verify_sig(self) -> bool:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256"):
            return False
        # recompute the signature with the known secret over the same
        # canonical request the client claims to have signed
        parts = dict(p.strip().split("=", 1)
                     for p in auth.split(" ", 1)[1].split(","))
        signed = parts["SignedHeaders"].split(";")
        url = f"http://{self.headers['host']}{self.path}"
        hdrs = {h: self.headers[h] for h in signed if h != "host"}
        import datetime

        amz = self.headers["x-amz-date"]
        now = datetime.datetime.strptime(amz, "%Y%m%dT%H%M%SZ").replace(
            tzinfo=datetime.timezone.utc)
        expect = sign_v4(self.command, url, hdrs,
                         self.headers["x-amz-content-sha256"], CREDS,
                         "us-west-2", "s3", now=now)["Authorization"]
        return expect.split("Signature=")[1] == auth.split("Signature=")[1]

    def _route(self):
        if self.require_sig and not self._verify_sig():
            self.send_response(403)
            self.end_headers()
            return None
        parsed = urllib.parse.urlparse(self.path)
        segs = parsed.path.lstrip("/").split("/", 1)
        bucket = segs[0]
        key = segs[1] if len(segs) > 1 else ""
        return bucket, key, urllib.parse.parse_qs(parsed.query)

    def do_GET(self):
        r = self._route()
        if r is None:
            return
        bucket, key, q = r
        if "list-type" in q:
            prefix = q.get("prefix", [""])[0]
            items = "".join(
                f"<Contents><Key>{k}</Key><Size>{len(v)}</Size></Contents>"
                for k, v in sorted(self.objects.items())
                if k.startswith(prefix))
            body = (f"<ListBucketResult><IsTruncated>false</IsTruncated>"
                    f"{items}</ListBucketResult>").encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if key not in self.objects:
            self.send_response(404)
            self.end_headers()
            return
        data = self.objects[key]
        rng = self.headers.get("range") or self.headers.get("Range")
        status = 200
        if rng:
            lo, hi = rng.split("=")[1].split("-")
            data = data[int(lo):int(hi) + 1]
            status = 206
        self.send_response(status)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_HEAD(self):
        r = self._route()
        if r is None:
            return
        _b, key, _q = r
        if key not in self.objects:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.objects[key])))
        self.end_headers()

    def do_PUT(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        r = self._route()
        if r is None:
            return
        _b, key, _q = r
        self.objects[key] = body
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()


@pytest.fixture()
def s3_server():
    _FakeS3.objects = {}
    srv = HTTPServer(("127.0.0.1", 0), _FakeS3)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _store(endpoint):
    return S3Store("test-bucket", region="us-west-2", endpoint=endpoint,
                   credentials=CREDS)


def test_s3_put_get_head_list(s3_server):
    st = _store(s3_server)
    st.put("dir/a.txt", b"hello world")
    st.put("dir/b.txt", b"bb")
    assert st.get("dir/a.txt") == b"hello world"
    assert st.head("dir/b.txt").size == 2
    names = [m.path for m in st.list("dir/")]
    assert names == ["dir/a.txt", "dir/b.txt"]
    with pytest.raises(FileNotFoundError):
        st.get("missing")


def test_s3_range_get(s3_server):
    st = _store(s3_server)
    st.put("f.bin", bytes(range(100)))
    assert st.get_range("f.bin", 10, 20) == bytes(range(10, 20))
    assert st.get_range("f.bin", 5, 5) == b""


def test_s3_bad_signature_rejected(s3_server):
    bad = S3Store("test-bucket", region="us-west-2", endpoint=s3_server,
                  credentials=AwsCredentials("AKIDEXAMPLE", "WRONG"))
    _store(s3_server).put("x", b"1")
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        bad.get("x")


def test_s3_end_to_end_table(s3_server):
    """CREATE EXTERNAL TABLE over s3:// with real signed HTTP."""
    st = _store(s3_server)
    st.put("data/t.fasta", b">a desc\nACGT\n>b\nGGGC\n")
    register_store("s3://sig-bucket", st)
    ctx = ExonSession.new_exon()
    ctx.sql("CREATE EXTERNAL TABLE st STORED AS FASTA "
            "LOCATION 's3://sig-bucket/data/t.fasta'")
    out = ctx.sql("SELECT id, sequence FROM st ORDER BY id")
    d = out.collect_arrow().to_pydict()
    assert d["id"] == ["a", "b"]
    assert d["sequence"] == ["ACGT", "GGGC"]


def test_s3_auto_register_from_env(s3_server, monkeypatch):
    st = _store(s3_server)
    st.put("auto/x.bed", b"chr1\t1\t100\nchr2\t5\t50\n")
    monkeypatch.setenv("AWS_ENDPOINT_URL", s3_server)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", CREDS.access_key)
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", CREDS.secret_key)
    from exon_tpu.io.object_store import _REGISTRY, get_store

    _REGISTRY.pop("s3://test-bucket", None)
    store, path = get_store("s3://test-bucket/auto/x.bed")
    assert store.get(path).startswith(b"chr1")
    _REGISTRY.pop("s3://test-bucket", None)


def test_credential_chain_file(tmp_path, monkeypatch):
    f = tmp_path / "creds"
    f.write_text("[default]\naws_access_key_id = FILEKEY\n"
                 "aws_secret_access_key = FILESECRET\n")
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    monkeypatch.setenv("AWS_SHARED_CREDENTIALS_FILE", str(f))
    c = resolve_aws_credentials()
    assert c.access_key == "FILEKEY" and c.secret_key == "FILESECRET"


# ---------------------------------------------------------------------------
# GCS
# ---------------------------------------------------------------------------


class _FakeGcs(BaseHTTPRequestHandler):
    objects: dict = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(parsed.query)
        if self.headers.get("Authorization") != "Bearer tok123":
            self.send_response(401)
            self.end_headers()
            return
        path = parsed.path
        if path.endswith("/o"):  # list
            prefix = q.get("prefix", [""])[0]
            items = [{"name": k, "size": str(len(v))}
                     for k, v in sorted(self.objects.items())
                     if k.startswith(prefix)]
            body = json.dumps({"items": items}).encode()
        else:
            key = urllib.parse.unquote(path.split("/o/", 1)[1])
            if key not in self.objects:
                self.send_response(404)
                self.end_headers()
                return
            if q.get("alt") == ["media"]:
                data = self.objects[key]
                rng = self.headers.get("Range")
                if rng:
                    lo, hi = rng.split("=")[1].split("-")
                    data = data[int(lo):int(hi) + 1]
                body = data
            else:
                body = json.dumps(
                    {"name": key, "size": str(len(self.objects[key]))}
                ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def gcs_server():
    _FakeGcs.objects = {"d/a.txt": b"alpha", "d/b.bin": bytes(range(64))}
    srv = HTTPServer(("127.0.0.1", 0), _FakeGcs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_gcs_get_list_range(gcs_server):
    st = GcsStore("b", endpoint=gcs_server, token="tok123")
    assert st.get("d/a.txt") == b"alpha"
    assert st.head("d/b.bin").size == 64
    assert [m.path for m in st.list("d/")] == ["d/a.txt", "d/b.bin"]
    assert st.get_range("d/b.bin", 8, 16) == bytes(range(8, 16))
    bad = GcsStore("b", endpoint=gcs_server, token="WRONG")
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        bad.get("d/a.txt")
