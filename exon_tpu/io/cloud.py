"""Real cloud object stores: S3 (SigV4 REST) and GCS (JSON API).

The reference builds S3 stores through the object_store crate with an AWS
credential-chain adapter and registers GCS from env
(exon-io/src/io.rs:35-136, exon-core/src/runtime_env/
exon_runtime_env_ext.rs:28-89). Here the clients are stdlib-only
(urllib + hmac SigV4) so range GETs — the backbone of index-driven region
reads — work against AWS, GCS, or any LocalStack/MinIO-style endpoint
without extra dependencies.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import os
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Optional

from .object_store import ObjectMeta, ObjectStore

DEFAULT_REGION = "us-west-2"  # reference default: exon-io/src/io.rs:31


# ---------------------------------------------------------------------------
# AWS credential chain (exon-io/src/io.rs:35-105 AwsCredentialAdapter analog)
# ---------------------------------------------------------------------------


@dataclass
class AwsCredentials:
    access_key: str
    secret_key: str
    token: Optional[str] = None


def resolve_aws_credentials(profile: Optional[str] = None
                            ) -> Optional[AwsCredentials]:
    """env → shared credentials file → None (anonymous)."""
    ak = os.environ.get("AWS_ACCESS_KEY_ID")
    sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
    if ak and sk:
        return AwsCredentials(ak, sk, os.environ.get("AWS_SESSION_TOKEN"))
    path = os.environ.get("AWS_SHARED_CREDENTIALS_FILE",
                          os.path.expanduser("~/.aws/credentials"))
    prof = profile or os.environ.get("AWS_PROFILE", "default")
    if os.path.exists(path):
        import configparser

        cp = configparser.ConfigParser()
        cp.read(path)
        if cp.has_section(prof):
            sec = cp[prof]
            if "aws_access_key_id" in sec and "aws_secret_access_key" in sec:
                return AwsCredentials(sec["aws_access_key_id"],
                                      sec["aws_secret_access_key"],
                                      sec.get("aws_session_token"))
    return None


# ---------------------------------------------------------------------------
# SigV4 signing (stdlib hmac/hashlib)
# ---------------------------------------------------------------------------


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sign_v4(method: str, url: str, headers: dict, payload_hash: str,
            creds: AwsCredentials, region: str, service: str = "s3",
            now: Optional[datetime.datetime] = None) -> dict:
    """Return headers + the SigV4 Authorization header for the request."""
    parsed = urllib.parse.urlparse(url)
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    headers = dict(headers)
    headers["host"] = parsed.netloc
    headers["x-amz-date"] = amz_date
    headers["x-amz-content-sha256"] = payload_hash
    if creds.token:
        headers["x-amz-security-token"] = creds.token
    # canonical request
    canon_uri = urllib.parse.quote(parsed.path or "/", safe="/-_.~")
    qs = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canon_qs = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}="
        f"{urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(qs))
    signed_names = sorted(h.lower() for h in headers)
    canon_headers = "".join(f"{h}:{str(headers_ci(headers, h)).strip()}\n"
                            for h in signed_names)
    signed_headers = ";".join(signed_names)
    canon_req = "\n".join([method, canon_uri, canon_qs, canon_headers,
                           signed_headers, payload_hash])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    sts = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                     hashlib.sha256(canon_req.encode()).hexdigest()])
    k = _hmac(("AWS4" + creds.secret_key).encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    sig = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
    headers["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={creds.access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={sig}")
    return headers


def headers_ci(headers: dict, name: str) -> str:
    for k, v in headers.items():
        if k.lower() == name:
            return v
    return ""


_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


# ---------------------------------------------------------------------------
# S3 store
# ---------------------------------------------------------------------------


class S3Store(ObjectStore):
    """S3 REST client: ListObjectsV2 / HEAD / GET (+Range) / PUT.

    endpoint: override for LocalStack/MinIO (path-style addressing);
    default is virtual-hosted https://{bucket}.s3.{region}.amazonaws.com.
    """

    def __init__(self, bucket: str, region: Optional[str] = None,
                 endpoint: Optional[str] = None,
                 credentials: Optional[AwsCredentials] = None,
                 anonymous: bool = False):
        self.bucket = bucket
        self.region = region or os.environ.get("AWS_REGION",
                                               os.environ.get(
                                                   "AWS_DEFAULT_REGION",
                                                   DEFAULT_REGION))
        self.endpoint = (endpoint
                         or os.environ.get("AWS_ENDPOINT_URL_S3")
                         or os.environ.get("AWS_ENDPOINT_URL"))
        self.path_style = self.endpoint is not None
        self.creds = None if anonymous else (
            credentials or resolve_aws_credentials())

    def _url(self, path: str, query: str = "") -> str:
        path = urllib.parse.quote(path.lstrip("/"), safe="/-_.~")
        if self.path_style:
            base = f"{self.endpoint.rstrip('/')}/{self.bucket}/{path}"
        else:
            base = (f"https://{self.bucket}.s3.{self.region}.amazonaws.com/"
                    f"{path}")
        return base + (f"?{query}" if query else "")

    def _request(self, method: str, url: str, extra_headers: dict = {},
                 data: Optional[bytes] = None):
        payload_hash = hashlib.sha256(data or b"").hexdigest()
        headers = dict(extra_headers)
        if self.creds is not None:
            headers = sign_v4(method, url, headers, payload_hash,
                              self.creds, self.region)
        req = urllib.request.Request(url, method=method, data=data,
                                     headers=headers)
        return urllib.request.urlopen(req, timeout=60)

    # -- ObjectStore interface ------------------------------------------

    def list(self, prefix: str) -> list[ObjectMeta]:
        out: list[ObjectMeta] = []
        token = None
        while True:
            q = ("list-type=2&prefix="
                 + urllib.parse.quote(prefix.lstrip("/"), safe=""))
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token,
                                                                 safe="")
            url = self._url("", q)
            with self._request("GET", url) as resp:
                tree = ET.fromstring(resp.read())
            ns = ""
            if tree.tag.startswith("{"):
                ns = tree.tag.split("}")[0] + "}"
            for c in tree.findall(f"{ns}Contents"):
                key = c.find(f"{ns}Key").text
                size = int(c.find(f"{ns}Size").text)
                out.append(ObjectMeta(key, size))
            trunc = tree.find(f"{ns}IsTruncated")
            if trunc is not None and trunc.text == "true":
                token = tree.find(f"{ns}NextContinuationToken").text
            else:
                break
        return sorted(out, key=lambda m: m.path)

    def head(self, path: str) -> ObjectMeta:
        try:
            with self._request("HEAD", self._url(path)) as resp:
                return ObjectMeta(path.lstrip("/"),
                                  int(resp.headers["Content-Length"]))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise

    def get(self, path: str) -> bytes:
        try:
            with self._request("GET", self._url(path)) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise

    def get_range(self, path: str, start: int, end: int) -> bytes:
        if end <= start:
            return b""
        hdr = {"range": f"bytes={start}-{end - 1}"}
        try:
            with self._request("GET", self._url(path), hdr) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise

    def put(self, path: str, data: bytes) -> None:
        self._request("PUT", self._url(path), data=data).read()


# ---------------------------------------------------------------------------
# GCS store (JSON API; bearer token or anonymous public access)
# ---------------------------------------------------------------------------


class GcsStore(ObjectStore):
    """GCS client over the JSON/XML APIs.

    Auth: bearer token from GCS_OAUTH_TOKEN / GOOGLE_OAUTH_TOKEN env (the
    reference reads GOOGLE_SERVICE_ACCOUNT via the object_store crate,
    exon_runtime_env_ext.rs:74-89 — a service-account JWT exchange needs
    RS256 signing, out of stdlib scope; pass a token instead). Anonymous
    works for public buckets. ``endpoint`` overrides for fake-gcs-server.
    """

    def __init__(self, bucket: str, endpoint: Optional[str] = None,
                 token: Optional[str] = None):
        self.bucket = bucket
        self.endpoint = (endpoint or os.environ.get("GCS_ENDPOINT_URL")
                         or "https://storage.googleapis.com")
        self.token = (token or os.environ.get("GCS_OAUTH_TOKEN")
                      or os.environ.get("GOOGLE_OAUTH_TOKEN"))

    def _headers(self, extra: dict = {}) -> dict:
        h = dict(extra)
        if self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h

    def _open(self, url: str, headers: dict = {}, method: str = "GET",
              data: Optional[bytes] = None):
        req = urllib.request.Request(url, method=method, data=data,
                                     headers=self._headers(headers))
        return urllib.request.urlopen(req, timeout=60)

    def list(self, prefix: str) -> list[ObjectMeta]:
        import json as _json

        out: list[ObjectMeta] = []
        page = None
        while True:
            q = "prefix=" + urllib.parse.quote(prefix.lstrip("/"), safe="")
            if page:
                q += "&pageToken=" + urllib.parse.quote(page, safe="")
            url = (f"{self.endpoint.rstrip('/')}/storage/v1/b/{self.bucket}"
                   f"/o?{q}")
            with self._open(url) as resp:
                body = _json.loads(resp.read())
            for item in body.get("items", []):
                out.append(ObjectMeta(item["name"], int(item["size"])))
            page = body.get("nextPageToken")
            if not page:
                break
        return sorted(out, key=lambda m: m.path)

    def _media_url(self, path: str) -> str:
        p = urllib.parse.quote(path.lstrip("/"), safe="")
        return (f"{self.endpoint.rstrip('/')}/storage/v1/b/{self.bucket}"
                f"/o/{p}?alt=media")

    def head(self, path: str) -> ObjectMeta:
        import json as _json

        p = urllib.parse.quote(path.lstrip("/"), safe="")
        url = f"{self.endpoint.rstrip('/')}/storage/v1/b/{self.bucket}/o/{p}"
        try:
            with self._open(url) as resp:
                body = _json.loads(resp.read())
            return ObjectMeta(path.lstrip("/"), int(body["size"]))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise

    def get(self, path: str) -> bytes:
        try:
            with self._open(self._media_url(path)) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise

    def get_range(self, path: str, start: int, end: int) -> bytes:
        if end <= start:
            return b""
        hdr = {"Range": f"bytes={start}-{end - 1}"}
        try:
            with self._open(self._media_url(path), hdr) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path) from e
            raise


def build_store_for_url(url: str) -> Optional[ObjectStore]:
    """Auto-construct a real cloud store for an unregistered s3://
    or gs:// URL (ExonRuntimeEnvExt::exon_register_object_store_url
    analog, exon_runtime_env_ext.rs:50-89). Only when env provides an
    endpoint or credentials — otherwise None so the registry error stands
    (this process has no network egress by default)."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "s3":
        if (os.environ.get("AWS_ENDPOINT_URL")
                or os.environ.get("AWS_ENDPOINT_URL_S3")
                or resolve_aws_credentials() is not None):
            return S3Store(parsed.netloc)
        return None
    if parsed.scheme == "gs":
        if (os.environ.get("GCS_ENDPOINT_URL")
                or os.environ.get("GCS_OAUTH_TOKEN")
                or os.environ.get("GOOGLE_OAUTH_TOKEN")):
            return GcsStore(parsed.netloc)
        return None
    return None
