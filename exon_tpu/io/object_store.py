"""Object-store abstraction: uniform listing + (range) reads over URLs.

Replaces the reference's object_store crate usage
(exon-io/src/io.rs:108-136, exon-common/src/object_store_files_from_table_path.rs:22).
Local filesystem is first-class; s3:// / gs:// resolve through an endpoint
registry so tests can point them at a fake store (the reference uses
LocalStack the same way, docker-compose.yml:5-18).
"""

from __future__ import annotations

import os
import glob as _glob
from dataclasses import dataclass
from typing import Optional
from urllib.parse import urlparse


@dataclass(frozen=True)
class ObjectMeta:
    path: str  # store-relative path
    size: int


class ObjectStore:
    """Interface: list / head / get / get_range."""

    def list(self, prefix: str) -> list[ObjectMeta]:
        raise NotImplementedError

    def head(self, path: str) -> ObjectMeta:
        raise NotImplementedError

    def get(self, path: str) -> bytes:
        raise NotImplementedError

    def get_range(self, path: str, start: int, end: int) -> bytes:
        """Bytes [start, end). Backbone of index-driven region reads."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        try:
            self.head(path)
            return True
        except FileNotFoundError:
            return False

    def put(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def put_stream(self, path: str, chunks) -> None:
        """Write an object from an iterator of byte chunks. Default
        accumulates (remote stores need one-shot uploads); LocalStore
        writes incrementally so COPY TO never buffers the whole file."""
        self.put(path, b"".join(chunks))


class LocalStore(ObjectStore):
    def __init__(self, root: str = "/"):
        self.root = root

    def _abs(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        if self.root == "/":
            return os.path.abspath(path)  # cwd-relative plain paths
        return os.path.join(self.root, path)

    def list(self, prefix: str) -> list[ObjectMeta]:
        p = self._abs(prefix)
        out: list[ObjectMeta] = []
        if os.path.isfile(p):
            return [ObjectMeta(p, os.path.getsize(p))]
        if os.path.isdir(p):
            for dirpath, _dirs, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(dirpath, f)
                    out.append(ObjectMeta(fp, os.path.getsize(fp)))
            out.sort(key=lambda m: m.path)
            return out
        hits = sorted(_glob.glob(p))
        return [ObjectMeta(h, os.path.getsize(h)) for h in hits if os.path.isfile(h)]

    def head(self, path: str) -> ObjectMeta:
        p = self._abs(path)
        if not os.path.isfile(p):
            raise FileNotFoundError(path)
        return ObjectMeta(p, os.path.getsize(p))

    def get(self, path: str) -> bytes:
        with open(self._abs(path), "rb") as f:
            return f.read()

    def get_range(self, path: str, start: int, end: int) -> bytes:
        with open(self._abs(path), "rb") as f:
            f.seek(start)
            return f.read(max(0, end - start))

    def put(self, path: str, data: bytes) -> None:
        p = self._abs(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def put_stream(self, path: str, chunks) -> None:
        p = self._abs(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        tmp = p + ".exon-tmp"
        with open(tmp, "wb") as f:
            for c in chunks:
                f.write(c)
        os.replace(tmp, p)

    def get_view(self, path: str):
        """Zero-copy uint8 view of the file (mmap) — the hot ingest path
        reads straight out of the page cache instead of copying into a
        Python bytes object."""
        import numpy as np

        return np.memmap(self._abs(path), dtype=np.uint8, mode="r")


class InMemoryStore(ObjectStore):
    """Fake remote store for tests (the LocalStack analog)."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}

    def put(self, path: str, data: bytes) -> None:
        self.objects[path.lstrip("/")] = data

    def list(self, prefix: str) -> list[ObjectMeta]:
        prefix = prefix.lstrip("/")
        return sorted((ObjectMeta(k, len(v)) for k, v in self.objects.items()
                       if k.startswith(prefix)), key=lambda m: m.path)

    def head(self, path: str) -> ObjectMeta:
        k = path.lstrip("/")
        if k not in self.objects:
            raise FileNotFoundError(path)
        return ObjectMeta(k, len(self.objects[k]))

    def get(self, path: str) -> bytes:
        k = path.lstrip("/")
        if k not in self.objects:
            raise FileNotFoundError(path)
        return self.objects[k]

    def get_range(self, path: str, start: int, end: int) -> bytes:
        return self.get(path)[start:end]


# Registry: scheme://host -> store. Mirrors ExonRuntimeEnvExt::register_object_store
# (exon-core/src/runtime_env/exon_runtime_env_ext.rs:28-48).
_REGISTRY: dict[str, ObjectStore] = {}
_LOCAL = LocalStore()


def register_store(url_prefix: str, store: ObjectStore) -> None:
    parsed = urlparse(url_prefix)
    _REGISTRY[f"{parsed.scheme}://{parsed.netloc}"] = store


def get_store(url: str) -> tuple[ObjectStore, str]:
    """Resolve a URL (or plain path) to (store, store-relative path)."""
    parsed = urlparse(url)
    if parsed.scheme in ("", "file"):
        return _LOCAL, parsed.path or url
    key = f"{parsed.scheme}://{parsed.netloc}"
    if key in _REGISTRY:
        return _REGISTRY[key], parsed.path.lstrip("/")
    if parsed.scheme in ("s3", "gs"):
        # auto-register a real cloud client when env supplies endpoint or
        # credentials (exon_register_object_store_url analog,
        # exon-core/src/runtime_env/exon_runtime_env_ext.rs:50-89)
        from .cloud import build_store_for_url

        store = build_store_for_url(url)
        if store is not None:
            _REGISTRY[key] = store
            return store, parsed.path.lstrip("/")
    raise ValueError(
        f"no object store registered for {key}; call register_store() "
        "(remote cloud credentials are resolved at registration time)")


def resolve_table_files(url: str, extension: Optional[str] = None) -> list[tuple[ObjectStore, ObjectMeta]]:
    """List the files behind a table path (file or directory), optionally
    filtered by extension (compression suffixes allowed on top)."""
    store, path = get_store(url)
    metas = store.list(path)
    if extension:
        exts = [extension, extension + ".gz", extension + ".zst",
                extension + ".bgz", extension + ".zstd"]
        filtered = [m for m in metas
                    if any(m.path.endswith(e) for e in exts)]
        # a directly-named file wins even with a nonmatching extension
        if not filtered and len(metas) == 1 and os.path.basename(path) == os.path.basename(metas[0].path):
            filtered = metas
        metas = filtered
    return [(store, m) for m in metas]
