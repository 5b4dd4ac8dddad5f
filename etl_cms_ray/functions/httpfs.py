"""Read-only HTTP filesystem on the Python standard library — the
object-store-shaped source scheme for environments without an
async-HTTP stack (fsspec's own ``http://`` implementation requires
aiohttp, which this engine does not depend on).

``stdhttp://host:port/path`` resolves through the SAME
``read_parquet_clean`` fsspec fallback branch every cloud scheme rides
(``fsspec.core.url_to_fs`` → ``PyFileSystem(FSSpecHandler(...))``),
so an e2e ingest over it proves the engine's remote-source path with
genuine network I/O: Ray read workers unpickle the filesystem and
fetch bytes over TCP from the HTTP server — nothing posix under the
hood.

Semantics (deliberately minimal, documented honestly):

- **Whole-file fetch per open.**  Plain HTTP servers (including
  Python's ``http.server``) don't guarantee Range support, and parquet
  reads seek (footer-first), so ``_open`` buffers the body and serves
  seeks from memory.  Right for config/fixture/drop-zone files —
  ingest sources are read once end-to-end anyway; a production
  object-store deployment uses pyarrow's native S3/GCS filesystems (or
  an aiohttp-backed fsspec impl) on the identical code path.
- **Read-only**: writes raise.
- **No directory listing**: HTTP has no standard listing; callers pass
  explicit file URIs (the engine's drop-zone contract already
  glob-discovers on the producer side).

Reference analog: remote acquisition is the reference's entry point 0
(``scripts/get_synpuf_files.py:65-140`` downloads source archives over
HTTP before any transform runs).
"""

from __future__ import annotations

import io
import urllib.request

import fsspec
from fsspec.spec import AbstractFileSystem


class StdlibHTTPFileSystem(AbstractFileSystem):
    """fsspec filesystem for ``stdhttp://host:port/path`` using only
    urllib.  Picklable into Ray workers (fsspec reconstructs from
    storage options; the class itself imports from the library)."""

    protocol = "stdhttp"
    cachable = False  # no state worth caching; keeps tests independent

    #: per-request timeout (seconds) — a wedged server must fail the
    #: read task (reachable by ingest_with_retry), never hang it
    timeout = 30.0

    def __init__(self, *args, timeout: float | None = None, **storage_options):
        super().__init__(*args, **storage_options)
        if timeout is not None:
            self.timeout = float(timeout)

    @classmethod
    def _strip_protocol(cls, path):
        for pre in ("stdhttp://", "stdhttp:"):
            if path.startswith(pre):
                return path[len(pre):]
        return path

    def _url(self, path: str) -> str:
        return "http://" + self._strip_protocol(path).lstrip("/")

    def _open(self, path, mode="rb", block_size=None, autocommit=True,
              cache_options=None, **kwargs):
        if mode != "rb":
            raise NotImplementedError("stdhttp:// is read-only")
        with urllib.request.urlopen(self._url(path),
                                    timeout=self.timeout) as r:
            return io.BytesIO(r.read())

    def info(self, path, **kwargs):
        req = urllib.request.Request(self._url(path), method="HEAD")
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            size = int(r.headers.get("Content-Length") or 0)
        return {"name": self._strip_protocol(path), "size": size,
                "type": "file"}

    def exists(self, path, **kwargs):
        try:
            self.info(path)
            return True
        except Exception:
            return False

    def ls(self, path, detail=True, **kwargs):
        # HTTP has no listing; a concrete file is its own listing (what
        # pyarrow's FSSpecHandler asks for when given explicit paths)
        i = self.info(path)
        return [i] if detail else [i["name"]]


fsspec.register_implementation("stdhttp", StdlibHTTPFileSystem,
                               clobber=True)
