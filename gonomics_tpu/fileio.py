"""Transparent-compression file IO + golden-file comparison helpers.

Counterpart of the reference ``fileio`` package
(/root/reference/fileio/easyio.go:16-67, /root/reference/fileio/fileio.go:173-208).

The reference wraps every reader/writer in pgzip-aware "Easy" handles and
treats '#'-prefixed lines as comments. Here:
  - ``easy_open`` sniffs gzip magic (not extension) and returns a text handle.
  - ``easy_create`` gzips when the filename ends in .gz.
  - "-" means stdin/stdout, matching fileio's stdin magic.
"""

from __future__ import annotations

import gzip
import io
import os
import sys
from typing import Iterator, IO

GZIP_MAGIC = b"\x1f\x8b"


def _is_url(filename: str) -> bool:
    # the reference dispatches on `strings.Contains(filename, "http")`
    # (easyio.go:33) — we require a real scheme prefix so local files
    # with "http" in the name still open as files
    return filename.startswith(("http://", "https://"))


def _open_url(filename: str) -> IO[bytes]:
    """fileio.EasyHttp (http.go:14-30): stream a URL; gunzip when the
    url ends in .gz (URL responses are not seekable, so suffix-based
    like the reference rather than magic-sniffed)."""
    from urllib.request import urlopen

    resp = urlopen(filename)
    if filename.endswith(".gz"):
        return gzip.GzipFile(fileobj=resp)  # type: ignore[return-value]
    return resp


def easy_open(filename: str) -> IO[str]:
    """Open for reading, transparently decompressing gzip (easyio.go:16-42);
    http(s):// URLs stream via EasyHttp semantics (http.go:14-30)."""
    if filename == "-" or filename == "/dev/stdin":
        return sys.stdin
    if _is_url(filename):
        return io.TextIOWrapper(_open_url(filename), encoding="utf-8")
    f = open(filename, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == GZIP_MAGIC:
        return io.TextIOWrapper(gzip.GzipFile(fileobj=f), encoding="utf-8")
    return io.TextIOWrapper(f, encoding="utf-8")


def easy_open_binary(filename: str) -> IO[bytes]:
    if _is_url(filename):
        return _open_url(filename)
    f = open(filename, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == GZIP_MAGIC:
        return gzip.GzipFile(fileobj=f)  # type: ignore[return-value]
    return f


def cat_url(url: str) -> str:
    """fileio.CatUrl (http.go:30-37): the whole URL as newline-joined
    non-comment lines."""
    with easy_open(url) as f:
        return "".join(ln if ln.endswith("\n") else ln + "\n" for ln in f)


class ParallelGzipFile(io.RawIOBase):
    """Write-only gzip sink that compresses 1 MiB blocks across threads
    through native compress_blocks (the pgzip-parallel analog of
    fileio/easyio.go:42); output is a standard multi-member gzip stream.
    Buffers ~8 MiB of uncompressed bytes per flush so the thread pool
    has enough independent blocks to chew on."""

    FLUSH_AT = 8 << 20

    def __init__(self, filename: str):
        super().__init__()
        self._fh = open(filename, "wb")
        self._buf: list[bytes] = []
        self._size = 0

    def writable(self) -> bool:
        return True

    def write(self, b) -> int:
        b = bytes(b)
        self._buf.append(b)
        self._size += len(b)
        if self._size >= self.FLUSH_AT:
            self._flush_blocks()
        return len(b)

    def _flush_blocks(self) -> None:
        if not self._size:
            return
        from . import native

        data = b"".join(self._buf)
        self._buf = []
        self._size = 0
        comp = native.compress_blocks(data, bgzf=False)
        if comp is None:  # no native lib: stdlib fallback
            comp = gzip.compress(data, compresslevel=6)
        self._fh.write(comp)

    def close(self) -> None:
        if not self.closed:
            try:
                self._flush_blocks()
                self._fh.close()
            finally:
                super().close()


def easy_create(filename: str) -> IO[str]:
    """Open for writing; gzip-compress when name ends in .gz — block-
    parallel across threads via the native runtime (easyio.go:67 wraps
    every writer in pgzip the same way)."""
    if filename == "-" or filename == "/dev/stdout":
        return sys.stdout
    if filename.endswith(".gz"):
        return io.TextIOWrapper(io.BufferedWriter(ParallelGzipFile(filename)),
                                encoding="utf-8")
    return open(filename, "w", encoding="utf-8")


def read(filename: str) -> list[str]:
    """fileio.Read: every non-comment line of a file (fileio.go:24)."""
    with easy_open(filename) as f:
        return [ln.rstrip("\n") for ln in f if not ln.startswith("#")]


def next_real_line(f: IO[str]) -> str | None:
    """EasyNextRealLine: next non-comment line, None at EOF."""
    for ln in f:
        if not ln.startswith("#"):
            return ln.rstrip("\n")
    return None


def real_lines(f: IO[str]) -> Iterator[str]:
    for ln in f:
        if not ln.startswith("#"):
            yield ln.rstrip("\n")


def _contents(path: str, keep_comments: bool) -> list[str]:
    with easy_open_binary(path) as f:
        data = f.read()
    lines = data.decode("utf-8", errors="surrogateescape").split("\n")
    if not keep_comments:
        lines = [ln for ln in lines if not ln.startswith("#")]
    return lines


def are_equal(a: str, b: str) -> bool:
    """Byte-level golden-file equality (fileio.go:179 AreEqual)."""
    return _contents(a, True) == _contents(b, True)


def are_equal_ignore_comments(a: str, b: str) -> bool:
    return _contents(a, False) == _contents(b, False)


def are_equal_ignore_order(a: str, b: str) -> bool:
    """fileio.go:186 AreEqualIgnoreOrder (comment lines excluded, like Read)."""
    la, lb = read(a), read(b)
    return sorted(la) == sorted(lb)


def must_remove(path: str) -> None:
    os.remove(path)


def go_v(x: float) -> str:
    """Go fmt %v float formatting (shortest round-trip repr)."""
    s = repr(float(x))
    return s[:-2] if s.endswith(".0") else s
