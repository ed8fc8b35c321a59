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


def easy_open(filename: str) -> IO[str]:
    """Open for reading, transparently decompressing gzip (easyio.go:16-42)."""
    if filename == "-" or filename == "/dev/stdin":
        return sys.stdin
    f = open(filename, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == GZIP_MAGIC:
        return io.TextIOWrapper(gzip.GzipFile(fileobj=f), encoding="utf-8")
    return io.TextIOWrapper(f, encoding="utf-8")


def easy_open_binary(filename: str) -> IO[bytes]:
    f = open(filename, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == GZIP_MAGIC:
        return gzip.GzipFile(fileobj=f)  # type: ignore[return-value]
    return f


def easy_create(filename: str) -> IO[str]:
    """Open for writing; gzip-compress when name ends in .gz (easyio.go:67)."""
    if filename == "-" or filename == "/dev/stdout":
        return sys.stdout
    if filename.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(filename, "wb"), encoding="utf-8")
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
