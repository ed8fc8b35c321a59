"""ctypes bindings to the native host-IO runtime (native/seqio.cpp).

Builds libseqio.so on first use (g++ -O2 -lz -pthread); every entry point
has a pure-Python fallback so the package works without a toolchain.
The native BGZF path decompresses blocks across threads — this is the
C++ analog of the reference's pgzip/bgzf readers (SURVEY.md 2.5 item 6).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "seqio.cpp")
_SO = os.path.join(_HERE, "..", "native", "libseqio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-lz", "-pthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.bgzf_scan.restype = ctypes.c_int64
            lib.bgzf_scan.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.bgzf_decompress.restype = ctypes.c_int
            lib.bgzf_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int]
            lib.fastq_parse.restype = ctypes.c_int64
            lib.fastq_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.format_bed_windows.restype = ctypes.c_int64
            lib.format_bed_windows.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def bgzf_decompress(data: bytes, nthreads: int | None = None) -> bytes | None:
    """Parallel BGZF decompression; None if data isn't BGZF or the native
    lib is unavailable (callers fall back to gzip)."""
    lib = _load()
    if lib is None:
        return None
    if nthreads is None:
        nthreads = os.cpu_count() or 2
    total = lib.bgzf_scan(data, len(data))
    if total < 0:
        return None
    out = np.empty(total, np.uint8)
    rc = lib.bgzf_decompress(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), total,
                             nthreads)
    if rc != 0:
        return None
    return out.tobytes()


def fastq_parse_batch(data: bytes, max_records: int, max_len: int):
    """Parse FASTQ text to packed (names, seq_codes, quals, lengths);
    None on fallback."""
    lib = _load()
    if lib is None:
        return None
    seq = np.empty((max_records, max_len), np.int8)
    qual = np.empty((max_records, max_len), np.uint8)
    lens = np.empty(max_records, np.int32)
    name_cap = len(data)
    names = np.empty(name_cap, np.uint8)
    n = lib.fastq_parse(data, len(data), max_records, max_len,
                        seq.ctypes.data_as(ctypes.c_void_p),
                        qual.ctypes.data_as(ctypes.c_void_p),
                        lens.ctypes.data_as(ctypes.c_void_p),
                        names.ctypes.data_as(ctypes.c_void_p), name_cap)
    if n < 0:
        return None
    n = int(n)
    name_list = bytes(names.tobytes()).split(b"\n")
    name_list = [s.decode() for s in name_list[:n]]
    return name_list, seq[:n], qual[:n], lens[:n]


def format_bed_windows(name: str, starts: np.ndarray, ends: np.ndarray,
                       muts: np.ndarray) -> str | None:
    """Bulk-format faFindFast short bed lines; None if the native lib is
    unavailable (caller falls back to python string building)."""
    lib = _load()
    if lib is None:
        return None
    s = np.ascontiguousarray(starts, np.int64)
    e = np.ascontiguousarray(ends, np.int64)
    m = np.ascontiguousarray(muts, np.int64)
    n = len(s)
    cap = max(1024, (2 * len(name.encode()) + 70) * n)
    buf = ctypes.create_string_buffer(cap)
    wrote = lib.format_bed_windows(
        name.encode(), s.ctypes.data_as(ctypes.c_void_p),
        e.ctypes.data_as(ctypes.c_void_p),
        m.ctypes.data_as(ctypes.c_void_p), n, buf, cap)
    if wrote < 0:
        return None
    # string_at copies only the written span (buf.raw would copy cap)
    return ctypes.string_at(buf, int(wrote)).decode()
