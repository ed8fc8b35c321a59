"""DNA base alphabet and vectorized sequence conversion.

TPU-native counterpart of the reference's ``dna`` package
(/root/reference/dna/dna.go:4-21, /root/reference/dna/convert.go:13-190).

Design notes (TPU-first):
  - A sequence is an int8 numpy/jax array of base codes. The 13-symbol
    alphabet uses the same integer codes as the reference so that record
    formats and golden files line up exactly.
  - Bit-packing (dnaTwoBit/dnaThreeBit in the reference) is intentionally
    absent: on TPU, int8 lanes on the VPU give the same bit-parallelism
    (a (8,128) int8 tile compares 1024 bases per cycle), so the packed
    representations would only add unpack overhead.
  - All string<->code conversion is table-driven numpy (O(n) vectorized),
    not per-character Python.
"""

from __future__ import annotations

import numpy as np

# Base codes — must match /root/reference/dna/dna.go:8-21 exactly.
A = 0
C = 1
G = 2
T = 3
N = 4
LOWER_A = 5
LOWER_C = 6
LOWER_G = 7
LOWER_T = 8
LOWER_N = 9
GAP = 10
DOT = 11
NIL = 12

NUM_BASES = 13

_BASE_TO_CHAR = np.frombuffer(b"ACGTNacgtn-.*", dtype=np.uint8)

# char -> code lookup (255 = invalid). '*' -> NIL per dna/convert.go:37.
_CHAR_TO_BASE = np.full(256, 255, dtype=np.uint8)
for _i, _ch in enumerate(b"ACGTNacgtn-.*"):
    _CHAR_TO_BASE[_ch] = _i

# uppercase / lowercase folding tables (dna/modify.go semantics).
_TO_UPPER = np.arange(NUM_BASES, dtype=np.int8)
_TO_UPPER[LOWER_A:LOWER_N + 1] = np.arange(A, N + 1, dtype=np.int8)
_TO_LOWER = np.arange(NUM_BASES, dtype=np.int8)
_TO_LOWER[A:N + 1] = np.arange(LOWER_A, LOWER_N + 1, dtype=np.int8)

# complement table (dna/modify.go:75-148): A<->T, C<->G, case preserved,
# N/n map to themselves, Gap/Dot/Nil map to themselves.
_COMPLEMENT = np.array(
    [T, G, C, A, N, LOWER_T, LOWER_G, LOWER_C, LOWER_A, LOWER_N, GAP, DOT, NIL],
    dtype=np.int8,
)


class InvalidBaseError(ValueError):
    pass


def from_string(s: str | bytes) -> np.ndarray:
    """StringToBases (dna/convert.go:127): strict conversion, errors on
    invalid characters."""
    raw = np.frombuffer(s.encode() if isinstance(s, str) else s, dtype=np.uint8)
    codes = _CHAR_TO_BASE[raw]
    if (codes == 255).any():
        bad = chr(int(raw[codes == 255][0]))
        raise InvalidBaseError(
            f"invalid base {bad!r}: only AaCcGgTtNn-.* are supported"
        )
    return codes.astype(np.int8)


def from_string_forced(s: str | bytes) -> np.ndarray:
    """StringToBasesForced: invalid characters are masked to N (lowercase
    invalid characters to LowerN, preserving case like the reference)."""
    raw = np.frombuffer(s.encode() if isinstance(s, str) else s, dtype=np.uint8)
    codes = _CHAR_TO_BASE[raw]
    lower = (raw >= ord("a")) & (raw <= ord("z"))
    codes = np.where(codes == 255,
                     np.where(lower, np.uint8(LOWER_N), np.uint8(N)), codes)
    return codes.astype(np.int8)


_CHAR_TO_BASE_UPPER = np.full(256, N, dtype=np.int8)
for _i, _ch in enumerate(b"ACGTN"):
    _CHAR_TO_BASE_UPPER[_ch] = _i
    _CHAR_TO_BASE_UPPER[_ch + 32] = _i  # lowercase -> upper code
_CHAR_TO_BASE_UPPER[ord("-")] = GAP
_CHAR_TO_BASE_UPPER[ord(".")] = DOT
_CHAR_TO_BASE_UPPER[ord("*")] = NIL


def from_string_upper_forced(s: str | bytes) -> np.ndarray:
    """StringToBasesForced after ToUpper, in one table lookup — the SAM
    seq-parsing hot path (case folded, invalid characters to N)."""
    raw = np.frombuffer(s.encode() if isinstance(s, str) else s,
                        dtype=np.uint8)
    return _CHAR_TO_BASE_UPPER[raw]


def to_string(seq: np.ndarray) -> str:
    """BasesToString (dna/convert.go:166)."""
    seq = np.asarray(seq)
    return _BASE_TO_CHAR[seq.astype(np.int64)].tobytes().decode()


def to_upper(seq: np.ndarray) -> np.ndarray:
    # LUT gather straight from the int8 codes: the int64 index cast used
    # to materialize an 8 B/bp temporary (8 GB at 1 Gbp)
    return _TO_UPPER[np.asarray(seq)]


def to_lower(seq: np.ndarray) -> np.ndarray:
    return _TO_LOWER[np.asarray(seq)]


def complement(seq: np.ndarray) -> np.ndarray:
    """ComplementSingleBase semantics vectorized (dna/modify.go:75)."""
    return _COMPLEMENT[np.asarray(seq).astype(np.int64)]


def reverse_complement(seq: np.ndarray) -> np.ndarray:
    return complement(np.asarray(seq))[::-1]


def count_gc(seq: np.ndarray) -> int:
    """GC count matching dna/examine.go CountGC (counts G,C,g,c)."""
    seq = np.asarray(seq)
    return int(np.isin(seq, (C, G, LOWER_C, LOWER_G)).sum())


def count_base(seq: np.ndarray, base: int) -> int:
    return int((np.asarray(seq) == base).sum())


def count_base_ignore_case(seq: np.ndarray, base: int) -> int:
    """Counts both cases of the given (upper-case) base code."""
    return int((to_upper(np.asarray(seq)) == base).sum())


def is_lower(seq: np.ndarray) -> np.ndarray:
    seq = np.asarray(seq)
    return (seq >= LOWER_A) & (seq <= LOWER_N)


def compare_seqs_case_sensitive(a: np.ndarray, b: np.ndarray) -> int:
    """Lexicographic compare matching dna.CompareSeqsCaseSensitive."""
    a, b = np.asarray(a), np.asarray(b)
    n = min(len(a), len(b))
    neq = np.nonzero(a[:n] != b[:n])[0]
    if len(neq):
        i = neq[0]
        return -1 if a[i] < b[i] else 1
    return (len(a) > len(b)) - (len(a) < len(b))


def compare_seqs_ignore_case(a: np.ndarray, b: np.ndarray) -> int:
    return compare_seqs_case_sensitive(to_upper(a), to_upper(b))


def all_gaps(n: int) -> np.ndarray:
    """CreateAllGaps (dna/dna.go:24)."""
    return np.full(n, GAP, dtype=np.int8)


def all_ns(n: int) -> np.ndarray:
    """CreateAllNs (dna/dna.go:33)."""
    return np.full(n, N, dtype=np.int8)


def dist(a: np.ndarray, b: np.ndarray) -> int:
    """Hamming distance over equal-length seqs (dna/examine.go Dist)."""
    a, b = np.asarray(a), np.asarray(b)
    if len(a) != len(b):
        raise ValueError("Dist requires equal-length sequences")
    return int((a != b).sum())


# --- melting temperature (reference: dna/calc.go) ---

# nearest-neighbor deltaH/deltaS (Allawi & SantaLucia 1997)
_NN_TABLE = {
    "selfComp": (0.0, -1.4), "endAT": (2.3, 4.1), "endGC": (0.1, -2.8),
    "AA": (-7.9, -22.2), "TT": (-7.9, -22.2), "AT": (-7.2, -20.4),
    "TA": (-7.2, -21.2), "CA": (-8.5, -22.7), "TG": (-8.5, -22.7),
    "GT": (-8.4, -22.4), "AC": (-8.4, -22.4), "CT": (-7.8, -21.0),
    "AG": (-7.8, -21.0), "GA": (-8.2, -22.2), "TC": (-8.2, -22.2),
    "CG": (-10.6, -27.2), "GC": (-9.8, -24.4), "GG": (-8.0, -19.9),
    "CC": (-8.0, -19.9),
}


def melting_temp(seq: np.ndarray) -> float:
    """dna.MeltingTemp (calc.go:56): nearest-neighbor Tm in Celsius,
    500 nM oligo+template, 50 mM Na+."""
    import math

    seq = to_upper(np.asarray(seq))
    if not np.all((seq >= A) & (seq <= T)):
        raise ValueError("non-ACGT bases are not supported for Tm")
    r_const = 1.987
    k = (250 - 250 / 2) * 1e-9
    self_comp = bool(np.array_equal(seq, reverse_complement(seq)))
    d_h = d_s = 0.0
    for b in (int(seq[0]), int(seq[-1])):
        key = "endAT" if b in (A, T) else "endGC"
        d_h += _NN_TABLE[key][0]
        d_s += _NN_TABLE[key][1]
    s = to_string(seq)
    for i in range(len(s) - 1):
        h, sv = _NN_TABLE[s[i:i + 2]]
        d_h += h
        d_s += sv
    if self_comp:
        k = 250e-9
        d_h += _NN_TABLE["selfComp"][0]
        d_s += _NN_TABLE["selfComp"][1]
    d_s += 0.368 * (len(seq) - 1) * math.log(50e-3)
    return (1000 * d_h) / (d_s + r_const * math.log(k)) - 273.15


def define_base_mask(seq: np.ndarray) -> np.ndarray:
    """dna.DefineBase vectorized (/root/reference/dna/dna.go): True for
    A/C/G/T in either case; False for N, gaps, dots, Nil."""
    s = np.asarray(seq)
    return (s < 4) | ((s >= LOWER_A) & (s <= LOWER_T))
