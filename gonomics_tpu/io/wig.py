"""Fixed-step WIG files (reference: /root/reference/wig/wig.go).

Values live in numpy float64 arrays per chromosome; writing collapses
default-value runs and re-emits fixedStep headers exactly like the
reference WriteToFileHandle.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import IO

import numpy as np

from .. import fileio
from .chrom_info import ChromInfo


@dataclass
class Wig:
    step_type: str = "fixedStep"
    chrom: str = ""
    start: int = 1
    step: int = 1
    span: int = -1   # -1 = missing
    default_value: float = 0.0
    values: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))


def go_fmt_g(x: float) -> str:
    """Go fmt %g (shortest round-trip) of float64."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "+Inf" if x > 0 else "-Inf"
    s = repr(float(x))
    if s.endswith(".0"):
        s = s[:-2]
    return s


def read_entries(filename: str) -> list[Wig]:
    """Parse raw fixedStep entries (wig.NextWig stream, eager)."""
    out: list[Wig] = []
    cur: Wig | None = None
    vals: list[float] = []
    with fileio.easy_open(filename) as f:
        for line in fileio.real_lines(f):
            if line.startswith("fixedStep"):
                if cur is not None:
                    cur.values = np.array(vals, np.float64)
                    out.append(cur)
                fields = line.split()
                kv = dict(x.split("=", 1) for x in fields[1:])
                cur = Wig(chrom=kv["chrom"], start=int(kv["start"]),
                          step=int(kv["step"]),
                          span=int(kv.get("span", -1)))
                vals = []
            elif line.startswith("variableStep"):
                raise ValueError("variableStep wig unsupported; convert to "
                                 "fixedStep first")
            else:
                if cur is None:
                    raise ValueError("wig file missing fixedStep header")
                vals.append(float(line))
    if cur is not None:
        cur.values = np.array(vals, np.float64)
        out.append(cur)
    return out


def make_skeleton(chrom_sizes: dict[str, ChromInfo],
                  default_value: float = 0.0) -> dict[str, Wig]:
    return {name: Wig(chrom=name, default_value=default_value,
                      values=np.full(ci.size, default_value, np.float64))
            for name, ci in chrom_sizes.items()}


def read(filename: str, chrom_size_file: str,
         default_value: float = 0.0) -> dict[str, Wig]:
    """wig.Read: full-genome map keyed by chrom (wig.go:172)."""
    from .chrom_info import read_to_map

    sizes = read_to_map(chrom_size_file)
    answer = make_skeleton(sizes, default_value)
    for entry in read_entries(filename):
        if entry.chrom not in answer:
            raise ValueError(f"chrom {entry.chrom} not in chrom sizes")
        tgt = answer[entry.chrom].values
        pos = entry.start - 1
        for v in entry.values:
            for _ in range(entry.step):
                if pos >= len(tgt):
                    raise ValueError("wig values exceed chrom length")
                if tgt[pos] != default_value:
                    raise ValueError("multiple wig entries map to the same "
                                     "genomic position")
                tgt[pos] = v
                pos += 1
    return answer


def write_to_handle(f: IO[str], rec: Wig) -> None:
    """WriteToFileHandle (wig.go:127): emit non-default runs with fresh
    fixedStep headers."""
    vals = np.asarray(rec.values)
    in_default = True
    for i in range(len(vals)):
        if vals[i] != rec.default_value:
            if in_default:
                in_default = False
                hdr = (f"fixedStep chrom={rec.chrom} start={rec.start + i} "
                       f"step={rec.step}")
                if rec.span != -1:
                    hdr += f" span={rec.span}"
                f.write(hdr + "\n")
            f.write(go_fmt_g(vals[i]) + "\n")
        else:
            in_default = True


def write(filename: str, records: dict[str, Wig]) -> None:
    with fileio.easy_create(filename) as f:
        for key in sorted(records):
            write_to_handle(f, records[key])
