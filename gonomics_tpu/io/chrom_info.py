"""ChromInfo records (.sizes files) — reference /root/reference/chromInfo."""

from __future__ import annotations

from dataclasses import dataclass

from .. import fileio


@dataclass(frozen=True)
class ChromInfo:
    name: str
    size: int
    order: int = 0


def read_to_slice(filename: str) -> list[ChromInfo]:
    out = []
    for i, line in enumerate(fileio.read(filename)):
        f = line.split()  # strings.Fields (chromInfo.go:60)
        out.append(ChromInfo(f[0], int(f[1]), i))
    return out


def read_to_map(filename: str) -> dict[str, ChromInfo]:
    return {c.name: c for c in read_to_slice(filename)}


def slice_to_map(chroms: list[ChromInfo]) -> dict[str, ChromInfo]:
    return {c.name: c for c in chroms}
