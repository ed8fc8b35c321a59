"""UCSC net format: hierarchical fill/gap alignment nets built off chains.

Counterpart of /root/reference/chain/net (net.go:15-216, toBed.go:23-110,
methods.go). Nets are indentation-structured: each line's leading spaces
determine its level via the Key stack (determineLevel, net.go:101-135).
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import fileio
from .bed import Bed
from .chrom_info import ChromInfo


@dataclass
class Net:
    t_name: str = ""
    level: int = 0
    klass: str = ""
    t_start: int = 0
    t_size: int = 0
    q_name: str = ""
    orientation: bool = True
    q_start: int = 0
    q_size: int = 0
    extra_fields: str = ""
    spaces: int = 0

    # interval protocol (methods.go)
    @property
    def chrom(self) -> str:
        return self.t_name

    @property
    def chrom_start(self) -> int:
        return self.t_start

    @property
    def chrom_end(self) -> int:
        return self.t_start + self.t_size


def _determine_level(data: list[str], level: int, spaces: int,
                     key: list[int]):
    """determineLevel (net.go:101): leading-space count -> level, using the
    Key stack of levels per indentation depth."""
    n_sp = 0
    for w in data:
        if w == "":
            n_sp += 1
        else:
            break
    data = data[n_sp:]
    if n_sp == spaces:
        return level, n_sp, key, data
    if n_sp > spaces:
        if data[0] == "fill":
            level += 1
        key = key + [level]
        return level, n_sp, key, data
    # n_sp < spaces
    if data[0] == "fill":
        level = key[n_sp]
    elif data[0] == "gap":
        level = key[n_sp - 1]
    key = key[:n_sp]
    return level, n_sp, key, data


def read(filename: str) -> tuple[list[Net], dict[str, ChromInfo]]:
    """net.Read (net.go:38): nets + {chrom: ChromInfo} from the net
    headers."""
    answer: list[Net] = []
    mp: dict[str, ChromInfo] = {}
    cur_tname = ""
    level, spaces, key = 0, 0, [0]
    with fileio.easy_open(filename) as f:
        for line in fileio.real_lines(f):
            data = line.split(" ")
            if data[0] == "net":
                cur_tname = data[1]
                mp[data[1]] = ChromInfo(data[1], int(data[2]))
                level, spaces, key = 0, 0, [0]
                continue
            level, spaces, key, nd = _determine_level(data, level, spaces,
                                                      key)
            answer.append(Net(
                t_name=cur_tname, level=level, klass=nd[0],
                t_start=int(nd[1]), t_size=int(nd[2]), q_name=nd[3],
                orientation=nd[4] == "+", q_start=int(nd[5]),
                q_size=int(nd[6]), extra_fields=" ".join(nd[7:]),
                spaces=spaces))
    return answer, mp


def to_string(n: Net, spaces: bool = True) -> str:
    """net.ToString (net.go:155)."""
    s = " " * n.spaces if spaces else ""
    strand = "+" if n.orientation else "-"
    return (f"{s}{n.klass} {n.t_start} {n.t_size} {n.q_name} {strand} "
            f"{n.q_start} {n.q_size} {n.extra_fields}")


def write(filename: str, nets: list[Net],
          chrom_sizes: dict[str, ChromInfo]) -> None:
    """net.Write (net.go:139): net headers re-emitted on chrom change."""
    prev = ""
    with fileio.easy_create(filename) as f:
        for n in nets:
            if n.t_name != prev:
                f.write(f"net {n.t_name} {chrom_sizes[n.t_name].size}\n")
            f.write(to_string(n, True) + "\n")
            prev = n.t_name


def _ints(nums: list[int]) -> str:
    """fileio.IntSliceToString (byteio.go:155): trailing comma included."""
    return "".join(f"{v}," for v in nums)


@dataclass
class _Anno:
    thick_start: int = 0
    thick_end: int = 0
    item_rgb: str = ""
    block_count: int = 0
    block_sizes: list = None
    block_starts: list = None


_LEVEL_RGB = {1: "153,204,102", 2: "246,237,100", 3: "234,51,35",
              4: "124,199,216", 5: "182,155,197"}


def _anno_strings(a: _Anno, lvl: int) -> list[str]:
    rgb = _LEVEL_RGB.get(lvl, "0,0,0")
    return [str(a.thick_start), str(a.thick_end), rgb, str(a.block_count),
            _ints(a.block_sizes), _ints(a.block_starts)]


def _create_bed(n: Net) -> Bed:
    return Bed(chrom=n.t_name, chrom_start=n.t_start,
               chrom_end=n.t_start + n.t_size,
               name=f"{n.q_name}_{n.q_start}_{n.q_start + n.q_size}",
               score=n.level, strand="+" if n.orientation else "-",
               fields_initialized=7, annotation=[])


def _format_all(beds: list[Bed], annos: list[_Anno]) -> list[Bed]:
    for i, b in enumerate(beds):
        a = annos[i]
        if a.block_count != len(a.block_sizes):
            a.block_sizes.append((b.chrom_end - b.chrom_start)
                                 - a.block_starts[-1])
        b.annotation = _anno_strings(a, i + 1)
    return beds


def to_bed(nets: list[Net]) -> list[Bed]:
    """net.ToBed (toBed.go:23): fills become extended bed records whose
    blocks are the aligned spans between same-level gaps; RGB encodes the
    net level. Output order matches the reference (a fill is emitted when
    its level is next refilled, so not necessarily position-sorted)."""
    prev_chrom = nets[0].t_name
    ans: list[Bed] = []
    cur_bed: list[Bed] = []
    cur_anno: list[_Anno] = []
    highest = 0
    for n in nets:
        if n.t_name != prev_chrom:
            ans.extend(_format_all(cur_bed, cur_anno))
            cur_bed, cur_anno = [], []
            highest = 0
        lvl = n.level - 1
        if n.klass == "fill":
            if n.level > highest:
                highest = n.level
                cur_bed.append(Bed())
                cur_anno.append(_Anno())
            else:
                a = cur_anno[lvl]
                b = cur_bed[lvl]
                a.block_sizes.append((b.chrom_end - b.chrom_start)
                                     - a.block_starts[-1])
                b.annotation = _anno_strings(a, n.level)
                ans.append(b)
            cur_bed[lvl] = _create_bed(n)
            cur_anno[lvl] = _Anno(thick_start=n.t_start, thick_end=n.t_start,
                                  item_rgb="0,0,0", block_count=1,
                                  block_sizes=[], block_starts=[0])
        else:
            a = cur_anno[lvl]
            b = cur_bed[lvl]
            a.block_count += 1
            a.block_sizes.append((n.t_start - b.chrom_start)
                                 - a.block_starts[-1])
            a.block_starts.append((n.t_start - b.chrom_start) + n.t_size)
        prev_chrom = n.t_name
    ans.extend(_format_all(cur_bed, cur_anno))
    return ans
