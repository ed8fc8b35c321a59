"""BigWig (BBI version 4) binary reader.

Counterpart of /root/reference/wig/bigWig (bigWig.go:18-93, io.go:11-100):
BBI header, zoom headers, total-summary block, and the chromosome B+ tree.
Little-endian only, like the reference. The reference parses headers only;
`section_values` here additionally decodes the main data sections into
per-chromosome value arrays (fixedStep/varStep/bedGraph), which the wig
layer can consume directly.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from .. import fileio

BIG_WIG_MAGIC = 2291137574
BIG_WIG_MAGIC_BIG_ENDIAN = 654086024
CHROM_TREE_MAGIC = 2026540177
CHROM_TREE_MAGIC_BIG_ENDIAN = 2441923192


@dataclass
class BbiHeader:
    magic: int = 0
    version: int = 0
    zoom_levels: int = 0
    chromosome_tree_offset: int = 0
    full_data_offset: int = 0
    full_index_offset: int = 0
    field_count: int = 0
    defined_field_count: int = 0
    auto_sql_offset: int = 0
    total_summary_offset: int = 0
    uncompress_buffer_size: int = 0
    extension_offset: int = 0


@dataclass
class ZoomHeader:
    reduction_level: int = 0
    reserved: int = 0
    data_offset: int = 0
    index_offset: int = 0


@dataclass
class TotalSummaryBlock:
    bases_covered: int = 0
    min_val: float = 0.0
    max_val: float = 0.0
    sum_data: float = 0.0
    sum_squares: float = 0.0


@dataclass
class ChromTreeHeader:
    magic: int = 0
    block_size: int = 0
    key_size: int = 0
    val_size: int = 0
    item_count: int = 0
    reserved: int = 0


@dataclass
class ChromTreeItem:
    key: bytes = b""
    chrom_id: int = 0
    chrom_size: int = 0
    child_offset: int = 0


@dataclass
class ChromTreeNode:
    is_leaf: bool = False
    reserved: int = 0
    count: int = 0
    items: list[ChromTreeItem] = field(default_factory=list)


@dataclass
class BigWig:
    bbi_header: BbiHeader = field(default_factory=BbiHeader)
    zoom_headers: list[ZoomHeader] = field(default_factory=list)
    total_summary_block: TotalSummaryBlock = \
        field(default_factory=TotalSummaryBlock)
    chrom_tree_header: ChromTreeHeader = field(default_factory=ChromTreeHeader)
    chrom_tree_nodes: list[ChromTreeNode] = field(default_factory=list)
    data_count: int = 0


class _Cursor:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def take(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals


def read(filename: str) -> BigWig:
    """bigWig.Read (io.go:11)."""
    with fileio.easy_open_binary(filename) as f:
        data = f.read()
    c = _Cursor(data)
    ans = BigWig()
    h = ans.bbi_header
    (h.magic,) = c.take("I")
    if h.magic == BIG_WIG_MAGIC_BIG_ENDIAN:
        raise ValueError("bigWig file appears to be in big endian; only "
                         "little endian is supported (io.go:33)")
    if h.magic != BIG_WIG_MAGIC:
        raise ValueError(f"bigWig magic was not as expected. Found: "
                         f"{h.magic}. Expected: {BIG_WIG_MAGIC}.")
    (h.version, h.zoom_levels, h.chromosome_tree_offset, h.full_data_offset,
     h.full_index_offset, h.field_count, h.defined_field_count,
     h.auto_sql_offset, h.total_summary_offset, h.uncompress_buffer_size,
     h.extension_offset) = c.take("HHQQQHHQQIQ")
    if h.field_count != 0:
        raise ValueError("bigWig header fieldCount field must be zero")
    if h.defined_field_count != 0:
        raise ValueError("bigWig header definedFieldCount must be zero")
    if h.auto_sql_offset != 0:
        raise ValueError("bigWig header AutoSqlOffset field must be zero")

    for _ in range(h.zoom_levels):
        z = ZoomHeader()
        (z.reduction_level, z.reserved, z.data_offset,
         z.index_offset) = c.take("IIQQ")
        ans.zoom_headers.append(z)

    t = ans.total_summary_block
    (t.bases_covered, t.min_val, t.max_val, t.sum_data,
     t.sum_squares) = c.take("Qdddd")

    th = ans.chrom_tree_header
    (th.magic,) = c.take("I")
    if th.magic == CHROM_TREE_MAGIC_BIG_ENDIAN:
        raise ValueError("big endian chromosome tree header unsupported")
    if th.magic != CHROM_TREE_MAGIC:
        raise ValueError(f"expected chromosome tree magic "
                         f"({CHROM_TREE_MAGIC}), found: {th.magic}")
    (th.block_size, th.key_size, th.val_size, th.item_count,
     th.reserved) = c.take("IIIQQ")
    if th.reserved != 0:
        raise ValueError("chromosome tree header reserved field must be 0")

    num_items = 0
    while num_items < th.item_count:
        node = ChromTreeNode()
        is_leaf, node.reserved, node.count = c.take("?BH")
        node.is_leaf = bool(is_leaf)
        for _ in range(node.count):
            item = ChromTreeItem()
            item.key = bytes(c.take(f"{th.key_size}s")[0])
            if node.is_leaf:
                item.chrom_id, item.chrom_size = c.take("II")
            else:
                (item.child_offset,) = c.take("Q")
            node.items.append(item)
            num_items += 1
        ans.chrom_tree_nodes.append(node)

    c.pos = h.full_data_offset
    (ans.data_count,) = c.take("I")
    return ans


def chrom_map(bw: BigWig) -> dict[str, tuple[int, int]]:
    """{chrom name: (id, size)} from the tree's leaf items."""
    out = {}
    for node in bw.chrom_tree_nodes:
        if node.is_leaf:
            for it in node.items:
                out[it.key.rstrip(b"\x00").decode()] = (it.chrom_id,
                                                        it.chrom_size)
    return out


@dataclass
class BinaryWigSectionHeader:
    chrom_id: int = 0
    chrom_start: int = 0
    chrom_end: int = 0
    item_step: int = 0
    item_span: int = 0
    type: int = 0       # 1 bedGraph, 2 varStep, 3 fixedStep
    reserved: int = 0
    item_count: int = 0


def section_values(filename: str):
    """Decode the main data sections: yields
    (BinaryWigSectionHeader, [(start, end, value), ...]) per section.
    Goes beyond the reference's header-only reader so wig tooling can
    consume bigWig values directly (R-tree index is skipped; sections are
    walked sequentially via the R-tree leaves)."""
    with fileio.easy_open_binary(filename) as f:
        data = f.read()
    bw = read(filename)
    compressed = bw.bbi_header.uncompress_buffer_size != 0
    # walk the R tree leaves for section offsets
    c = _Cursor(data, bw.bbi_header.full_index_offset)
    magic, block_size, item_count, start_cid, start_base, end_cid, \
        end_base, end_file_offset, items_per_slot, reserved = \
        c.take("IIQIIIIQII")
    sections = []

    def walk(pos: int):
        cc = _Cursor(data, pos)
        is_leaf, _r, count = cc.take("?BH")
        for _ in range(count):
            if is_leaf:
                (_scid, _sb, _ecid, _eb, off, size) = cc.take("IIIIQQ")
                sections.append((off, size))
            else:
                (_scid, _sb, _ecid, _eb, child) = cc.take("IIIIQ")
                walk(child)

    walk(c.pos)
    for off, size in sections:
        raw = data[off:off + size]
        if compressed:
            raw = zlib.decompress(raw)
        sc = _Cursor(raw)
        while sc.pos < len(raw):
            h = BinaryWigSectionHeader()
            (h.chrom_id, h.chrom_start, h.chrom_end, h.item_step,
             h.item_span, h.type, h.reserved, h.item_count) = \
                sc.take("IIIIIBBH")
            vals = []
            if h.type == 3:    # fixedStep
                pos = h.chrom_start
                for _ in range(h.item_count):
                    (v,) = sc.take("f")
                    vals.append((pos, pos + h.item_span, v))
                    pos += h.item_step
            elif h.type == 2:  # varStep
                for _ in range(h.item_count):
                    start, v = sc.take("If")
                    vals.append((start, start + h.item_span, v))
            else:              # bedGraph
                for _ in range(h.item_count):
                    start, end, v = sc.take("IIf")
                    vals.append((start, end, v))
            yield h, vals
