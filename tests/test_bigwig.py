"""bigWig binary reader vs the reference's own testdata + expectations
(reference wig/bigWig/io_test.go)."""

import pytest

from gonomics_tpu.io import bigwig

TD = "/root/reference/wig/bigWig/testdata"


def test_read_headers_golden():
    bw = bigwig.read(f"{TD}/test.bw")
    h = bw.bbi_header
    assert (h.magic, h.version, h.zoom_levels) == \
        (bigwig.BIG_WIG_MAGIC, 4, 2)
    assert (h.chromosome_tree_offset, h.full_data_offset,
            h.full_index_offset) == (152, 200, 253)
    assert (h.total_summary_offset, h.uncompress_buffer_size,
            h.extension_offset) == (112, 32768, 0)
    assert [(z.reduction_level, z.data_offset, z.index_offset)
            for z in bw.zoom_headers] == [(66, 6457, 6492),
                                          (264, 12696, 12731)]
    t = bw.total_summary_block
    assert (t.bases_covered, t.min_val, t.max_val, t.sum_data,
            t.sum_squares) == (15, 6, 47, 208, 4144)
    th = bw.chrom_tree_header
    assert (th.magic, th.block_size, th.key_size, th.val_size,
            th.item_count) == (bigwig.CHROM_TREE_MAGIC, 1, 4, 8, 1)
    node = bw.chrom_tree_nodes[0]
    assert node.is_leaf and node.count == 1
    item = node.items[0]
    assert (item.key, item.chrom_id, item.chrom_size) == (b"chr1", 0, 20)
    assert bigwig.chrom_map(bw) == {"chr1": (0, 20)}


def test_read_whole_genome_file():
    bw = bigwig.read(f"{TD}/wholeGenome.bw")
    assert bw.bbi_header.magic == bigwig.BIG_WIG_MAGIC
    assert bw.chrom_tree_header.item_count >= 1
    assert bw.data_count > 0


def test_section_values_consistent_with_summary():
    # decoded values must reproduce the file's own total summary block
    bw = bigwig.read(f"{TD}/test.bw")
    t = bw.total_summary_block
    covered = 0
    total = 0.0
    squares = 0.0
    vals = []
    for _h, items in bigwig.section_values(f"{TD}/test.bw"):
        for start, end, v in items:
            covered += end - start
            total += (end - start) * v
            squares += (end - start) * v * v
            vals.append(v)
    assert covered == t.bases_covered
    assert total == pytest.approx(t.sum_data)
    assert squares == pytest.approx(t.sum_squares)
    assert min(vals) == t.min_val and max(vals) == t.max_val
