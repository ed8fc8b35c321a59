"""bed + wig golden tests (reference cmd/bedMerge, cmd/bedToWig configs)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.bed_merge import bed_merge
from gonomics_tpu.cli.bed_to_wig import bed_to_wig
from gonomics_tpu.io import bed as bedio

BM = "/root/reference/cmd/bedMerge/testdata"
BW = "/root/reference/cmd/bedToWig/testdata"

MERGE_CASES = [
    ("test.bed", "test.merged.bed", {}),
    ("test.bed", "test.adjacent.merged.bed", dict(merge_threshold=1)),
    ("test.presorted.bed", "test.lowmem.merged.bed", dict(low_mem=True)),
    ("test.presorted.bed", "test.adjacent.lowmem.merged.bed",
     dict(merge_threshold=1, low_mem=True)),
    ("test.names.bed", "test.names.merged.bed", dict(keep_all_names=True)),
    ("test.names.bed", "test.names.adjacent.merged.bed",
     dict(merge_threshold=1, keep_all_names=True)),
    ("testPad.presorted.bed", "test.pad.merged.bed",
     dict(merge_threshold=6, low_mem=True)),
    ("testPad.presorted.bed", "test.names.pad.merged.bed",
     dict(merge_threshold=6, keep_all_names=True)),
]


@pytest.mark.parametrize("infile,expected,kwargs", MERGE_CASES,
                         ids=[c[1] for c in MERGE_CASES])
def test_bed_merge_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / "out.bed")
    bed_merge(f"{BM}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{BM}/{expected}")


WIG_CASES = [
    ("Score", "test.bed", "ref.chrom.sizes", "score.Expected.wig",
     dict(default_value=0)),
    ("Reads", "test.bed", "ref.chrom.sizes", "reads.Expected.wig",
     dict(default_value=0)),
    ("Name", "test.bed", "ref.chrom.sizes", "name.Expected.wig",
     dict(default_value=0)),
    ("Annotation", "test.annotation.bed", "annotation.chrom.sizes",
     "expected.Annotation.wig", dict(default_value=-1.0)),
    ("Annotation", "test.annotation.bed", "annotation.chrom.sizes",
     "expected.Annotation.Field2.wig",
     dict(default_value=-1.0, annotation_field=2)),
]


@pytest.mark.parametrize("method,infile,ref,expected,kwargs", WIG_CASES,
                         ids=[c[3] for c in WIG_CASES])
def test_bed_to_wig_golden(tmp_path, method, infile, ref, expected, kwargs):
    out = str(tmp_path / "out.wig")
    bed_to_wig(method, f"{BW}/{infile}", f"{BW}/{ref}", out, **kwargs)
    assert fileio.are_equal(out, f"{BW}/{expected}")


def test_bed_round_trip(tmp_path):
    recs = bedio.read(f"{BM}/test.names.bed")
    out = str(tmp_path / "rt.bed")
    bedio.write(out, recs)
    assert fileio.are_equal(out, f"{BM}/test.names.bed")
