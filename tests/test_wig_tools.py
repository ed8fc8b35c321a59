"""wigTools golden tests (reference cmd/wigTools)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.wig_tools import (to_training_set, wig_filter,
                                        wig_math, wig_peaks, wig_stats)

TD = "/root/reference/cmd/wigTools/testdata"
M = f"{TD}/math"

MATH = [
    ("expected.add.wig", dict(add_file=f"{M}/second.wig", missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.subtract.wig",
     dict(subtract_file=f"{M}/second.wig", missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.smooth.wig", dict(smoothing=5, missing=-10),
     "unsmooth.wig", "smooth.chrom.sizes"),
    ("expected.absError.wig",
     dict(abs_error=f"{M}/second.wig", missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.absPercentError.wig",
     dict(abs_percent_error=f"{M}/second.wig", missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.Pearson.txt",
     dict(pearson_file=f"{M}/second.wig", missing=-10,
          sampling_frequency=1), "in.wig", "genome.chrom.sizes"),
    ("expected.mult55.wig", dict(scalar_multiply=55, missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.divide4.wig", dict(scalar_divide=4, missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.min25.wig", dict(min_value=25, missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.max300.wig", dict(max_value=300, missing=-10),
     "in.wig", "genome.chrom.sizes"),
    ("expected.missing.bed", dict(missing=-10, missing_bed=True),
     "in.missing.wig", "missing.chrom.sizes"),
    ("expected.masked.wig", dict(bed_mask=f"{M}/mask.bed", missing=-10),
     "in.missing.wig", "missing.chrom.sizes"),
    ("expected.max.wig", dict(max_file=f"{M}/second.wig", missing=-10),
     "in.max.wig", "max.chrom.sizes"),
]


@pytest.mark.parametrize("exp,kw,inw,sizes", MATH,
                         ids=[c[0] for c in MATH])
def test_wig_math(tmp_path, exp, kw, inw, sizes):
    out = str(tmp_path / exp)
    wig_math(f"{M}/{inw}", f"{M}/{sizes}", out, **kw)
    assert fileio.are_equal(out, f"{M}/{exp}")


def test_wig_peaks(tmp_path):
    out = str(tmp_path / "o.bed")
    wig_peaks(f"{TD}/peaks/in_wig_1.wig", f"{TD}/peaks/genome.chrom.sizes",
              out, threshold=20)
    assert fileio.are_equal(out, f"{TD}/peaks/out_bed_1.bed")
    wig_peaks(f"{TD}/peaks/in_wig_1.wig", f"{TD}/peaks/genome.chrom.sizes",
              out, threshold=50, find_minima=True, default_value=100)
    assert fileio.are_equal(out, f"{TD}/peaks/expected.minima.bed")


def test_wig_stats(tmp_path):
    out = str(tmp_path / "o.tsv")
    wig_stats(f"{TD}/stats/test.wig", f"{TD}/stats/test.chrom.sizes",
              f"{TD}/stats/test.noGap.bed", out, missing=-10)
    assert fileio.are_equal(out, f"{TD}/stats/expected.tsv")


def test_wig_filter(tmp_path):
    out = str(tmp_path / "o.wig")
    wig_filter(f"{TD}/filter/in.filter.wig",
               f"{TD}/filter/test.filter.chrom.sizes", out, chrom="chr3")
    assert fileio.are_equal(out, f"{TD}/filter/expected.filter.wig")


def test_to_training_set_properties(tmp_path):
    """Sharding uses numpy's PRNG (Go rand stream not reproducible):
    check the union of shards matches the reference's example set."""
    T = f"{TD}/toTrainSet"
    paths = [str(tmp_path / n) for n in ("tr", "va", "te")]
    to_training_set(f"{T}/toTrainSet.wig", f"{T}/toTrainSet.fa", *paths,
                    window_size=3, stride=3, seed=5, missing=-10)
    got = set()
    for p in paths:
        lines = open(p).read().splitlines()
        assert lines[0] == "name\tseq\tvalue"
        got.update(lines[1:])
    want = set()
    for n in ("train", "validate", "test"):
        want.update(open(f"{T}/expected.{n}.txt").read().splitlines()[1:])
    assert got == want
