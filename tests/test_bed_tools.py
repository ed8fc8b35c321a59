"""Golden tests for the BED CLI batch (reference cmd/* config tables):
bedFormat, bedMath, bedSplit, bedShear, bedSimilarity,
bedDistanceFromChrEnds, bedMinimumDistanceName, bedValueWig,
bedToAminoAcid, cigarToBed, digestGenome."""

import sys

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.bed_distance_from_chr_ends import (
    bed_distance_from_chr_ends)
from gonomics_tpu.cli.bed_format import bed_format
from gonomics_tpu.cli.bed_math import bed_math
from gonomics_tpu.cli.bed_minimum_distance_name import (
    bed_minimum_distance_name)
from gonomics_tpu.cli.bed_shear import bed_shear
from gonomics_tpu.cli.bed_similarity import (compare_two,
                                             multiple_comparisons)
from gonomics_tpu.cli.bed_split import bed_split
from gonomics_tpu.cli.bed_to_amino_acid import bed_to_amino_acid
from gonomics_tpu.cli.bed_value_wig import bed_value_wig
from gonomics_tpu.cli.cigar_to_bed import cigar_to_bed
from gonomics_tpu.cli.digest_genome import digest_genome

REF = "/root/reference/cmd"

FORMAT_CASES = [
    ("test.bed", "expected.NameFloat.bed", dict(scale_name_float=10)),
    ("test.bed", "expected.Ensembl.bed",
     dict(ucsc_to_ensembl_flag=True)),
    ("test.Ensembl.bed", "expected.UCSC.bed",
     dict(ensembl_to_ucsc_flag=True)),
    ("pad.bed", "expected.pad.bed",
     dict(even_pad=91, chrom_size_file="test.chrom.sizes")),
    ("test.bed", "expected.midpoint.bed", dict(to_midpoint=True)),
    ("test.strand.bed", "expected.tss.bed", dict(to_tss=True)),
    ("test.strand.bed", "expected.upstream.bed",
     dict(upstream_pad=23, chrom_size_file="test.chrom.sizes")),
    ("test.strand.bed", "expected.downstream.bed",
     dict(downstream_pad=13, chrom_size_file="test.chrom.sizes")),
    ("test.fdrAnnotation.bed", "expected.fdrAnnotation.bed",
     dict(fdr_annotation=True, raw_p_field=1)),
    ("test.bed", "expected.coordName.bed", dict(coord_name=True)),
]


@pytest.mark.parametrize("infile,exp,kwargs", FORMAT_CASES,
                         ids=[c[1] for c in FORMAT_CASES])
def test_bed_format(tmp_path, infile, exp, kwargs):
    td = f"{REF}/bedFormat/testdata"
    if "chrom_size_file" in kwargs:
        kwargs = dict(kwargs,
                      chrom_size_file=f"{td}/{kwargs['chrom_size_file']}")
    out = str(tmp_path / "out.bed")
    bed_format(f"{td}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{td}/{exp}")


@pytest.mark.parametrize("op,exp", [("Add", "expected.Add.bed"),
                                    ("Subtract", "expected.Sub.bed"),
                                    ("Multiply", "expected.Mult.bed"),
                                    ("Divide", "expected.Divide.bed")])
def test_bed_math(tmp_path, op, exp):
    td = f"{REF}/bedMath/testdata"
    out = str(tmp_path / "out.bed")
    bed_math(f"{td}/testA.bed", op, f"{td}/testB.bed", out)
    assert fileio.are_equal(out, f"{td}/{exp}")


@pytest.mark.parametrize("mode,expdir", [("byName", "expectedByName"),
                                         ("byChrom", "expectedByChrom")])
def test_bed_split(tmp_path, mode, expdir):
    import os
    td = f"{REF}/bedSplit/testdata"
    bed_split(mode, f"{td}/test.bed", str(tmp_path))
    for f in os.listdir(f"{td}/{expdir}"):
        assert fileio.are_equal(str(tmp_path / f), f"{td}/{expdir}/{f}")


@pytest.mark.parametrize("size,exp", [(1, "expected.1.bed"),
                                      (7, "expected.7.bed"),
                                      (80, "expected.80.bed")])
def test_bed_shear(tmp_path, size, exp):
    td = f"{REF}/bedShear/testdata"
    out = str(tmp_path / "out.bed")
    bed_shear(f"{td}/test.bed", out, size)
    assert fileio.are_equal(out, f"{td}/{exp}")


def test_bed_similarity_two(tmp_path):
    td = f"{REF}/bedSimilarity/testdata"
    out = str(tmp_path / "out.txt")
    compare_two(f"{td}/smallAJ.bed", f"{td}/largeAJ.bed", out)
    assert fileio.are_equal(out, f"{td}/expected.twoComps.txt")


def test_bed_similarity_list(tmp_path):
    td = f"{REF}/bedSimilarity/testdata"
    # the reference list.txt holds testdata/-relative paths
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        for line in fileio.read(f"{td}/list.txt"):
            f.write(f"{REF}/bedSimilarity/{line}\n")
    out = str(tmp_path / "out.txt")
    mat = str(tmp_path / "mat.txt")
    multiple_comparisons(lst, out, matrix_average=mat)
    assert fileio.are_equal(out, f"{td}/expected.list.txt")
    assert fileio.are_equal(mat, f"{td}/expected.matrixAvg.txt")
    multiple_comparisons(lst, out, matrix_components=mat)
    assert fileio.are_equal(mat, f"{td}/expected.matrixComp.txt")


@pytest.mark.parametrize("n", [1, 2])
def test_bed_distance_from_chr_ends(tmp_path, n):
    td = f"{REF}/bedDistanceFromChrEnds/testdata"
    out = str(tmp_path / "out.bed")
    bed_distance_from_chr_ends(f"{td}/input{n}.bed",
                               f"{td}/test.chrom.sizes", out)
    assert fileio.are_equal(out, f"{td}/expected{n}.bed")


@pytest.mark.parametrize("n", [1, 2, 3])
def test_bed_minimum_distance_name(tmp_path, n):
    td = f"{REF}/bedMinimumDistanceName/testdata"
    out = str(tmp_path / "out.bed")
    bed_minimum_distance_name(f"{td}/inputBed{n}.bed",
                              f"{td}/genomeBed{n}.bed", out)
    assert fileio.are_equal(out, f"{td}/expectedBed{n}.bed")


WIG_CASES = [
    ("startOneStepOne.wig", "testBMWExpected.bed", {}),
    ("startOneStepOne.wig", "testBMWExpectedNormFlagStep1.bed",
     dict(norm=True)),
    ("startOneStepOne.wig", "testMinExpected.bed", dict(use_min=True)),
    ("startOneStepOne.wig", "testAverageExpected.bed",
     dict(average=True)),
    ("testNoValue.wig", "testNoDataExpected.bed",
     dict(no_data_value=-10)),
]


@pytest.mark.parametrize("wig,exp,kwargs", WIG_CASES,
                         ids=[c[1] for c in WIG_CASES])
def test_bed_value_wig(tmp_path, wig, exp, kwargs):
    td = f"{REF}/bedValueWig/testdata"
    out = str(tmp_path / "out.bed")
    bed_value_wig(f"{td}/testBed.bed", f"{td}/{wig}",
                  f"{td}/fake.chrom.sizes", out, **kwargs)
    assert fileio.are_equal(out, f"{td}/{exp}")


def test_bed_to_amino_acid(tmp_path):
    td = f"{REF}/bedToAminoAcid/testdata"
    out = str(tmp_path / "out.txt")
    bed_to_amino_acid(f"{td}/test.bed", f"{td}/test.fasta", out)
    assert fileio.are_equal(out, f"{td}/expected.txt")


def test_cigar_to_bed(tmp_path):
    td = f"{REF}/cigarToBed/testdata/sethvsraven"
    ins = str(tmp_path / "ins.bed")
    dl = str(tmp_path / "del.bed")
    cigar_to_bed(f"{td}/seth.fa", f"{td}/raven.fa", ins_bed_out=ins,
                 del_bed_out=dl, backend="numpy",
                 out=open(str(tmp_path / "stdout.txt"), "w"))
    assert fileio.are_equal(ins, f"{td}/affineGap_sethvsraven_ins.bed")
    assert fileio.are_equal(dl, f"{td}/affineGap_sethvsraven_del.bed")


@pytest.mark.parametrize("motif,exp", [("MboI", "expected.MboI.bed"),
                                       ("C^GCG", "expected.CGCG.bed"),
                                       ("A^AGA", "expected.AAGA.bed")])
def test_digest_genome(tmp_path, motif, exp):
    td = f"{REF}/digestGenome/testdata"
    out = str(tmp_path / "out.bed")
    digest_genome(f"{td}/in.fa", motif, out)
    assert fileio.are_equal(out, f"{td}/{exp}")
