"""Golden tests for maf IO + mafFilter/mafToBed/mafToMultiFa/mafIndels
(reference cmd test tables)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.maf_tools import (maf_filter, maf_indels, maf_to_bed,
                                        maf_to_multi_fa)
from gonomics_tpu.io import maf as mafio

REF = "/root/reference/cmd"


def test_maf_round_trip(tmp_path):
    src = f"{REF}/mafFilter/testdata/chr22.test.maf"
    out = str(tmp_path / "rt.maf")
    mafio.write(out, mafio.read(src))
    blocks_a, blocks_b = mafio.read(src), mafio.read(out)
    assert len(blocks_a) == len(blocks_b)
    assert all(a.score == b.score for a, b in zip(blocks_a, blocks_b))


def test_maf_filter(tmp_path):
    td = f"{REF}/mafFilter/testdata"
    out = str(tmp_path / "out.maf")
    maf_filter(f"{td}/chr22.test.maf", out, 10000)
    assert fileio.are_equal(out, f"{td}/expected.chr22.maf")


def test_maf_to_bed(tmp_path):
    td = f"{REF}/mafToBed/testdata"
    out = str(tmp_path / "out.bed")
    maf_to_bed(f"{td}/chr22.test.maf", out, "hg38")
    assert fileio.are_equal(out, f"{td}/expected.bed")


def test_maf_to_multi_fa(tmp_path):
    td = f"{REF}/mafToMultiFa/testdata"
    out = str(tmp_path / "out.fa")
    maf_to_multi_fa(f"{td}/test1.maf", f"{td}/test.ref.fa",
                    f"{td}/test.species.list", out)
    assert fileio.are_equal(out, f"{td}/test.out.fa")


def test_maf_indels(tmp_path):
    td = f"{REF}/mafIndels/testdata"
    ins, dl = str(tmp_path / "ins.bed"), str(tmp_path / "del.bed")
    maf_indels(f"{td}/in_hg38_vs_rheMac10_1.maf", "hg38", "rheMac10",
               0.1, ins, dl)
    assert fileio.are_equal(ins, f"{td}/outIns_hg38_1.bed")
    assert fileio.are_equal(dl, f"{td}/outDel_rheMac10_1.bed")
