"""phylo ALS goldens: branchLengthsMultiFaBed + multiFaAcceleration
(reference cmd test tables)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.branch_lengths_multi_fa_bed import (
    branch_lengths_multi_fa_bed)
from gonomics_tpu.cli.multi_fa_acceleration import multi_fa_acceleration

REF = "/root/reference/cmd"


def test_branch_lengths_multi_fa_bed(tmp_path):
    td = f"{REF}/branchLengthsMultiFaBed/testdata"
    vel = str(tmp_path / "vel.bed")
    initial = str(tmp_path / "init.bed")
    ung = str(tmp_path / "ung.bed")
    q = str(tmp_path / "q.bed")
    branch_lengths_multi_fa_bed("chr1", f"{td}/test.fa",
                                f"{td}/test.in.bed", vel, initial, ung,
                                q_out=q)
    assert fileio.are_equal(vel, f"{td}/expected.Vel.bed")
    assert fileio.are_equal(initial, f"{td}/expected.Initial.bed")
    assert fileio.are_equal(ung, f"{td}/expected.NumUngapped.bed")
    assert fileio.are_equal(q, f"{td}/QoutExpected.bed")


ACCEL_CASES = [
    ("", False, "test.vel.expected.bed", "test.accel.expected.bed",
     "test.initialVel.expected.bed", True),
    ("test.searchspace.bed", False, "test.vel.searchspace.expected.bed",
     "test.accel.searchspace.expected.bed",
     "test.initialVel.searchspace.expected.bed", False),
    ("test.searchspace.bed", True, "test.vel.snpDistance.expected.bed",
     "test.accel.snpDistance.expected.bed",
     "test.initialVel.snpDistance.expected.bed", False),
]


@pytest.mark.parametrize("space,snp,vel_exp,acc_exp,init_exp,raw",
                         ACCEL_CASES, ids=["plain", "searchspace",
                                           "snpDistance"])
def test_multi_fa_acceleration(tmp_path, space, snp, vel_exp, acc_exp,
                               init_exp, raw):
    td = f"{REF}/multiFaAcceleration/testdata"
    vel = str(tmp_path / "vel.bed")
    acc = str(tmp_path / "acc.bed")
    initial = str(tmp_path / "init.bed")
    rv = str(tmp_path / "rv.bed") if raw else ""
    ri = str(tmp_path / "ri.bed") if raw else ""
    multi_fa_acceleration(
        f"{td}/test.fa", "chr1", vel, acc, initial,
        search_space_bed=f"{td}/{space}" if space else "",
        window_size=50, use_snp_distance=snp, raw_vel_out=rv,
        raw_initial_out=ri)
    assert fileio.are_equal(vel, f"{td}/{vel_exp}")
    assert fileio.are_equal(acc, f"{td}/{acc_exp}")
    assert fileio.are_equal(initial, f"{td}/{init_exp}")
    if raw:
        assert fileio.are_equal(rv, f"{td}/expected.RawVel.bed")
        assert fileio.are_equal(ri, f"{td}/expected.RawInitial.bed")
