"""lastZWriter goldens (reference: cmd/lastZWriter/lastZWriter_test.go).
Runs inside a tmp copy that mirrors the reference's relative layout so
the embedded ../../lastZWriter/testdata paths byte-match the goldens."""

import os
import shutil

import pytest

from gonomics_tpu import fileio, lastz_writer

REF_LIB_TD = "/root/reference/lastZWriter/testdata"
REF_CMD_TD = "/root/reference/cmd/lastZWriter/testdata"


@pytest.fixture
def layout(tmp_path, monkeypatch):
    shutil.copytree(REF_LIB_TD, tmp_path / "lastZWriter" / "testdata")
    os.makedirs(tmp_path / "cmd" / "lastZWriter" / "testdata")
    monkeypatch.chdir(tmp_path / "cmd" / "lastZWriter")
    return "../../lastZWriter/testdata"


def test_make_array_golden(layout):
    pw = layout
    lastz_writer.make_array("lastZInstall", pw, f"{pw}/speciesList.txt",
                            f"{pw}/refList.txt", f"{pw}/allDistsAll.txt",
                            "testdata/out.txt", True, "", "")
    assert fileio.are_equal("testdata/out.txt", f"{REF_CMD_TD}/expected.txt")
    # output directory tree (lastZWriter_test.go expectedPaths)
    assert os.path.isdir(f"{pw}/refer1.refer2/chr10")
    assert os.path.isdir(f"{pw}/refer2.name1/chr13")


def test_make_array_simple_golden(layout):
    pw = layout
    lastz_writer.make_array_simple(
        "lastZInstall", pw, f"{pw}/speciesList_simple.txt",
        f"{pw}/refList_simple.txt", "M=50 K=2200",
        "testdata/out_simple.txt", "[unmask]")
    assert fileio.are_equal("testdata/out_simple.txt",
                            f"{REF_CMD_TD}/expected_simple.txt")


def test_build_matrices(tmp_path):
    lastz_writer.build_matrices(str(tmp_path / "mats"))
    got = open(tmp_path / "mats" / "hoxD55.mat").read().splitlines()
    assert got[0] == "A\tC\tG\tT"
    assert got[1] == "A\t91\t-90\t-25\t-100"


def test_find_parameters_numeric(layout):
    pw = layout
    par, mat = lastz_writer.find_parameters(
        "refer2", "name2", f"{pw}/allDistsAll.txt", True, "")
    assert par == lastz_writer.PAR_FAR
    assert mat.endswith("hoxD55.mat")
