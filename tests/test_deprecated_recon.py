"""Goldens for the DEPRECATED mouseRecon/primateRecon tools (reference:
cmd/DEPRECATED/{mouseRecon,primateRecon}/*_test.go — inputs are generated
in-test exactly as the reference tests do, outputs compared byte-for-byte
against the reference's checked-in expected files)."""

import numpy as np
import pytest

from gonomics_tpu import dna, fileio
from gonomics_tpu.cli.mouse_recon import mouse_recon_mra_mle
from gonomics_tpu.cli.primate_recon import (primate_recon,
                                            primate_recon_hca_mle,
                                            primate_recon_hga_mle)
from gonomics_tpu.io import fasta as fastaio

MOUSE_TD = "/root/reference/cmd/DEPRECATED/mouseRecon/testdata"
PRIM_TD = "/root/reference/cmd/DEPRECATED/primateRecon/testdata"
POSSIBLE = [dna.A, dna.C, dna.G, dna.T, dna.N, dna.GAP]


def _combos(fixed, n_free):
    """Cartesian product in the reference tests' nested-loop order:
    leftmost fixed bases, then n_free species each cycling POSSIBLE."""
    grids = np.meshgrid(*([POSSIBLE] * n_free), indexing="ij")
    free = [g.ravel().astype(np.int8) for g in grids]
    fixed_cols = [np.full(free[0].size, b, np.int8) for b in fixed]
    return fixed_cols + free


def _write_fa(path, names, cols):
    fastaio.write(str(path),
                  [fastaio.Fasta(n, c) for n, c in zip(names, cols)])


def test_mouse_recon_all_possible(tmp_path):
    cols = _combos([dna.A], 3)
    in_fa = tmp_path / "allPossible.fa"
    _write_fa(in_fa, ["mm10", "rn7", "criGriChoV2", "speTri2"], cols)

    out = tmp_path / "test.mraMleMouseBias.fa"
    mouse_recon_mra_mle(str(in_fa), str(out), f"{MOUSE_TD}/4d.mod", 0.0, 0.8)
    assert fileio.are_equal(str(out), f"{MOUSE_TD}/expected.mraMleMouseBias.fa")

    out0 = tmp_path / "test.mraMleMouseBias0.fa"
    mouse_recon_mra_mle(str(in_fa), str(out0), f"{MOUSE_TD}/4d.mod", 0.0, 0.0)
    assert fileio.are_equal(str(out0),
                            f"{MOUSE_TD}/expected.mraMleMouseBias0.fa")


@pytest.fixture()
def one_human_fa(tmp_path):
    cols = _combos([], 5)
    # human cycles A, N, Gap only (outermost loop)
    block = len(POSSIBLE) ** 4
    human = np.concatenate([np.full(block, b, np.int8)
                            for b in (dna.A, dna.N, dna.GAP)])
    rest = [c[: 3 * block] for c in cols[1:]]
    path = tmp_path / "allPossible.oneHuman.fa"
    _write_fa(path, ["hg38", "panTro6", "panPan2", "gorGor5", "ponAbe3"],
              [human] + rest)
    return str(path)


def test_primate_recon_parsimony(one_human_fa, tmp_path):
    out = tmp_path / "out.fa"
    primate_recon(one_human_fa, str(out), False)
    assert fileio.are_equal(str(out),
                            f"{PRIM_TD}/expected.humanBiasedParsimony.fa")
    primate_recon(one_human_fa, str(out), True)
    assert fileio.are_equal(str(out), f"{PRIM_TD}/expected.ParsimonyMessyToN.fa")


@pytest.mark.parametrize("human_bias,chimp_bias,nb,golden", [
    (True, False, 0.0, "expected.humanBiasedMleNoThreshold.fa"),
    (True, False, 0.99, "expected.humanBiasedMle99.fa"),
    (True, False, 0.8, "expected.humanBiasedMle80.fa"),
    (False, True, 0.8, "expected.chimpBiasedMle80.fa"),
])
def test_primate_recon_hca_biased(one_human_fa, tmp_path, human_bias,
                                  chimp_bias, nb, golden):
    out = tmp_path / "out.fa"
    primate_recon_hca_mle(one_human_fa, f"{PRIM_TD}/4d.mod", human_bias,
                          chimp_bias, 0.0, nb, False, str(out))
    assert fileio.are_equal(str(out), f"{PRIM_TD}/{golden}")


@pytest.mark.parametrize("nb,golden", [
    (0.8, "expected.gorillaBiasedHgaMle80.fa"),
    (0.99, "expected.gorillaBiasedHgaMle99.fa"),
])
def test_primate_recon_hga(one_human_fa, tmp_path, nb, golden):
    out = tmp_path / "out.fa"
    primate_recon_hga_mle(one_human_fa, f"{PRIM_TD}/4d.mod", 0.0, nb,
                          False, str(out))
    assert fileio.are_equal(str(out), f"{PRIM_TD}/{golden}")


def test_primate_recon_hca_generic_names(tmp_path):
    cols = _combos([dna.A], 4)
    in_fa = tmp_path / "allPossible.fa"
    _write_fa(in_fa, ["human", "chimp", "bonobo", "gorilla", "orangutan"],
              cols)
    out = tmp_path / "out.fa"
    primate_recon_hca_mle(str(in_fa), f"{PRIM_TD}/4d.genericNames.mod",
                          True, False, 0.0, 0.99, True, str(out))
    assert fileio.are_equal(
        str(out), f"{PRIM_TD}/expected.humanBiasedMle99.genericNames.fa")


@pytest.mark.parametrize("pt,golden", [
    (0.90, "expected.unbiased90.fa"),
    (0.99, "expected.unbiased99.fa"),
])
def test_primate_recon_hca_unbiased(tmp_path, pt, golden):
    cols = _combos([dna.A, dna.C], 4)
    in_fa = tmp_path / "allPossible.twoHumans.fa"
    _write_fa(in_fa, ["hg38", "hg38alt", "panTro6", "panPan2", "gorGor5",
                      "ponAbe3"], cols)
    out = tmp_path / "out.fa"
    primate_recon_hca_mle(str(in_fa), f"{PRIM_TD}/4d.2h.mod", False, False,
                          pt, 0.0, False, str(out))
    assert fileio.are_equal(str(out), f"{PRIM_TD}/{golden}")
