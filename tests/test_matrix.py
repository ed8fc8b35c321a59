"""numbers/matrix unit values (reference numbers/matrix/matrix_test.go)
+ reconstructSeq subMatrix mode consistency."""

import numpy as np

from gonomics_tpu.cli.reconstruct_seq import reconstruct_seq
from gonomics_tpu.numbers import matrix as M
from gonomics_tpu.phylo.etree import (parse_substitution_matrix,
                                      populate_substitution_matrices,
                                      read_newick)

JC = [[0.91, 0.03, 0.03, 0.03], [0.03, 0.91, 0.03, 0.03],
      [0.03, 0.03, 0.91, 0.03], [0.03, 0.03, 0.03, 0.91]]


def test_fractional_exponentiation():
    assert M.approx_equal(
        M.fractional_symmetric_matrix_exponentiation(JC, 0),
        np.eye(4), 1e-6)
    assert np.allclose(
        M.fractional_symmetric_matrix_exponentiation(JC, 500),
        np.full((4, 4), 0.25), atol=1e-6)
    half = M.fractional_symmetric_matrix_exponentiation(JC, 0.5)
    assert abs(half[0, 0] - 0.954) < 1e-2
    assert abs(half[0, 1] - 0.0154) < 1e-3
    assert np.allclose(
        M.fractional_symmetric_matrix_exponentiation(JC, 1), JC)


def test_dense_log_symmetric():
    logm = M.dense_log_symmetric([[4, 1], [1, 4]])
    want = [[1.3540251005511048, 0.25541281188299536],
            [0.25541281188299536, 1.3540251005511048]]
    assert np.allclose(logm, want, atol=1e-6)


def test_rref():
    assert M.rref([[1, 1, 7], [1, 2, 11]]) == [[1, 0, 3], [0, 1, 4]]
    assert M.rref([[1, 2, -1, -4], [2, 3, -1, -11], [-2, 0, -3, 22]]) == \
        [[1, 0, 0, -8], [0, 1, 0, 1], [0, 0, 1, -2]]


def test_is_symmetric():
    assert M.is_symmetric([[4, 1], [1, 4]])
    assert M.is_symmetric([[10, 1, 1], [1, 10, 1], [1, 1, 10]])
    assert not M.is_symmetric([[10, 1, 2], [1, 10, 1], [1, 1, 10]])


def test_populate_substitution_matrices(tmp_path):
    nh = tmp_path / "t.nh"
    nh.write_text("((a:0.09,b:0.18)ab:0.09,c:0.09)r;")
    root = read_newick(str(nh))
    populate_substitution_matrices(root, JC, 0.09)
    assert np.allclose(root.left.left.substitution_matrix, JC)
    sq = M.fractional_symmetric_matrix_exponentiation(JC, 2)
    assert np.allclose(root.left.right.substitution_matrix, sq)


def test_sub_matrix_mode_matches_default_model(tmp_path):
    """The default unit matrix at unitBranchLength == t reproduces the
    default mutationProbability model with branch lengths t=0.09."""
    nh = tmp_path / "t.nh"
    nh.write_text("((human:0.09,chimp:0.09)hca:0.09,gorilla:0.09)hga;")
    fa = tmp_path / "in.fa"
    fa.write_text(">human\nACGTACGTAANN\n>chimp\nACGTACCTAAGG\n"
                  ">gorilla\nACGAACGTAAGC\n")
    o1, o2 = str(tmp_path / "o1.fa"), str(tmp_path / "o2.fa")
    reconstruct_seq(str(nh), str(fa), o1)
    reconstruct_seq(str(nh), str(fa), o2, sub_matrix=True,
                    unit_branch_length=0.09)
    assert open(o1).read() == open(o2).read()


def test_parse_substitution_matrix(tmp_path):
    assert parse_substitution_matrix("") == JC
    f = tmp_path / "m.tsv"
    f.write_text("0.7\t0.1\t0.1\t0.1\n0.1\t0.7\t0.1\t0.1\n"
                 "0.1\t0.1\t0.7\t0.1\n0.1\t0.1\t0.1\t0.7\n")
    assert parse_substitution_matrix(str(f))[0] == [0.7, 0.1, 0.1, 0.1]
