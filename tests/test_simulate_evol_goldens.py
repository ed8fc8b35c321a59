"""simulateEvol byte-parity against the reference goldens
(/root/reference/cmd/simulateEvol/testdata, cases from nonCoding_test.go
and withIndels_test.go)."""

import os

import pytest

from gonomics_tpu.cli.simulate_evol import non_coding, with_indels

T = "/root/reference/cmd/simulateEvol/testdata"
pytestmark = pytest.mark.skipif(not os.path.isdir(T),
                                reason="reference testdata not present")


def _eq(a, b):
    with open(a) as f, open(b) as g:
        assert f.read() == g.read()


def test_non_coding_generated_tree(tmp_path):
    fa = str(tmp_path / "o.fa")
    nh = str(tmp_path / "o.nh")
    non_coding(fa, set_seed=29, num_nodes=17, gamma_alpha=1, gamma_beta=50,
               gc_content=0.41, len_seq=50, unit_branch_length=-100,
               newick_out=nh)
    _eq(fa, f"{T}/expected.NonCoding.fa")
    _eq(nh, f"{T}/expected.NewickOut.nh")


def test_non_coding_premade_tree_and_matrix(tmp_path):
    fa = str(tmp_path / "o.fa")
    nh = str(tmp_path / "o.nh")
    non_coding(fa, tree_file=f"{T}/newickLongBranches.txt",
               fasta_file=f"{T}/rand.fa", set_seed=31, gamma_alpha=1,
               gamma_beta=50, gc_content=0.41, len_seq=50,
               substitution_matrix_file=f"{T}/substitutionMatrix.txt",
               unit_branch_length=0.5, newick_out=nh)
    _eq(fa, f"{T}/expected.NonCoding.preMade.fa")
    _eq(nh, f"{T}/expected.NewickOut.PreMade.nh")


def test_with_indels(tmp_path):
    fa = str(tmp_path / "o.fa")
    vcf = str(tmp_path / "o.vcf")
    with_indels(f"{T}/rand.fa", fa, lambda_=1, prop_indels=0.2,
                branch_length=0.1, gc_content=0.42, set_seed=-1,
                transition_bias=1, vcf_out_file=vcf, q_name="sim")
    _eq(fa, f"{T}/expected.branchLength.fa")
    _eq(vcf, f"{T}/expected.branchLength.vcf")
