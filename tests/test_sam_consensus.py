"""samConsensus + pileup CLI golden tests (reference:
cmd/samConsensus/samConsensus_test.go)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.pileup_cmd import pileup_cmd
from gonomics_tpu.cli.sam_consensus import sam_consensus

TD = "/root/reference/cmd/samConsensus/testdata"


def test_substitutions_only(tmp_path):
    out = str(tmp_path / "out.fa")
    sam_consensus(f"{TD}/test.sam", f"{TD}/test.ref.fa", out,
                  substitutions_only=True, insertion_threshold=0.9)
    assert fileio.are_equal(out, f"{TD}/test.out.fa")


def test_indels_and_multifa(tmp_path):
    out = str(tmp_path / "out.fa")
    mdir = str(tmp_path / "multiFa")
    import os

    os.makedirs(mdir)
    sam_consensus(f"{TD}/test.sam", f"{TD}/test.ref.fa", out,
                  substitutions_only=False, insertion_threshold=0.9,
                  multi_fa_dir=mdir, t_name="target", q_name="query")
    assert fileio.are_equal(out, f"{TD}/test.out.indel.fa")
    assert fileio.are_equal(f"{mdir}/chr1.fa", f"{TD}/multiFa/expected.chr1.fa")
    assert fileio.are_equal(f"{mdir}/chr2.fa", f"{TD}/multiFa/expected.chr2.fa")


def test_pileup_cmd_runs(tmp_path):
    out = str(tmp_path / "out.txt")
    pileup_cmd("/root/reference/sam/testdata/peak.bam", out)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("#Chr")
    assert len(lines) > 100
