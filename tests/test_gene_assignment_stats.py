"""geneAssignmentStats golden
(reference: cmd/geneAssignmentStats/geneAssignmentStats_test.go)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.gene_assignment_stats import (
    gene_assignment_check_guide_pers, gene_assignment_stats)
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import bedpe as bedpeio

TD = "/root/reference/cmd/geneAssignmentStats/testdata"


def test_gene_assignment_stats_golden(tmp_path, capsys):
    m = str(tmp_path / "matched.bed")
    nm = str(tmp_path / "nonMatched.bed")
    gene_assignment_stats(f"{TD}/statsIn.bedpe", f"{TD}/bedTestIn.bed",
                          m, nm)
    assert fileio.are_equal(m, f"{TD}/expectedMatches.bed")
    assert fileio.are_equal(nm, f"{TD}/expectedNonMatches.bed")
    assert capsys.readouterr().out.strip() == "1.0"


def test_check_guide_pers_frequency():
    truth = bedpeio.read(f"{TD}/statsIn.bedpe")
    test = bedio.read(f"{TD}/bedTestIn.bed")
    freq, matches, non_matches = gene_assignment_check_guide_pers(truth,
                                                                  test)
    assert freq == 1.0
    assert len(matches) == 2
    assert len(non_matches) == 1
