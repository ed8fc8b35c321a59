"""RapidMatch / MatchComp / pwmTools golden tests (reference:
motif/match.go, motif/matchComp.go, cmd/{tfMatch,tfMatchComp,pwmTools}).

The reference's own MatchComp tests compare via motif.ApproxEquals with
epsilon 1e-6 (matchComp_test.go:101); the byte-exact assertions below are
stricter than the reference's own bar wherever they hold."""

import numpy as np
import pytest

from gonomics_tpu import dna, fileio, motif
from gonomics_tpu.cli.pwm_tools import pwm_filter, pwm_format, pwm_info, \
    pwm_shuffle
from gonomics_tpu.cli.tf_match import tf_match
from gonomics_tpu.cli.tf_match_comp import tf_match_comp
from gonomics_tpu.io import fasta as fastaio

REF = "/root/reference/cmd"
MTD = "/root/reference/motif/testdata"


def test_tf_match_golden(tmp_path):
    td = f"{REF}/tfMatch/testdata"
    out = str(tmp_path / "out.bed")
    tf_match(f"{td}/chr1.upper.firstMb.fa", f"{td}/jaspar.small.txt", out)
    assert fileio.are_equal(out, f"{td}/expected.tfMatch.bed")


def _read_aln():
    recs = fastaio.read(f"{MTD}/myAln.fa")
    for r in recs:
        r.seq = dna.to_upper(r.seq)
    return recs


@pytest.mark.parametrize("kw,prop,expected,exact", [
    (dict(ref_start=100, residual_window_size=1, pseudocounts=0.1),
     0.1, "expected.myAln.bed", False),  # 2-ulp drift on 2 hash scores
    (dict(ref_start=0, residual_window_size=1, pseudocounts=5),
     0.1, "expected.myAln.highPseudo.bed", True),
    (dict(ref_start=0, residual_window_size=1, pseudocounts=0.1,
          enforce_strand_match=True),
     0.1, "expected.myAln.enforceStrand.bed", True),
    (dict(ref_start=100, residual_window_size=1, pseudocounts=0.1),
     0.8, "expected.myAln.highPropMatch.bed", True),
    (dict(ref_start=100, residual_window_size=50, pseudocounts=0.1),
     0.1, "expected.myAln.wideResidual.bed", True),
])
def test_match_comp_goldens(tmp_path, kw, prop, expected, exact):
    out = str(tmp_path / "out.bed")
    motif.match_comp(f"{MTD}/myMotifFile.txt", "Frequency", _read_aln(),
                     prop, "chr1", out, output_as_proportion=True, **kw)
    if exact:
        assert fileio.are_equal(out, f"{MTD}/{expected}")
    else:
        assert motif.approx_equals(out, f"{MTD}/{expected}", 1e-6)


def test_tf_match_comp_vertebrate(tmp_path):
    """cmd/tfMatchComp table case 1: 839 vertebrate motifs over STR012.
    ResidualWindowSize is the Go zero value (0) in that test table."""
    td = f"{REF}/tfMatchComp/testdata"
    out = str(tmp_path / "out.bed")
    tf_match_comp(f"{td}/STR012.fa", f"{td}/jaspar.vertebrate.txt", "chr9",
                  out, output_as_proportion=True, ref_start=113944,
                  residual_filter=0.1, residual_window_size=0)
    assert motif.approx_equals(out, f"{td}/expected.tfMatchComp.bed", 1e-6)
    # coordinates/names/strands must be byte-identical even where float
    # text drifts by ulps
    got = [ln.split("\t")[:6] for ln in fileio.read(out)]
    want = [ln.split("\t")[:6]
            for ln in fileio.read(f"{td}/expected.tfMatchComp.bed")]
    assert got == want


def test_pwm_format_goldens(tmp_path):
    td = f"{REF}/pwmTools/testdata"
    out = str(tmp_path / "out.txt")
    pwm_format(f"{td}/jaspar.vertebrate.txt.gz", out, in_type="Frequency",
               out_type="Probability", pseudocount=0)
    assert fileio.are_equal(out, f"{td}/expected.jaspar.ppm.txt")
    pwm_format(f"{td}/jaspar.vertebrate.txt.gz", out, in_type="Frequency",
               out_type="Probability", pseudocount=40)
    assert fileio.are_equal(out, f"{td}/expected.highPseudo.jaspar.ppm.txt")
    pwm_format(f"{td}/jaspar.vertebrate.txt.gz", out, in_type="Frequency",
               out_type="Weight", pseudocount=0.2)
    assert fileio.are_equal(out, f"{td}/expected.jaspar.pwm.txt")


def test_pwm_filter_golden(tmp_path):
    td = f"{REF}/pwmTools/testdata"
    out = str(tmp_path / "out.txt")
    pwm_filter(f"{td}/jaspar.vertebrate.txt.gz", out, min_length=10,
               max_length=15)
    assert fileio.are_equal(out, f"{td}/expected.filterMin10Max15.txt")


def test_pwm_info_golden(tmp_path):
    """Byte-exact cache sizes across 839 motifs validate the BuildKmerHash
    port's enumeration/threshold behavior."""
    td = f"{REF}/pwmTools/testdata"
    out = str(tmp_path / "out.txt")
    pwm_info(f"{td}/jaspar.vertebrate.txt.gz", out, threshold=0.8)
    assert fileio.are_equal(out, f"{td}/expected.info.txt")


def test_pwm_shuffle_property(tmp_path):
    """Go rand stream is not reproducible (COVERAGE.md limitation); assert
    column-multiset preservation + naming instead."""
    td = f"{REF}/pwmTools/testdata"
    out = str(tmp_path / "out.txt")
    pwm_shuffle(f"{td}/firstSix.jaspar.pwm.txt", out, num_shuffle=3,
                set_seed=13)
    orig = motif.read_jaspar(f"{td}/firstSix.jaspar.pwm.txt", "Frequency")
    lines = fileio.read(out)
    headers = [ln for ln in lines if ln.startswith(">")]
    assert len(headers) == 3 * len(orig)
    assert headers[0].split("\t")[1] == f"{orig[0].name}_0"
    # first shuffled matrix preserves the column multiset of the original
    first = lines[1:5]
    vals = sorted(float(v) for ln in first
                  for v in ln.replace("[", " ").replace("]", " ").split()[1:])
    assert vals == sorted(float(v) for v in np.asarray(orig[0].mat).ravel())
