"""numbers/fit ZTNB fit + hic straw reader tests
(reference numbers/fit/ztnb_test.go, hic/hic_test.go)."""

import numpy as np
import pytest

from gonomics_tpu.io import hic
from gonomics_tpu.numbers.fit import zero_truncated_negative_binomial

HIC_TD = "/root/reference/hic/testdata"


def _nb_counts(r: float, p: float, n: int, rng) -> list[int]:
    """Histogram of NB(r, p) variates — the reference's randNegativeBinomial
    parameterization (ztnb.go:332): p = success prob of NOT drawing a count,
    i.e. numpy's negative_binomial(r, p)."""
    ks = rng.negative_binomial(r, p, size=n)
    counts = np.bincount(ks)
    return counts.tolist()


@pytest.mark.parametrize("r,p", [(1.0, 0.4), (2, 0.1), (2, 0.4), (6, 0.4)])
def test_ztnb_recovers_parameters(r, p):
    # mirrors TestZeroTruncatedNegativeBinomial (ztnb_test.go:34-79):
    # fit from (5.0, 0.5) with steps (0.1, 0.01), tolerance 0.4
    rng = np.random.default_rng(0)
    data = _nb_counts(r, p, 10000, rng)
    got_r, got_p = zero_truncated_negative_binomial(data, 5.0, 0.5, 0.1, 0.01)
    assert abs(got_r - r) <= 0.4, (got_r, r)
    assert abs(got_p - p) <= 0.4, (got_p, p)


def test_hic_read_golden():
    # hic_test.go:18-37 over testdata/strawTestFile.straw
    expected = [hic.Straw(5000, 1000, 5), hic.Straw(2000, 10000, 10)]
    actual = hic.read(f"{HIC_TD}/strawTestFile.straw")
    assert hic.all_are_equal(expected, actual)
    for a, e in zip(hic.read_to_iter(f"{HIC_TD}/strawTestFile.straw"),
                    expected):
        assert hic.equal(a, e)


def test_hic_midfile_comment_fails(tmp_path):
    # the reference only comment-skips before the FIRST record
    # (hic.go:31 EasyNextRealLine then EasyNextLine)
    f = tmp_path / "bad.straw"
    f.write_text("# leading comment ok\n1\t2\t3\n# mid comment bad\n4\t5\t6\n")
    with pytest.raises(ValueError):
        hic.read(str(f))
