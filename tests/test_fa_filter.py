"""faFilter golden tests (reference cmd/faFilter config table)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.fa_filter import fa_filter

TD = "/root/reference/cmd/faFilter/testdata"

CASES = [
    ("minSizeTest.fa", "minSizeExpected.fa", dict(min_size=10)),
    ("nameContainsTest.fa", "nameContainsExpected.fa",
     dict(name_contains="_maternal")),
    ("maxGCTest.fa", "maxGCExpected.fa", dict(max_gc=65)),
    ("minGCTest.fa", "minGCExpected.fa", dict(min_gc=30)),
    ("nameContainsTest.fa", "finalNbasesExpected.fa",
     dict(final_n_bases=5)),
    ("nameContainsTest.fa", "cutFinalNbasesExpected.fa",
     dict(cut_final_n_bases=5)),
    ("minSizeTest.fa", "appendExpected.fa",
     dict(append_before=f"{TD}/appendSeq.fa", append_after="ACTG")),
]


@pytest.mark.parametrize("infile,expected,kwargs", CASES,
                         ids=[c[1] for c in CASES])
def test_fa_filter_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / "out.fa")
    fa_filter(f"{TD}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}")
