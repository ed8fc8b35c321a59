"""1-D Gaussian mixture EM (reference numbers/fit/mixtureModel.go) +
SAM tag query/remove API (reference sam/tag.go)."""

import numpy as np

from gonomics_tpu.numbers.fit import MixtureModel, run_mixture_model_1d
from gonomics_tpu.numbers.gorand import GoRand
from gonomics_tpu.io import sam as samio

CALLVAR_TD = "/root/reference/cmd/callVariants/testdata"


def test_mixture_model_recovers_two_gaussians():
    rng = np.random.default_rng(4)
    data = np.concatenate([rng.normal(3.0, 1.0, 3000),
                           rng.normal(12.0, 2.0, 3000)])
    mm = MixtureModel()
    converged, iters = run_mixture_model_1d(
        list(data), 2, 200, 5, 1e-10, mm, rng=GoRand(0))
    assert converged and iters > 0
    means = sorted(mm.means)
    assert abs(means[0] - 3.0) < 0.3
    assert abs(means[1] - 12.0) < 0.3
    stdev = [s for _, s in sorted(zip(mm.means, mm.stdev))]
    assert abs(stdev[0] - 1.0) < 0.3
    assert abs(stdev[1] - 2.0) < 0.4
    assert abs(sum(mm.weights) - 1.0) < 1e-9


def test_mixture_model_empty_data():
    mm = MixtureModel()
    assert run_mixture_model_1d([], 2, 100, 3, 0, mm,
                                rng=GoRand(0)) == (False, 0)


def test_sam_query_tag_bam():
    header, reads = samio.read(f"{CALLVAR_TD}/human_chrM.bam")
    tagged = [r for r in reads if getattr(r, "_raw_tags", None)]
    assert tagged
    r = tagged[0]
    # the text rendering of extra must agree with query_tag values
    samio.parse_extra(r)
    found_any = False
    for fieldtxt in r.extra.split("\t"):
        tag, typ, val = fieldtxt.split(":", 2)
        if typ in ("i", "Z", "A"):
            # query from an un-parsed copy
            r2 = tagged[0]
            value, found = samio.query_tag(r2, tag) if \
                getattr(r2, "_raw_tags", None) else (None, False)
            if found:
                found_any = True
                if typ == "i":
                    assert str(value) == val
                else:
                    assert str(value) == val
    # parse_extra consumed raw tags on r; use a fresh record for API tests
    r3 = [x for x in samio.read(f"{CALLVAR_TD}/human_chrM.bam")[1]
          if getattr(x, "_raw_tags", None)][0]
    value, found = samio.query_tag(r3, "ZZ")
    assert not found and value is None


def test_sam_add_remove_tags():
    header, reads = samio.read(f"{CALLVAR_TD}/human_chrM.bam")
    r = [x for x in reads if getattr(x, "_raw_tags", None)][0]
    samio.parse_extra(r)
    orig = r.extra
    samio.add_tag(r, "XX", "i", "42")
    assert r.extra.endswith("XX:i:42")
    samio.remove_tag(r, "XX")
    assert r.extra == orig
    samio.remove_all_tags(r)
    assert r.extra == ""
