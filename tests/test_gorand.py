"""Go math/rand emulation: jump-ahead internals + bit-exactness against
the reference's own seeded goldens (cmd/simulateBed expected.bed was
generated with Go rand.Seed(10))."""

import numpy as np

from gonomics_tpu.numbers import gorand as gr


def test_jump_matches_direct_emulation():
    vec0 = gr._gen_cooked_start()
    for n in (2500, 6071):
        assert (gr.direct_vrand_state(vec0, n)
                == gr.compute_cooked(n)).all()


def test_cooked_table_stored():
    # the stored table must equal the burn-in the Go source used
    # (gen_cooked.go: 7.8e12 vrand() calls from srand(1))
    cooked = gr._load_cooked()
    assert cooked.shape == (607,)
    assert cooked.dtype == np.uint64


def test_simulate_bed_oracle():
    # reproduce cmd/simulateBed expected.bed (seed 10) from the stream
    nogap = [("chr10", 50, 500000), ("chr10", 520000, 540000),
             ("chr4", 10, 4000000), ("chr2", 1, 120000000)]
    length = 1000
    wins = [(e - s) - length + 1 for (_, s, e) in nogap]
    total = sum(wins)
    exp = [ln.split("\t") for ln in open(
        "/root/reference/cmd/simulateBed/testdata/expected.bed"
    ).read().strip().split("\n")]
    exp = [(c, int(s)) for c, s, _ in exp]

    r = gr.GoRand(10)
    got = []
    for _ in range(10):
        rp = int(r.float64() * total)
        for (c, s, _e), w in zip(nogap, wins):
            if rp - w > -1:
                rp -= w
            else:
                got.append((c, s + rp))
                break
    assert got == exp


def test_intn_perm_determinism():
    r = gr.GoRand(0)
    a = [r.intn(100) for _ in range(5)]
    r.seed(0)
    b = [r.intn(100) for _ in range(5)]
    assert a == b
    r.seed(7)
    p = r.perm(10)
    assert sorted(p) == list(range(10))
