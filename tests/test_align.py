"""Pairwise alignment tests: oracle self-consistency, kernel-vs-oracle
equality, and the globalAlignment golden files
(reference: cmd/globalAlignment/testdata, align semantics)."""

import io

import numpy as np
import pytest

from gonomics_tpu import dna
from gonomics_tpu.align import (DEFAULT, HUMAN_CHIMP_TWO, affine_gap,
                                const_gap, go_format, print_cigar, view)
from gonomics_tpu.align import oracle
from gonomics_tpu.align.cigar import COL_D, COL_I, COL_M

REF = "/root/reference"


def _consumed(route):
    a = sum(c.run_length for c in route if c.op in (COL_M, COL_D))
    b = sum(c.run_length for c in route if c.op in (COL_M, COL_I))
    return a, b


def _score_of_route(alpha, beta, route, scores, gap):
    """Independent check: replay a constGap cigar and accumulate score."""
    s = 0
    i = j = 0
    for c in route:
        for _ in range(c.run_length):
            if c.op == COL_M:
                s += int(scores[alpha[i], beta[j]])
                i += 1
                j += 1
            else:
                s += gap
                if c.op == COL_I:
                    j += 1
                else:
                    i += 1
    return s


class TestOracleConstGap:
    def test_golden_chelsea_eric(self):
        # reference cmd/globalAlignment testdata golden: TTG---TTC
        alpha = dna.from_string("TTGTTATTC")
        beta = dna.from_string("TTGTTC")
        score, route = const_gap(alpha, beta, HUMAN_CHIMP_TWO, -430,
                                 backend="numpy")
        assert view(alpha, beta, route) == "TTGTTATTC\nTTG---TTC\n"

    def test_identical(self):
        a = dna.from_string("ACGTACGT")
        score, route = const_gap(a, a, DEFAULT, -200, backend="numpy")
        assert print_cigar(route) == "8M"
        assert score == sum(int(DEFAULT[x, x]) for x in a)

    def test_cigar_consumes_both(self):
        rng = np.random.default_rng(0)
        for _ in range(25):
            n, m = rng.integers(1, 40, 2)
            a = rng.integers(0, 4, n).astype(np.int8)
            b = rng.integers(0, 4, m).astype(np.int8)
            score, route = const_gap(a, b, DEFAULT, -200, backend="numpy")
            assert _consumed(route) == (n, m)
            assert _score_of_route(a, b, route, DEFAULT, -200) == score


class TestOracleAffineGap:
    def test_identical(self):
        a = dna.from_string("ACGTACGTAC")
        score, route = affine_gap(a, a, DEFAULT, -400, -30, backend="numpy")
        assert print_cigar(route) == "10M"

    def test_single_long_gap_preferred(self):
        # affine gap should produce one long gap, not scattered gaps
        a = dna.from_string("AAAACCCCGGGGTTTT")
        b = dna.from_string("AAAAGGGGTTTT")
        score, route = affine_gap(a, b, DEFAULT, -400, -30, backend="numpy")
        ops = [(c.op, c.run_length) for c in route]
        assert (COL_D, 4) in ops
        assert _consumed(route) == (16, 12)

    def test_affine_score_vs_bruteforce(self):
        # brute-force 3-state DP with plain loops as an independent oracle
        rng = np.random.default_rng(1)
        for _ in range(10):
            n, m = rng.integers(1, 14, 2)
            a = rng.integers(0, 5, n)
            b = rng.integers(0, 5, m)
            go_, ge = -400, -30
            NEG = -(2 ** 62)
            M = np.full((n + 1, m + 1), NEG, dtype=object)
            I = np.full((n + 1, m + 1), NEG, dtype=object)
            D = np.full((n + 1, m + 1), NEG, dtype=object)
            M[0][0], I[0][0], D[0][0] = 0, go_, go_
            for j in range(1, m + 1):
                I[0][j] = I[0][j - 1] + ge
            for i in range(1, n + 1):
                D[i][0] = D[i - 1][0] + ge
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    s = int(DEFAULT[a[i - 1], b[j - 1]])
                    M[i][j] = s + max(M[i - 1][j - 1], I[i - 1][j - 1],
                                      D[i - 1][j - 1])
                    I[i][j] = max(go_ + ge + M[i][j - 1], ge + I[i][j - 1],
                                  go_ + ge + D[i][j - 1])
                    D[i][j] = max(go_ + ge + M[i - 1][j], go_ + ge + I[i - 1][j],
                                  ge + D[i - 1][j])
            want = max(M[n][m], I[n][m], D[n][m])
            got, route = affine_gap(a, b, DEFAULT, go_, ge, backend="numpy")
            assert got == want
            assert _consumed(route) == (n, m)


class TestPallasInterpretMatchesOracle:
    @pytest.mark.parametrize("mode", ["const", "affine"])
    def test_random_pairs(self, mode):
        rng = np.random.default_rng(7)
        pairs = []
        for _ in range(5):
            n, m = rng.integers(1, 60, 2)
            pairs.append((rng.integers(0, 5, n).astype(np.int8),
                          rng.integers(0, 5, m).astype(np.int8)))
        from gonomics_tpu.align import affine_gap_batch, const_gap_batch

        if mode == "const":
            got = const_gap_batch(pairs, DEFAULT, -200, backend="interpret")
            want = [oracle.const_gap(a, b, DEFAULT, -200) for a, b in pairs]
        else:
            got = affine_gap_batch(pairs, DEFAULT, -400, -30,
                                   backend="interpret")
            want = [oracle.affine_gap(a, b, DEFAULT, -400, -30)
                    for a, b in pairs]
        for (gs, gr), (ws, wr) in zip(got, want):
            assert gs == ws
            assert [(c.run_length, c.op) for c in gr] == \
                   [(c.run_length, c.op) for c in wr]

    def test_score_only(self):
        rng = np.random.default_rng(9)
        pairs = [(rng.integers(0, 4, 33).astype(np.int8),
                  rng.integers(0, 4, 47).astype(np.int8)) for _ in range(3)]
        from gonomics_tpu.align import affine_gap_batch

        got = affine_gap_batch(pairs, HUMAN_CHIMP_TWO, -600, -150,
                               backend="interpret", with_cigar=False)
        want = [oracle.affine_gap(a, b, HUMAN_CHIMP_TWO, -600, -150)
                for a, b in pairs]
        for (gs, _), (ws, _) in zip(got, want):
            assert gs == ws


class TestGlobalAlignmentCLI:
    def test_golden_output(self, tmp_path):
        from gonomics_tpu.cli.global_alignment import global_alignment
        from gonomics_tpu import fileio

        out = io.StringIO()
        fa_out = str(tmp_path / "faOut.fa")
        global_alignment(f"{REF}/cmd/globalAlignment/testdata/chelsea.fa",
                         f"{REF}/cmd/globalAlignment/testdata/eric.fa",
                         fa_out, backend="numpy", out=out)
        assert fileio.are_equal(
            fa_out, f"{REF}/cmd/globalAlignment/testdata/faOut_test.fa")
        lines = out.getvalue().split("\n")
        assert lines[0].startswith("Alignment score is ")
        assert lines[1] == "TTGTTATTC"
        assert lines[2] == "TTG---TTC"


class TestMultiAlignAndLocal:
    def test_multi_align_goldens(self):
        from gonomics_tpu.align.multi import all_seq_affine
        from gonomics_tpu.io import fasta as fastaio

        TD = "/root/reference/align/testdata"
        for inp, exp in [("multiAlignTest.in.fa", "multiAlignTest.expected.fa"),
                         ("multiAlignTest.in2.fa",
                          "multiAlignTest.expected2.fa")]:
            aligned = all_seq_affine(fastaio.read(f"{TD}/{inp}"), DEFAULT,
                                     -400, -30)
            want = {r.name: r for r in fastaio.read(f"{TD}/{exp}")}
            got = {r.name: r for r in aligned}
            assert set(want) == set(got)
            for n in want:
                assert (want[n].seq == got[n].seq).all()

    def test_affine_gap_local_free_ends(self):
        from gonomics_tpu.align.oracle import affine_gap_local

        target = dna.from_string("AAAACGTACGTACGTAAAA")
        query = dna.from_string("CGTACGTACGT")
        score, route = affine_gap_local(target, query, DEFAULT, -400, -30)
        assert score == sum(int(DEFAULT[x, x]) for x in query)
        ops = [(c.run_length, c.op) for c in route]
        assert (11, COL_M) in ops
        # free end gaps: leading/trailing target bases consumed as D
        assert ops[0] == (4, COL_D) and ops[-1] == (4, COL_D)
