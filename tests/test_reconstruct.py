"""reconstructSeq golden tests — the full config table of
cmd/reconstructSeq/reconstructSeq_test.go (byte-exact fasta, 1e-3 pfa)."""

import numpy as np
import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.reconstruct_seq import reconstruct_seq
from gonomics_tpu.io import pfasta

TD = "/root/reference/cmd/reconstructSeq/testdata"

CASES = [
    ("4d.genericNames.mod", "allPossible.oneHuman.fa",
     "expected.AllPossibleOneHuman.fa",
     dict(pdna_node="hca"), "hca1Expected.pfa"),
    ("4d.genericNames.mod", "allPossible.oneHuman.fa",
     "expected.AllPossibleOneHuman.ThresholdPoint8.fa",
     dict(bias_leaf_name="human", non_bias_prob_threshold=0.8,
          pdna_node="hga"), "hga1Expected.pfa"),
    ("4d.genericNames.mod", "allPossible.oneHuman.fa",
     "expected.AllPossibleOneHuman.ThresholdPoint99.fa",
     dict(bias_leaf_name="human", non_bias_prob_threshold=0.99,
          pdna_node="hoa"), "hoa1Expected.pfa"),
    ("4d.genericNames.mod", "allPossible.oneHuman.fa",
     "expected.AllPossibleOneHuman.highestProbThreshold99.fa",
     dict(bias_leaf_name="human", highest_prob_threshold=0.99,
          pdna_node="cba"), "cba1Expected.pfa"),
    ("4d.genericNames.mod", "allPossible.oneHuman.withExtraSeqs.fa",
     "expected.AllPossibleOneHuman.fa", dict(), None),
    ("4d.genericNames.mod", "allPossible.oneHuman.withExtraSeqs.fa",
     "expected.AllPossibleOneHuman.keepAllSeq.fa",
     dict(keep_all_seq=True), None),
    ("4d.genericNames.mod", "allPossible.oneHuman.withExtraSeqsRef.fa",
     "expected.AllPossibleOneHuman.keepAllSeqRef.fa",
     dict(keep_all_seq=True), None),
    ("4d.genericNames.mod", "short.fa", "expected.short.biasN.fa",
     dict(bias_leaf_name="human", non_bias_prob_threshold=0.8, bias_n=True,
          keep_all_seq=True, pdna_node="hga"), "hga2Expected.pfa"),
    ("allT2T.4d.mod", "allT2T.fa", "expected.allT2T.biasNodeName.fa",
     dict(bias_leaf_name="chimpT2Tpri", bias_node_name="hcaT2T",
          non_bias_prob_threshold=0.8, keep_all_seq=True), None),
]


@pytest.mark.parametrize("newick,fa,expected,kwargs,pfa",
                         CASES, ids=[c[2] for c in CASES])
def test_reconstruct_seq_golden(tmp_path, newick, fa, expected, kwargs, pfa):
    out = str(tmp_path / "out.fa")
    pfa_out = str(tmp_path / "out.pfa")
    kw = dict(kwargs)
    if kw.get("pdna_node"):
        kw["pdna_out_file"] = pfa_out
    reconstruct_seq(f"{TD}/{newick}", f"{TD}/{fa}", out, **kw)
    assert fileio.are_equal(out, f"{TD}/{expected}")
    if pfa:
        got = pfasta.read(pfa_out)
        want = pfasta.read(f"{TD}/{pfa}")
        assert got[0].name == want[0].name
        assert got[0].seq.shape == want[0].seq.shape
        assert np.allclose(got[0].seq, want[0].seq, atol=1e-3)
