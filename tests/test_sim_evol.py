"""ilsReconstructSeq golden + simRecon/simulateEvol property tests
(reference: cmd/ilsReconstructSeq, cmd/simRecon, cmd/simulateEvol).
Sequence-simulation outputs depend on RNG streams (COVERAGE.md), so
structural/statistical properties are asserted instead of bytes."""

import numpy as np

from gonomics_tpu import dna, fileio
from gonomics_tpu.cli.ils_reconstruct_seq import ils_reconstruct_seq_cmd
from gonomics_tpu.cli.sim_recon import sim_recon
from gonomics_tpu.cli.simulate_evol import genic, non_coding, with_indels
from gonomics_tpu.io import fasta as fastaio
from gonomics_tpu.io import pfasta
from gonomics_tpu.io import vcf as vcfio

REF = "/root/reference/cmd"


def test_ils_reconstruct_seq_golden(tmp_path):
    td = f"{REF}/ilsReconstructSeq/testdata"
    recons = str(tmp_path / "recons.txt")
    probs = str(tmp_path / "probs.txt")
    with open(recons, "w") as f:
        for i in range(4):
            f.write(f"{td}/ilsRecon_{i}.pfa\n")
    with open(probs, "w") as f:
        for i in range(4):
            f.write(f"{td}/ilsPostProb_{i}.wig\n")
    out = str(tmp_path / "out.pfa")
    ils_reconstruct_seq_cmd(probs, recons, f"{td}/ilsChromSizes.chrom.sizes",
                            out)
    got = pfasta.read(out)[0]
    want = pfasta.read(f"{td}/ilsRecon_Expected.pfa")[0]
    assert got.name == want.name == "ilsRecon"
    assert np.allclose(got.seq, want.seq, atol=1e-3)


def test_sim_recon_pipeline_goldens(tmp_path):
    """Byte-exact vs the reference's own simRecon goldens: on its Go
    toolchain (>=1.25) top-level rand.Seed is a no-op and
    GODEBUG randautoseed=0 pins the legacy seed-1 stream — GoRand(1)
    replays it exactly (closes the 'genic stream' parity gap). The
    accuracy files are compared sorted, like the reference's own
    IgnoreOrder test (Go map iteration order is randomized)."""
    td = f"{REF}/simRecon/testdata"
    sim = str(tmp_path / "sim.fa")
    leaf = str(tmp_path / "leaf.fa")
    recon = str(tmp_path / "recon.fa")
    acc = str(tmp_path / "acc.txt")
    base_acc = str(tmp_path / "baseAcc.txt")
    sim_recon(f"{td}/debug.fasta", f"{td}/newickShortBranches.txt",
              f"{td}/debug.gp", sim, leaf, recon, acc, base_acc,
              set_seed=1)
    for got, want in ((sim, "simOutT.fasta"), (leaf, "leafOutT.fasta"),
                      (recon, "reconOutT.fasta")):
        assert (open(got).read()
                == open(f"{td}/{want}").read()), want
    for got, want in ((acc, "accOutT.txt"), (base_acc, "baseAccOutT.txt")):
        assert (sorted(fileio.read(got))
                == sorted(fileio.read(f"{td}/{want}"))), want


def test_with_indels_properties(tmp_path):
    td = f"{REF}/simRecon/testdata"
    out = str(tmp_path / "out.fa")
    vcf_out = str(tmp_path / "out.vcf")
    with_indels(f"{td}/debug.fasta", out, branch_length=0.2,
                prop_indels=0.3, set_seed=3, vcf_out_file=vcf_out,
                q_name="sim")
    recs = fastaio.read(out)
    assert len(recs) == 2
    assert len(recs[0].seq) == len(recs[1].seq)
    assert recs[1].name == recs[0].name + "_sim"
    src = fastaio.read(f"{td}/debug.fasta")[0].seq
    ref_ungapped = recs[0].seq[recs[0].seq != dna.GAP]
    # reference row equals the input sequence up to where simulation ended
    assert np.array_equal(ref_ungapped, src[:len(ref_ungapped)])
    variants, _ = vcfio.read(vcf_out)
    for v in variants:
        # every reported REF matches the source sequence at POS
        want = dna.to_string(src[v.pos - 1:v.pos - 1 + len(v.ref)])
        assert v.ref == want


def test_non_coding_and_genic(tmp_path):
    td = f"{REF}/simRecon/testdata"
    out = str(tmp_path / "nc.fa")
    nwk = str(tmp_path / "t.nh")
    non_coding(out, fasta_file=f"{td}/debug.fasta", num_nodes=7,
               newick_out=nwk, set_seed=5)
    recs = fastaio.read(out)
    assert len(recs) == 7
    lengths = {len(r.seq) for r in recs}
    assert len(lengths) == 1
    assert fileio.read(nwk)[0].endswith(";")

    leaf_out = str(tmp_path / "leaves.fa")
    sim_out = str(tmp_path / "all.fa")
    genic(f"{td}/newickShortBranches.txt", f"{td}/debug.fasta", leaf_out,
          set_seed=2, sim_out_file=sim_out, gene_pred_file=f"{td}/debug.gp")
    all_recs = fastaio.read(sim_out)
    leaves = fastaio.read(leaf_out)
    assert len(leaves) < len(all_recs)
    # start codon is preserved through genic evolution
    cds_start = 2  # debug.gp cdsStart
    for r in all_recs:
        seq = r.seq[r.seq != dna.GAP]
        assert dna.to_string(seq[cds_start:cds_start + 3]) == "ATG"
