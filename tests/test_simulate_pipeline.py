"""End-to-end BASELINE config 5: simulated reads -> pileup -> callVariants
-> VCF, with planted variants recovered (the reference validates this
pipeline the same way: simulate, align, call, check)."""

import numpy as np

from gonomics_tpu import dna
from gonomics_tpu.cli.call_variants import call_variants
from gonomics_tpu.io import fai, fasta as fastaio, sam as samio, vcf as vcfio
from gonomics_tpu.simulate import (evolve_tree, illumina_paired_sam,
                                   mutate_seq, rand_seq, simulate_sam)
from gonomics_tpu.phylo.etree import parse_newick, get_leaves


def _write_sorted_sam(path, ref_name, ref_len, sams):
    header = samio.Header()
    header.text = ["@HD\tVN:1.6\tSO:coordinate",
                   f"@SQ\tSN:{ref_name}\tLN:{ref_len}"]
    sams.sort(key=lambda s: s.pos)
    samio.write_sam(path, header, sams)


def test_simulate_call_variants_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    n = 20000
    ref = rand_seq(rng, n)
    tumor = ref.copy()
    planted = {}
    for _ in range(20):
        p = int(rng.integers(100, n - 100))
        alt = (tumor[p] + 1 + int(rng.integers(0, 3))) % 4
        if alt != ref[p]:
            tumor[p] = alt
            planted[p + 1] = (int(ref[p]), int(alt))  # 1-based

    ref_fa = str(tmp_path / "ref.fa")
    fastaio.write(ref_fa, [fastaio.Fasta("chrS", ref)])
    fai.write_index(fai.create_index(ref_fa), ref_fa + ".fai")

    exp_reads = illumina_paired_sam("chrS", tumor, 1500, 100, 300, 30.0,
                                    0.0, rng)
    norm_reads = illumina_paired_sam("chrS", ref, 1500, 100, 300, 30.0,
                                     0.0, rng)
    exp_sam = str(tmp_path / "exp.sam")
    norm_sam = str(tmp_path / "norm.sam")
    _write_sorted_sam(exp_sam, "chrS", n, exp_reads)
    _write_sorted_sam(norm_sam, "chrS", n, norm_reads)

    out_vcf = str(tmp_path / "out.vcf")
    call_variants([exp_sam], [norm_sam], ref_fa, out_vcf, max_p=1e-3,
                  min_af=0.2, max_af=1.0, max_strand_bias=1.0,
                  min_coverage=5, min_mapq=0, min_alt_reads=2)

    records, _ = vcfio.read(out_vcf)
    called = {r.pos: r for r in records}
    found = sum(1 for p in planted if p in called)
    assert found >= 0.9 * len(planted), (found, len(planted))
    # no more than a couple of false positives
    assert len(called) <= len(planted) + 3
    # ref/alt bases match the planted variants
    for p, (r, a) in planted.items():
        if p in called:
            assert called[p].ref == dna.to_string(np.array([r], np.int8))
            assert dna.to_string(np.array([a], np.int8)) in called[p].alt


def test_simulate_sam_cli(tmp_path):
    rng = np.random.default_rng(0)
    ref_fa = str(tmp_path / "r.fa")
    fastaio.write(ref_fa, [fastaio.Fasta("c1", rand_seq(rng, 5000))])
    out = str(tmp_path / "o.sam")
    simulate_sam(ref_fa, out, num_reads=50, read_len=100,
                 fragment_length=250, set_seed=1)
    header, recs = samio.read(out)
    assert len(recs) == 100
    assert all(r.flag & 1 for r in recs)


def test_evolve_tree():
    rng = np.random.default_rng(2)
    root = parse_newick("((a:0.05,b:0.05)ab:0.02,c:0.1)r;")
    evolve_tree(root, rng, rand_seq(rng, 2000))
    leaves = get_leaves(root)
    assert [l.name for l in leaves] == ["a", "b", "c"]
    a, b, c = (l.fasta.seq for l in leaves)
    dist_ab = (a != b).mean()
    dist_ac = (a != c).mean()
    assert 0 < dist_ab < dist_ac  # a,b are closer than a,c
