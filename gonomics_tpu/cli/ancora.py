"""ANCoRA — Ancient-DNA Nucleotide-damage Correction and Reference-guided
Assembly (reference: cmd/ancora/{ancora,build,cache,indel,prior,score}.go).

Three modes: 'build' (diploid assemblies from aligned short reads),
'prior' (empirical genotype prior via MLE from reads), 'score' (confusion
matrices from five-way validation alignments).

Stream parity: every stochastic choice replays the reference's seeded Go
rand stream (numbers/gorand), including the draws the reference burns on
singleton tie lists. Faithful quirks kept: haploid-called bases and
heterozygous-insertion bases advance the output buffers without writing
(the Go zero value dna.A lands in the fasta; the call is only recorded in
the multiFa — build.go:298-321, indel.go:44-51)."""

from __future__ import annotations

import argparse
import math
import sys
from dataclasses import dataclass, field

import numpy as np

from .. import assembly as asm, dna, fileio
from ..interval import IntervalIndex
from ..io import bed as bedio, fasta as fastaio, sam as samio
from ..numbers.gorand import GoRand
from ..pileup import pileup


@dataclass
class BuildSettings:
    sam_file: str
    ref_file: str
    out_a: str
    out_b: str
    multi_fa_dir: str = ""
    qname_a: str = "QueryA"
    qname_b: str = "QueryB"
    delta: float = 0.01
    gamma: float = 3.0
    epsilon: float = 0.01
    kappa: float = 0.1
    lam: float = 0.0
    likelihood_cache_size: int = 100
    set_seed: int = -1
    flat_prior: bool = False
    empirical_prior: str = ""
    problematic_regions_bed: str = ""


class _Out:
    """AnswerStruct + MultiFaStruct as append-lists. A bare advance
    appends the Go zero base (dna.A) — see module docstring."""

    def __init__(self, chrom_names, qname_a, qname_b):
        self.a = {c: [] for c in chrom_names}
        self.b = {c: [] for c in chrom_names}
        self.qname_a = qname_a
        self.qname_b = qname_b
        self.mlt = None
        self.chrom = None

    def new_multifa(self, chrom):
        self.chrom = chrom
        self.mlt = [[], [], []]

    def put(self, ref_b, a_b, b_b):
        self.a[self.chrom].append(a_b)
        self.b[self.chrom].append(b_b)
        self.update_multifa(ref_b, a_b, b_b)

    def advance_a(self):
        self.a[self.chrom].append(dna.A)

    def advance_b(self):
        self.b[self.chrom].append(dna.A)

    def update_multifa(self, zero, first, second):
        self.mlt[0].append(zero)
        self.mlt[1].append(first)
        self.mlt[2].append(second)

    def write_multifa(self, path):
        fastaio.write(path, [
            fastaio.Fasta(self.chrom, np.array(self.mlt[0], np.int8)),
            fastaio.Fasta(self.qname_a, np.array(self.mlt[1], np.int8)),
            fastaio.Fasta(self.qname_b, np.array(self.mlt[2], np.int8))])


def _pre_check(s: BuildSettings) -> None:
    for name, v in (("Delta", s.delta), ("Epsilon", s.epsilon),
                    ("Kappa", s.kappa), ("Lambda", s.lam)):
        if v < 0 or v > 1:
            raise SystemExit(f"Error: {name} must be a value between 0 "
                             f"and 1. Found: {v}.")
    if s.lam + s.epsilon > 1:
        raise SystemExit("Error: Lambda + Epsilon must be less than 1.")
    if s.flat_prior and s.empirical_prior:
        raise SystemExit("Error: flat prior and empirical prior are "
                         "mutually incompatible.")


def _cache_setup(s: BuildSettings):
    """cacheSetup (cache.go:22): returns (priors..., epsilon, lambda)."""
    if s.flat_prior:
        base_prior = asm.make_diploid_base_flat_prior_cache()
    elif s.empirical_prior:
        base_prior, s.epsilon, s.lam = \
            asm.make_diploid_base_empirical_prior_cache(s.empirical_prior)
    else:
        base_prior = asm.make_diploid_base_prior_cache(s.delta, s.gamma)
    indel_prior = asm.make_diploid_indel_prior_cache(s.kappa, s.delta)
    hap_base_prior = asm.make_haploid_base_prior_cache(s.delta, s.gamma)
    hap_indel_prior = asm.make_haploid_indel_prior_cache(s.delta, s.kappa)
    caches = asm.Caches(size=s.likelihood_cache_size)
    return (base_prior, indel_prior, hap_base_prior, hap_indel_prior,
            caches, s.epsilon, s.lam)


def ancora_build(s: BuildSettings) -> None:
    """ancoraBuild (build.go:157)."""
    rng = GoRand(s.set_seed)
    _pre_check(s)
    (base_prior, indel_prior, hap_base_prior, hap_indel_prior, caches,
     eps, lam) = _cache_setup(s)

    ref = fastaio.read(s.ref_file)
    for r in ref:
        r.seq = dna.to_upper(r.seq).astype(np.int8)
    refmap = {r.name: r.seq for r in ref}

    header, reads = samio.read(s.sam_file)
    piles = pileup(reads, header)

    prob_tree = None
    if s.problematic_regions_bed:
        beds = bedio.read(s.problematic_regions_bed)
        if beds:
            prob_tree = IntervalIndex(beds)

    out = _Out([r.name for r in ref], s.qname_a, s.qname_b)
    chrom_order = {c.name: c.order for c in header.chroms}
    order_chrom = {c.order: c.name for c in header.chroms}

    first_time = True
    curr_chrom = None
    ref_pos = 0
    positions_to_skip = 0
    curr_ploidy = 2
    haploid_bases = 0
    haploid_strand = False

    def in_problematic(p) -> bool:
        if prob_tree is None:
            return False
        q = bedio.Bed(chrom=curr_chrom, chrom_start=p.pos - 1,
                      chrom_end=p.pos)
        return len(prob_tree.query(q, "any")) > 0

    for p in piles:
        if positions_to_skip > 0:
            out.update_multifa(refmap[curr_chrom][ref_pos], dna.GAP,
                               dna.GAP)
            ref_pos += 1
            positions_to_skip -= 1
            continue
        if first_time:
            first_time = False
            curr_chrom = order_chrom[p.ref_idx]
            out.new_multifa(curr_chrom)
            ref_pos = 0
        if curr_chrom != order_chrom[p.ref_idx]:
            while ref_pos < len(refmap[curr_chrom]):
                rb = refmap[curr_chrom][ref_pos]
                out.put(rb, rb, rb)
                ref_pos += 1
            if s.multi_fa_dir:
                out.write_multifa(f"{s.multi_fa_dir}/{curr_chrom}.fa")
            curr_chrom = order_chrom[p.ref_idx]
            out.new_multifa(curr_chrom)
            ref_pos = 0

        while ref_pos < p.pos - 1:
            rb = refmap[curr_chrom][ref_pos]
            out.put(rb, rb, rb)
            ref_pos += 1
        if ref_pos != p.pos - 1:
            continue

        if curr_ploidy == 2:
            problematic = in_problematic(p)
            if problematic:
                call = asm.ref_base_to_ref_genotype(
                    refmap[curr_chrom][ref_pos])
            else:
                call = asm.diploid_base_call_from_pile(
                    p, int(refmap[curr_chrom][ref_pos]), base_prior,
                    caches, eps, lam, rng)
            bases = asm.diploid_base_to_bases(call)
            rb = refmap[curr_chrom][ref_pos]
            if rng.float64() < 0.5:
                out.put(rb, bases[0], bases[1])
            else:
                out.put(rb, bases[1], bases[0])

            if not problematic:
                # diploidInsertion (indel.go:17) burns one draw at entry
                # (its currRand initializer is re-drawn before use)
                rng.float64()
                ins = asm.diploid_insertion_call_from_pile(
                    p, indel_prior, caches, eps, rng)
                seqs = asm.diploid_insertion_to_seqs(ins)
                ref_pos += 1
                if ins.type == asm.IA_IA:
                    for bb in seqs[0]:
                        out.a[out.chrom].append(int(bb))
                        out.b[out.chrom].append(int(bb))
                    for bb in seqs[0]:
                        out.update_multifa(dna.GAP, int(bb), int(bb))
                elif ins.type == asm.IA_B:
                    if rng.float64() < 0.5:
                        for bb in seqs[0]:
                            out.advance_a()
                            out.update_multifa(dna.GAP, int(bb), dna.GAP)
                    else:
                        for bb in seqs[0]:
                            out.advance_b()
                            out.update_multifa(dna.GAP, dna.GAP, int(bb))
                elif ins.type == asm.IA_IB:
                    la, lb = len(seqs[0]), len(seqs[1])
                    if rng.float64() < 0.5:
                        for _ in range(la):
                            out.advance_a()
                        for _ in range(lb):
                            out.advance_b()
                        for i in range(max(la, lb)):
                            out.update_multifa(
                                dna.GAP,
                                int(seqs[0][i]) if i < la else dna.GAP,
                                int(seqs[1][i]) if i < lb else dna.GAP)
                    else:
                        for _ in range(la):
                            out.advance_b()
                        for _ in range(lb):
                            out.advance_a()
                        for i in range(max(la, lb)):
                            out.update_multifa(
                                dna.GAP,
                                int(seqs[1][i]) if i < lb else dna.GAP,
                                int(seqs[0][i]) if i < la else dna.GAP)
            else:
                ref_pos += 1

            if not problematic:
                # diploidDeletion (indel.go:110)
                dele = asm.diploid_deletion_call_from_pile(
                    p, indel_prior, caches, eps, rng)
                if dele.type == asm.DA_DA:
                    positions_to_skip = dele.da
                elif dele.type == asm.DA_B:
                    curr_ploidy = 1
                    haploid_bases = dele.da
                    haploid_strand = rng.float64() < 0.5
                elif dele.type == asm.DA_DB:
                    curr_ploidy = 1
                    for _ in range(min(dele.da, dele.db)):
                        out.update_multifa(refmap[curr_chrom][ref_pos],
                                           dna.GAP, dna.GAP)
                        ref_pos += 1
                    haploid_bases = max(dele.da - dele.db,
                                        dele.db - dele.da)
                    haploid_strand = rng.float64() < 0.5

        elif curr_ploidy == 1:
            problematic = in_problematic(p)
            if problematic:
                hcall = asm.HaploidCall(
                    base=int(refmap[curr_chrom][ref_pos]))
            else:
                hcall = asm.haploid_call_from_pile(
                    p, int(refmap[curr_chrom][ref_pos]), eps, lam,
                    hap_base_prior, hap_indel_prior, caches, rng)
            rb = refmap[curr_chrom][ref_pos]
            if haploid_strand:
                out.advance_a()
                out.update_multifa(rb, hcall.base, dna.GAP)
            else:
                out.advance_b()
                out.update_multifa(rb, dna.GAP, hcall.base)
            ref_pos += 1
            if hcall.insertion != "":
                for bb in dna.from_string(hcall.insertion):
                    if haploid_strand:
                        out.advance_a()
                        out.update_multifa(dna.GAP, int(bb), dna.GAP)
                    else:
                        out.advance_b()
                        out.update_multifa(dna.GAP, dna.GAP, int(bb))
            if hcall.deletion != 0:
                for _ in range(hcall.deletion):
                    out.update_multifa(refmap[curr_chrom][ref_pos],
                                       dna.GAP, dna.GAP)
                    ref_pos += 1
                    if ref_pos >= len(refmap[curr_chrom]):
                        curr_ploidy = 2
                        break
                    haploid_bases -= 1
                    if haploid_bases < 1:
                        curr_ploidy = 2
                        break
            if haploid_bases < 2:
                curr_ploidy = 2
            haploid_bases -= 1
        else:
            raise SystemExit(f"Error: Unrecognized ploidy: {curr_ploidy}.")

    while ref_pos < len(refmap[curr_chrom]):
        rb = refmap[curr_chrom][ref_pos]
        out.put(rb, rb, rb)
        ref_pos += 1
    if s.multi_fa_dir:
        out.write_multifa(f"{s.multi_fa_dir}/{curr_chrom}.fa")

    fastaio.write(s.out_a, [fastaio.Fasta(r.name,
                                          np.array(out.a[r.name], np.int8))
                            for r in ref])
    fastaio.write(s.out_b, [fastaio.Fasta(r.name,
                                          np.array(out.b[r.name], np.int8))
                            for r in ref])


# ---------------------------------------------------------------------------
# prior (prior.go)
# ---------------------------------------------------------------------------

@dataclass
class PriorSettings:
    sam_file: str
    ref_file: str
    out_file: str
    epsilon: float = 0.01
    likelihood_cache_size: int = 100
    pseudo_count: float = 0.01
    min_coverage: int = 0
    as_counts: bool = False


def ancora_prior(s: PriorSettings) -> None:
    """ancoraPrior (prior.go:93). Uses the globally-seeded rand stream
    (exception.init pins rand.Seed(0); prior does not re-seed)."""
    rng = GoRand(0)
    answer = [[s.pseudo_count] * 10 for _ in range(4)]
    num_eps = tot_eps = num_lam = tot_lam = 0

    header, reads = samio.read(s.sam_file)
    piles = pileup(reads, header)
    ref = fastaio.read(s.ref_file)
    for r in ref:
        r.seq = dna.to_upper(r.seq).astype(np.int8)
    refmap = {r.name: r.seq for r in ref}
    order_chrom = {c.order: c.name for c in header.chroms}
    prior_cache = asm.make_diploid_base_flat_prior_cache()
    caches = asm.Caches(size=s.likelihood_cache_size)

    for p in piles:
        chrom = order_chrom[p.ref_idx]
        ref_base = int(refmap[chrom][p.pos - 1])
        cov = sum(int(p.count_f[i] + p.count_r[i]) for i in range(4))
        if cov > s.min_coverage and ref_base < 4:
            call = asm.diploid_base_call_from_pile(
                p, ref_base, prior_cache, caches, s.epsilon, 0, rng)
            if call < 10:
                answer[ref_base][call] += 1
                # updateErrorEstimate (prior.go:236)
                cf, cr = p.count_f, p.count_r
                allb = sum(int(cf[i] + cr[i]) for i in range(4))
                if call == asm.AA:
                    num_eps += int(cf[dna.C] + cf[dna.G] + cf[dna.T]
                                   + cr[dna.C] + cr[dna.G] + cr[dna.T])
                    tot_eps += allb
                elif call == asm.CC:
                    num_lam += int(cf[dna.T] + cr[dna.T])
                    tot_lam += allb
                elif call == asm.GG:
                    num_lam += int(cf[dna.A] + cr[dna.A])
                    tot_lam += allb
                elif call == asm.TT:
                    num_eps += int(cf[dna.A] + cf[dna.C] + cf[dna.G]
                                   + cr[dna.A] + cr[dna.C] + cr[dna.G])
                    tot_eps += allb

    eps_est = num_eps / tot_eps if tot_eps else math.nan
    lam_est = max((num_lam / tot_lam if tot_lam else math.nan)
                  - eps_est, 0)
    if not s.as_counts:
        # naive left-to-right sum (convertToProb, prior.go:214): Python's
        # sum() is Neumaier-compensated since 3.12 and differs in the ulp
        def row_sum(row):
            t = 0.0
            for v in row:
                t += v
            return t

        answer = [[v / row_sum(row) for v in row] for row in answer]
    with fileio.easy_create(s.out_file) as out:
        out.write(f"Epsilon\t{fileio.go_v(eps_est)}\n")
        out.write(f"Lambda\t{fileio.go_v(lam_est)}\n")
        out.write(".\tAA\tAC\tAG\tAT\tCC\tCG\tCT\tGG\tGT\tTT\n")
        for name, row in zip(("RefA", "RefC", "RefG", "RefT"), answer):
            out.write(name + "".join(f"\t{fileio.go_v(v)}" for v in row)
                      + "\n")


# ---------------------------------------------------------------------------
# score (score.go)
# ---------------------------------------------------------------------------

_REF_PHASED = {
    dna.A: {asm.AA: 0, asm.AG: 1, asm.AC: 2, asm.AT: 3, asm.GG: 4,
            asm.CG: 5, asm.GT: 6, asm.CC: 7, asm.CT: 8, asm.TT: 9},
    dna.C: {asm.CC: 0, asm.CT: 1, asm.AC: 2, asm.CG: 3, asm.TT: 4,
            asm.AT: 5, asm.GT: 6, asm.AA: 7, asm.AG: 8, asm.GG: 9},
    dna.G: {asm.GG: 0, asm.AG: 1, asm.CG: 2, asm.GT: 3, asm.AA: 4,
            asm.AC: 5, asm.AT: 6, asm.CC: 7, asm.CT: 8, asm.TT: 9},
    dna.T: {asm.TT: 0, asm.CT: 1, asm.AT: 2, asm.GT: 3, asm.CC: 4,
            asm.AC: 5, asm.CG: 6, asm.AA: 7, asm.AG: 8, asm.GG: 9},
}

_B2D = {(dna.A, dna.A): asm.AA, (dna.A, dna.C): asm.AC,
        (dna.A, dna.G): asm.AG, (dna.A, dna.T): asm.AT,
        (dna.C, dna.A): asm.AC, (dna.C, dna.C): asm.CC,
        (dna.C, dna.G): asm.CG, (dna.C, dna.T): asm.CT,
        (dna.G, dna.A): asm.AG, (dna.G, dna.C): asm.CG,
        (dna.G, dna.G): asm.GG, (dna.G, dna.T): asm.GT,
        (dna.T, dna.A): asm.AT, (dna.T, dna.C): asm.CT,
        (dna.T, dna.G): asm.GT, (dna.T, dna.T): asm.TT}


def _bases_to_diploid(b1: int, b2: int) -> int:
    return _B2D.get((b1, b2), asm.NN)


_ROW_NAMES = ["HomoRef", "HetRefTs", "HetRefTv1", "HetRefTv2", "HomoTs",
              "HetTsTv1", "HetTsTv2", "HomoTv1", "HetTv1Tv2", "HomoTv2"]
_HDR = ("HomoRef\tHetRefTs\tHetRefTv1\tHetRefTv2\tHomoTs\tHetTsTv1\t"
        "HetTsTv2\tHomoTv1\tHetTv1Tv2\tHomoTv2")


def _write_matrix(out, data, header: str) -> None:
    out.write(header)
    for name, row in zip(_ROW_NAMES, data):
        out.write(name + "\t" + "".join(f"{v}\t" for v in row) + "\n")


def ancora_score(score_type: str, in_file_list: str, out_file: str) -> None:
    """ancoraScore / baseMatrixByRefBase (score.go:61-156)."""
    if score_type not in ("baseMatrix", "baseMatrixByRefBase"):
        raise SystemExit(f"Error: Unrecognized score mode: {score_type}.")
    by_ref = score_type == "baseMatrixByRefBase"
    mats = {b: [[0] * 10 for _ in range(10)]
            for b in (dna.A, dna.C, dna.G, dna.T)}
    merged = [[0] * 10 for _ in range(10)]
    for path in fileio.read(in_file_list):
        records = fastaio.read(path)
        if len(records) != 5 or \
                any(len(r.seq) != len(records[0].seq) for r in records):
            raise SystemExit("Fasta files must have five entries of the "
                             "same sequence length.")
        seqs = [np.asarray(r.seq) for r in records]
        for pos in range(len(seqs[0])):
            if seqs[0][pos] < 4 and all(seqs[k][pos] < 5
                                        for k in range(1, 5)):
                rb = int(seqs[0][pos])
                actual = _bases_to_diploid(int(seqs[1][pos]),
                                           int(seqs[2][pos]))
                pred = _bases_to_diploid(int(seqs[3][pos]),
                                         int(seqs[4][pos]))
                merged[_REF_PHASED[rb][pred]][_REF_PHASED[rb][actual]] += 1
                mats[rb][_REF_PHASED[rb][pred]][_REF_PHASED[rb][actual]] \
                    += 1

    with fileio.easy_create(out_file) as out:
        if not by_ref:
            _write_matrix(out, merged, f"X\t{_HDR}\n")
        else:
            for label, b in (("A", dna.A), ("C", dna.C), ("G", dna.G),
                             ("T", dna.T)):
                _write_matrix(out, mats[b], f"Ref:{label}\t{_HDR}\n")
        _write_summary(out, merged)


def _write_summary(out, m) -> None:
    """writeSummaryStatistics (score.go:159)."""
    total = sum(sum(r) for r in m)
    correct = sum(m[i][i] for i in range(10))
    tn = m[0][0]
    fn = sum(m[0][c] for c in range(1, 10))
    fp = sum(m[r][0] for r in range(1, 10))
    mis = sum(m[r][c] for r in range(1, 10) for c in range(1, 10)
              if r != c)
    actual_neg = sum(m[r][0] for r in range(10))
    actual_pos = total - actual_neg
    pred_neg = sum(m[0][c] for c in range(10))
    pred_pos = total - pred_neg
    acc = correct / total
    recall = (correct - m[0][0]) / actual_pos
    precision = (correct - m[0][0]) / pred_pos
    mis_rate = mis / (mis + correct - m[0][0])
    fvr = fp / (fp + m[0][0])
    frr = fn / (fn + m[0][0])
    out.write("\nmatrixTotal\tcorrectTotal\ttrueNegative\tfalseNegative\t"
              "falsePositive\tmisclassified\tAccuracy\tInaccuracy\t"
              "Recall\tPrecision\tMisclassificaitonRate\t"
              "FalseVariantRate\tfalseReferenceRate\n")
    out.write(f"{total}\t{correct}\t{tn}\t{fn}\t{fp}\t{mis}\t{acc:e}\t"
              f"{1 - acc:e}\t{recall:e}\t{precision:e}\t{mis_rate:e}\t"
              f"{fvr:e}\t{frr:e}\n")


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser(prog="ancora")
    sub = p.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("build")
    b.add_argument("sam")
    b.add_argument("ref")
    b.add_argument("outA")
    b.add_argument("outB")
    b.add_argument("-delta", type=float, default=0.01)
    b.add_argument("-gamma", type=float, default=3.0)
    b.add_argument("-epsilon", type=float, default=0.01)
    b.add_argument("-kappa", type=float, default=0.1)
    b.add_argument("-lambda", type=float, default=0.0, dest="lam")
    b.add_argument("-multiFaDir", default="")
    b.add_argument("-qNameA", default="QueryA")
    b.add_argument("-qNameB", default="QueryB")
    b.add_argument("-likelihoodCacheSize", type=int, default=100)
    b.add_argument("-setSeed", type=int, default=-1)
    b.add_argument("-flatPrior", action="store_true")
    b.add_argument("-empiricalPrior", default="")
    b.add_argument("-problematicRegionsBed", default="")

    pr = sub.add_parser("prior")
    pr.add_argument("sam")
    pr.add_argument("ref")
    pr.add_argument("out")
    pr.add_argument("-epsilon", type=float, default=0.01)
    pr.add_argument("-likelihoodCacheSize", type=int, default=100)
    pr.add_argument("-pseudoCount", type=float, default=0.01)
    pr.add_argument("-asCounts", action="store_true")
    pr.add_argument("-minCoverage", type=int, default=0)

    sc = sub.add_parser("score")
    sc.add_argument("scoreType")
    sc.add_argument("inFileList")
    sc.add_argument("out")

    a = p.parse_args(argv)
    if a.mode == "build":
        ancora_build(BuildSettings(
            sam_file=a.sam, ref_file=a.ref, out_a=a.outA, out_b=a.outB,
            multi_fa_dir=a.multiFaDir, qname_a=a.qNameA, qname_b=a.qNameB,
            delta=a.delta, gamma=a.gamma, epsilon=a.epsilon, kappa=a.kappa,
            lam=a.lam, likelihood_cache_size=a.likelihoodCacheSize,
            set_seed=a.setSeed, flat_prior=a.flatPrior,
            empirical_prior=a.empiricalPrior,
            problematic_regions_bed=a.problematicRegionsBed))
    elif a.mode == "prior":
        ancora_prior(PriorSettings(
            sam_file=a.sam, ref_file=a.ref, out_file=a.out,
            epsilon=a.epsilon,
            likelihood_cache_size=a.likelihoodCacheSize,
            pseudo_count=a.pseudoCount, as_counts=a.asCounts,
            min_coverage=a.minCoverage))
    else:
        ancora_score(a.scoreType, a.inFileList, a.out)


if __name__ == "__main__":
    main()
