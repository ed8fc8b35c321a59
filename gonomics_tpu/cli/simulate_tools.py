"""simulateBed / simulateVcf / simulateDivergentWindowsVcf /
simulatePcr / simulateEvol CLIs (reference: cmd/simulate*).

Parity note: except for simulatePcr (deterministic), these draw from
Go's seeded math/rand in the reference; numpy's PCG64 is used here, so
outputs are reproducible per seed but not byte-identical
(COVERAGE.md limitations)."""

from __future__ import annotations

import argparse
import math

import numpy as np

from .. import dna, fileio, popgen
from ..io import bed as bedio
from ..io import fasta as fastaio
from ..io import vcf as vcfio
from ..numbers import distributions as dist


# --- simulateBed (simulate/bed.go) ---

def count_windows(search_space: list[bedio.Bed], length: int) -> int:
    """simulate.CountWindows (bed.go:10)."""
    return sum(b.chrom_end - b.chrom_start - length + 1
               for b in search_space
               if b.chrom_end - b.chrom_start >= length)


def generate_bed_region(search_space: list[bedio.Bed], rand_pos: int,
                        length: int):
    """simulate.GenerateBedRegion (bed.go:24)."""
    for b in search_space:
        windows = (b.chrom_end - b.chrom_start) - length + 1
        if windows < 1:
            continue
        if rand_pos - windows > -1:
            rand_pos -= windows
        else:
            if b.name == "":
                return bedio.Bed(b.chrom, b.chrom_start + rand_pos,
                                 b.chrom_start + rand_pos + length,
                                 fields_initialized=3), True
            return bedio.Bed(b.chrom, b.chrom_start + rand_pos,
                             b.chrom_start + rand_pos + length, b.name,
                             fields_initialized=4), True
    return bedio.Bed(), False


def simulate_bed(region_count: int, sim_length: int, matched_bed: str,
                 no_gap_file: str, out_file: str,
                 set_seed: int = -1) -> None:
    rng = np.random.default_rng(None if set_seed < 0 else set_seed)
    no_gap = bedio.read(no_gap_file)
    if matched_bed:
        matched = bedio.read(matched_bed)
        sim_length = sum(b.chrom_end - b.chrom_start
                         for b in matched) // len(matched)
        region_count = len(matched)
    total = count_windows(no_gap, sim_length)
    with fileio.easy_create(out_file) as out:
        for _ in range(region_count):
            pos = int(rng.integers(0, total))
            region, found = generate_bed_region(no_gap, pos, sim_length)
            if found:
                bedio.write_to_handle(out, region)


# --- simulateVcf (simulate/vcf.go, popgen/afsSimulate.go) ---

def simulate_seg_site(rng, alpha: float, n: int, bound_alpha: float,
                      bound_beta: float, bound_multiplier: float):
    """popgen.SimulateSegSite (afsSimulate.go:13)."""
    for _ in range(1000000):
        # bounded rejection sample from the stationarity density
        freq = None
        for _ in range(10000000):
            x = float(rng.beta(bound_alpha, bound_beta))
            if x <= 0.0 or x >= 1.0:
                continue
            try:
                y_bound = bound_multiplier * dist.beta_dist(
                    x, bound_alpha, bound_beta)
            except OverflowError:
                continue  # Go yields +Inf here; the draw always rejects
            if not math.isfinite(y_bound):
                continue
            y = popgen.afs_stationarity(x, alpha)
            if y > y_bound:
                raise SystemExit("invalid bounding function")
            if rng.uniform(0.0, y_bound) < y:
                freq = x
                break
        count = int((rng.random(n) < freq).sum())
        if count < 1 or count == n:
            continue
        divergent = bool(rng.random() < freq)
        return count, n, divergent
    raise SystemExit("unable to produce non-zero allele frequency")


def simulate_genotype(rng, alpha: float, n: int, bound_alpha: float,
                      bound_beta: float, bound_multiplier: float):
    """popgen.SimulateGenotype (afsSimulate.go:50)."""
    i, total, divergent = simulate_seg_site(rng, alpha, n, bound_alpha,
                                            bound_beta, bound_multiplier)
    if divergent:
        i = total - i
    alleles = np.zeros(total, dtype=np.int64)
    alleles[:i] = 1
    rng.shuffle(alleles)
    samples = []
    for c in range(0, total, 2):
        if c + 1 >= total:
            pair = [int(alleles[c]), -1]
        else:
            pair = [int(alleles[c]), int(alleles[c + 1])]
        s = vcfio.Sample()
        s.alleles = pair
        s.phase = [False, False]
        s.format_data = [""]
        samples.append(s)
    return samples, divergent


def single_vcf_random(rng, alpha: float, num_alleles: int,
                      bound_alpha: float, bound_beta: float,
                      bound_multiplier: float, pos: int) -> vcfio.Vcf:
    """simulate.SingleVcfRandom (vcf.go:95)."""
    genotype, divergent = simulate_genotype(rng, alpha, num_alleles,
                                            bound_alpha, bound_beta,
                                            bound_multiplier)
    v = vcfio.Vcf(chrom="chr1", pos=pos, id=".", ref="A", alt=["T"],
                  qual=100, filter=".", info=".", format=["GT"],
                  samples=genotype)
    return vcfio.append_ancestor(v, v.alt[0] if divergent else v.ref)


def simulate_vcf(out_file: str, *, alpha: float = 0.01,
                 num_alleles: int = 10, num_sites: int = 10,
                 set_seed: int = -1, bound_alpha: float = 0.001,
                 bound_beta: float = 0.001,
                 bound_multiplier: float = 10000.0,
                 ref_file: str = "") -> None:
    rng = np.random.default_rng(None if set_seed < 0 else set_seed)
    with fileio.easy_create(out_file) as out:
        if not ref_file:
            for i in range(num_sites):
                vcfio.write_vcf(out, single_vcf_random(
                    rng, alpha, num_alleles, bound_alpha, bound_beta,
                    bound_multiplier, i + 1))
            return
        # VcfToFile's reference-genome path (vcf.go:28)
        ref = fastaio.read(ref_file)
        regions = _ungapped_regions_all(ref)
        offsets = {}
        running: dict[str, int] = {}
        for b in regions:
            if b.chrom not in running:
                running[b.chrom] = 0
        fa_idx = {r.name: i for i, r in enumerate(ref)}
        total = count_windows(regions, 1)
        generated: set[tuple[str, int]] = set()
        produced = 0
        while produced < num_sites:
            pos = int(rng.integers(0, total))
            region, _ = generate_bed_region(regions, pos, 1)
            chrom = region.name.split("_")[0]
            key = (chrom, region.chrom_start)
            if key in generated:
                continue
            generated.add(key)
            ref_base = int(np.asarray(
                ref[fa_idx[chrom]].seq)[region.chrom_start])
            genotype, divergent = simulate_genotype(
                rng, alpha, num_alleles, bound_alpha, bound_beta,
                bound_multiplier)
            alt = _change_base(rng, ref_base)
            v = vcfio.Vcf(chrom=chrom, pos=region.chrom_start + 1,
                          id=".",
                          ref=dna.to_string(np.array([ref_base],
                                                     np.int8)),
                          alt=[dna.to_string(np.array([alt], np.int8))],
                          qual=100, filter=".", info=".", format=["GT"],
                          samples=genotype)
            v = vcfio.append_ancestor(v, v.alt[0] if divergent else
                                      v.ref)
            vcfio.write_vcf(out, v)
            produced += 1


def _change_base(rng, base: int) -> int:
    new = base
    while new == base:
        new = int(rng.integers(0, 4))
    return new


def _ungapped_regions_all(records):
    """bed.UngappedRegionsAllFromFa (bed/info.go:79)."""
    answer = []
    for rec in records:
        seq = np.asarray(rec.seq)
        is_base = (seq <= dna.T) | ((seq >= dna.LOWER_A)
                                    & (seq <= dna.LOWER_T))
        in_region = False
        start = 0
        for i, b in enumerate(is_base):
            if b and not in_region:
                in_region, start = True, i
            elif not b and in_region:
                answer.append(bedio.Bed(rec.name, start, i,
                                        f"{rec.name}_{start}_{i}",
                                        fields_initialized=4))
                in_region = False
        if in_region:
            answer.append(bedio.Bed(rec.name, start, len(seq),
                                    f"{rec.name}_{start}_{len(seq)}",
                                    fields_initialized=4))
    return answer


# --- simulateDivergentWindowsVcf ---

def simulate_divergent_windows_vcf(out_lower: str, out_upper: str, *,
                                   alpha: float = 0.01,
                                   num_alleles: int = 10,
                                   num_total_sites: int = 20,
                                   num_window_sites: int = 10,
                                   num_windows: int = 10,
                                   lower_percentile: float = 0.1,
                                   upper_percentile: float = 0.9,
                                   bound_alpha: float = 0.001,
                                   bound_beta: float = 0.001,
                                   bound_multiplier: float = 10000.0,
                                   set_seed: int = -1) -> None:
    """cmd/simulateDivergentWindowsVcf."""
    if num_window_sites > num_total_sites:
        raise SystemExit("The number of total simulated Vcf variants "
                         "must be greater than the desired number of "
                         "variants per window.")
    rng = np.random.default_rng(None if set_seed < 0 else set_seed)
    sites = [single_vcf_random(rng, alpha, num_alleles, bound_alpha,
                               bound_beta, bound_multiplier, i + 1)
             for i in range(num_total_sites)]
    from .vcf_filter import is_alt_ancestor
    windows = []
    for _ in range(num_windows):
        order = rng.permutation(len(sites))
        chosen = [sites[i] for i in order][:num_window_sites]
        windows.append((sum(1 for v in chosen if is_alt_ancestor(v)),
                        chosen))
    windows.sort(key=lambda w: w[0])
    with fileio.easy_create(out_lower) as out:
        for _, chosen in windows[:int(lower_percentile * num_windows)]:
            for v in chosen:
                vcfio.write_vcf(out, v)
    with fileio.easy_create(out_upper) as out:
        for _, chosen in windows[int(upper_percentile * num_windows):]:
            for v in chosen:
                vcfio.write_vcf(out, v)


# --- simulatePcr (deterministic) ---

def _find_priming_sites(template: str, primer: str,
                        fwd: bool) -> list[tuple[str, int]]:
    """findPrimingSites (simulatePcr.go:160)."""
    sites = []
    offset = 0
    while template:
        pos = template.find(primer)
        if pos == -1:
            break
        if fwd:
            pos += len(primer)
        sites.append((primer, offset + pos))
        if not fwd:
            pos += len(primer)
        offset += pos
        template = template[pos:]
    return sites


def _calc_products(chrom: str, fwd_sites, rev_sites, max_len: int,
                   include_primer: bool) -> list[bedio.Bed]:
    """calcProducts (simulatePcr.go:184)."""
    out: list[bedio.Bed] = []
    if not fwd_sites or not rev_sites:
        return out
    rev_idx = 0
    for i, (primer, start) in enumerate(fwd_sites):
        while start >= rev_sites[rev_idx][1]:
            rev_idx += 1
            if rev_idx >= len(rev_sites):
                return out
        if i + 1 < len(fwd_sites) \
                and fwd_sites[i + 1][1] < rev_sites[rev_idx][1]:
            continue
        s, e = start, rev_sites[rev_idx][1]
        if include_primer:
            s -= len(primer)
            e += len(rev_sites[rev_idx][0])
        if e - s <= max_len:
            rev_orig = dna.to_string(dna.reverse_complement(
                np.array(dna.from_string(rev_sites[rev_idx][0]),
                         copy=True)))
            out.append(bedio.Bed(chrom, s, e, f"{primer}+{rev_orig}",
                                 fields_initialized=4))
    return out


def simulate_pcr(primers: list[str], ref: str, out_bed: str = "",
                 out_fastq: str = "", max_len: int = 1000,
                 include_primer: bool = True) -> None:
    """simulatePcr (simulatePcr.go:51)."""
    if max_len == 0:
        max_len = 1 << 62
    records = fastaio.read(ref)
    rev_primers = [dna.to_string(dna.reverse_complement(
        np.array(dna.from_string(p), copy=True))) for p in primers]
    out_b = fileio.easy_create(out_bed) if out_bed else None
    out_fq = fileio.easy_create(out_fastq) if out_fastq else None
    count = 0
    for rec in records:
        template = dna.to_string(dna.to_upper(np.asarray(rec.seq)))
        fwd_sites: list[tuple[str, int]] = []
        rev_sites: list[tuple[str, int]] = []
        for p, rp in zip(primers, rev_primers):
            fwd_sites.extend(_find_priming_sites(template, p, True))
            rev_sites.extend(_find_priming_sites(template, rp, False))
        fwd_sites.sort(key=lambda s: s[1])
        rev_sites.sort(key=lambda s: s[1])
        for b in _calc_products(rec.name, fwd_sites, rev_sites, max_len,
                                include_primer):
            if out_b:
                bedio.write_to_handle(out_b, b)
            if out_fq:
                seq = template[b.chrom_start:b.chrom_end]
                out_fq.write(f"@{b.chrom}:{b.chrom_start}-{b.chrom_end}"
                             f"_{b.name}\n{seq}\n+\n"
                             + "I" * len(seq) + "\n")
            count += 1
    if out_b:
        out_b.close()
    if out_fq:
        out_fq.close()
    print(f"found {count} potential products")


def main_bed(argv=None) -> None:
    p = argparse.ArgumentParser(prog="simulateBed")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-matchedBed", default="")
    p.add_argument("-L", type=int, default=1000)
    p.add_argument("-N", type=int, default=10)
    p.add_argument("-setSeed", type=int, default=-1)
    a = p.parse_args(argv)
    simulate_bed(a.N, a.L, a.matchedBed, a.input, a.output, a.setSeed)


def main_vcf(argv=None) -> None:
    p = argparse.ArgumentParser(prog="simulateVcf")
    p.add_argument("output")
    p.add_argument("-numSites", type=int, default=10)
    p.add_argument("-setSeed", type=int, default=-1)
    p.add_argument("-alpha", type=float, default=0.01)
    p.add_argument("-numAlleles", type=int, default=10)
    p.add_argument("-boundAlpha", type=float, default=0.001)
    p.add_argument("-boundBeta", type=float, default=0.001)
    p.add_argument("-boundMultiplier", type=float, default=10000)
    p.add_argument("-refFile", default="")
    a = p.parse_args(argv)
    simulate_vcf(a.output, alpha=a.alpha, num_alleles=a.numAlleles,
                 num_sites=a.numSites, set_seed=a.setSeed,
                 bound_alpha=a.boundAlpha, bound_beta=a.boundBeta,
                 bound_multiplier=a.boundMultiplier, ref_file=a.refFile)


def main_divergent_windows(argv=None) -> None:
    p = argparse.ArgumentParser(prog="simulateDivergentWindowsVcf")
    p.add_argument("lowerOut")
    p.add_argument("upperOut")
    p.add_argument("-alpha", type=float, default=0.01)
    p.add_argument("-numAlleles", type=int, default=10)
    p.add_argument("-numTotalSites", type=int, default=20)
    p.add_argument("-numWindowSites", type=int, default=10)
    p.add_argument("-numWindows", type=int, default=10)
    p.add_argument("-lowerPercentile", type=float, default=0.1)
    p.add_argument("-upperPercentile", type=float, default=0.9)
    p.add_argument("-setSeed", type=int, default=-1)
    a = p.parse_args(argv)
    simulate_divergent_windows_vcf(
        a.lowerOut, a.upperOut, alpha=a.alpha, num_alleles=a.numAlleles,
        num_total_sites=a.numTotalSites,
        num_window_sites=a.numWindowSites, num_windows=a.numWindows,
        lower_percentile=a.lowerPercentile,
        upper_percentile=a.upperPercentile, set_seed=a.setSeed)


def main_pcr(argv=None) -> None:
    p = argparse.ArgumentParser(prog="simulatePcr")
    p.add_argument("-p", action="append", default=[], dest="primers")
    p.add_argument("-t", required=True)
    p.add_argument("-bed", default="")
    p.add_argument("-fastq", default="")
    p.add_argument("-maxProductSize", type=int, default=1000)
    p.add_argument("-includePrimer", action="store_true", default=True)
    a = p.parse_args(argv)
    if not a.primers:
        raise SystemExit("ERROR: primer sequence must be declared at "
                         "least once using -p")
    simulate_pcr(a.primers, a.t, a.bed, a.fastq, a.maxProductSize,
                 a.includePrimer)
