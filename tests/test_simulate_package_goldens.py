"""Package-level simulate goldens (/root/reference/simulate/testdata,
cases from bed_test.go, simulate_test.go, withIndels_test.go, sam_test.go).
These pin helpers the cmd-level goldens don't reach: GenerateBedRegion
edge cases, GoSimulateBed seeds, indelLength's RandExp stream, and
changeBaseTransitionBias (transitionBias=5)."""

import math
import os

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.simulate_tools import (_ungapped_regions_all,
                                             count_windows,
                                             generate_bed_region)
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import fasta as fastaio
from gonomics_tpu.numbers.gorand import GoRand
from gonomics_tpu.numbers.gosamplers import rand_exp, rand_int_in_range

T = "/root/reference/simulate/testdata"
pytestmark = pytest.mark.skipif(not os.path.isdir(T),
                                reason="reference testdata not present")


def _search_space(fa):
    return _ungapped_regions_all(fastaio.read(fa))


def test_count_windows():
    cases = [("ref_short.fasta", 3, 59), ("ref_short.fasta", 1, 69),
             ("ref_short_allGaps.fasta", 5, 0), ("ref_short_2.fasta", 50, 1)]
    for fa, length, want in cases:
        assert count_windows(_search_space(f"{T}/{fa}"), length) == want


def test_generate_bed_region():
    cases = [("ref_short.fasta", 49, 1, 1), ("ref_short.fasta", 10, 3, 2),
             ("ref_short.fasta", 0, 1, 3), ("ref_short.fasta", 50, 1, 4),
             ("ref_short_2.fasta", 0, 50, 5), ("ref_short.fasta", 14, 13, 6)]
    for fa, pos, length, idx in cases:
        region, found = generate_bed_region(_search_space(f"{T}/{fa}"),
                                            pos, length)
        assert found
        want = bedio.read(f"{T}/generateBedRegion_expected_{idx}.bed")[0]
        assert (region.chrom, region.chrom_start, region.chrom_end) == \
            (want.chrom, want.chrom_start, want.chrom_end)


def test_go_simulate_bed(tmp_path):
    cases = [("ref_short.fasta", 3, 1, 8, "goSimulateBed_expected_1.bed"),
             ("ref_short.fasta", 100, 3, 3, "goSimulateBed_expected_2.bed")]
    for fa, count, length, seed, expected in cases:
        rng = GoRand(seed)
        space = _search_space(f"{T}/{fa}")
        total = count_windows(space, length)
        out = str(tmp_path / expected)
        with fileio.easy_create(out) as f:
            for _ in range(count):
                pos = rand_int_in_range(rng, 0, total)
                region, found = generate_bed_region(space, pos, length)
                if found:
                    bedio.write_to_handle(f, region)
        with open(out) as f, open(f"{T}/{expected}") as g:
            assert f.read() == g.read()


def test_indel_length_goldens(tmp_path):
    # simulate_test.go:66: ONE rand.Seed(23) stream across all 3 lambdas
    rng = GoRand(23)
    for lam, expected in [(1, "expected.IndelLength.Lambda1.txt"),
                          (0.5, "expected.IndelLength.LambdaPoint5.txt"),
                          (3, "expected.IndelLength.Lambda3.txt")]:
        lines = [str(int(math.ceil(rand_exp(rng)[0] / lam)))
                 for _ in range(10000)]
        with open(f"{T}/{expected}") as g:
            assert "\n".join(lines) + "\n" == g.read()


def test_with_indels_package_pair(tmp_path):
    # withIndels_test.go:52: one rand.Seed(-1) stream across BOTH cases;
    # the second pins changeBaseTransitionBias (K80, gamma=5)
    from gonomics_tpu.simulate import with_indels

    rng = GoRand(-1)
    for bias, exp_fa, exp_vcf in [
            (1, "expected.rand.fa", "expected.rand.vcf"),
            (5, "expected.transition5.rand.fa",
             "expected.transition5.rand.vcf")]:
        fa_out = str(tmp_path / exp_fa)
        vcf_out = str(tmp_path / exp_vcf)
        records = with_indels(rng, f"{T}/rand.fa", 0.1, 0.2, 1, 0.42,
                              bias, vcf_out, "sim")
        fastaio.write(fa_out, records)
        for got, want in [(fa_out, f"{T}/{exp_fa}"),
                          (vcf_out, f"{T}/{exp_vcf}")]:
            with open(got) as f, open(want) as g:
                assert f.read() == g.read()


def test_illumina_paired_sam_package_golden(tmp_path):
    # sam_test.go:15: seed 1, eng.fa, 100 pairs, readLen 150, frag 500/50
    import numpy as np

    from gonomics_tpu import dna
    from gonomics_tpu.io import sam as samio
    from gonomics_tpu.simulate import illumina_paired_sam_go

    rng = GoRand(1)
    recs = fastaio.read(f"{T}/eng.fa")
    out = str(tmp_path / "actual.sam")
    sams = illumina_paired_sam_go(
        rng, recs[0].name, dna.to_upper(recs[0].seq).astype(np.int8),
        100, 150, 500, 50.0, 0.0, 0.0, None, None, 0.0, [])
    header = samio.Header()
    header.text = ["@HD\tVN:1.6\tSO:unsorted"] + [
        f"@SQ\tSN:{r.name}\tLN:{len(r.seq)}" for r in recs]
    samio.write_sam(out, header, sams)
    with open(out) as f, open(f"{T}/expected.sam") as g:
        assert f.read() == g.read()
