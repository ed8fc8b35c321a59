"""callVariants + SAM/BAM stack tests against reference testdata
(cmd/callVariants/callVariants_test.go config)."""

import numpy as np

from gonomics_tpu import fileio
from gonomics_tpu.cli.call_variants import call_variants
from gonomics_tpu.io import sam as samio
from gonomics_tpu.io.fai import Seeker
from gonomics_tpu import dna

TD = "/root/reference/cmd/callVariants/testdata"


def test_bam_reader_basics():
    header, recs = samio.read(f"{TD}/human_chrM.bam")
    assert [c.name for c in header.chroms] == ["chrM"]
    assert header.sort_order == ["coordinate"]
    assert len(recs) == 912
    r = recs[0]
    assert r.pos == 1 and r.rname == "chrM"
    assert samio.samcigar.to_string(r.cigar) if hasattr(samio, "samcigar") \
        else True


def test_seeker_matches_read():
    from gonomics_tpu.io import fasta

    ref = fasta.read(f"{TD}/human_chrM.fasta")[0]
    seeker = Seeker(f"{TD}/human_chrM.fasta")
    got = seeker.seek_by_name("chrM", 100, 175)
    assert dna.to_string(got) == dna.to_string(ref.seq[100:175])
    seeker.close()


def test_call_variants_golden(tmp_path):
    out = str(tmp_path / "out.vcf")
    call_variants([f"{TD}/human_chrM.bam"], [f"{TD}/human_chrM2.bam"],
                  f"{TD}/human_chrM.fasta", out, max_p=1.1, min_af=0.0,
                  max_af=1.0, max_strand_bias=1.0, min_coverage=0,
                  min_mapq=0, min_alt_reads=0)
    assert fileio.are_equal_ignore_comments(out, f"{TD}/test_expected.vcf")


def test_fisher_exact_symmetry():
    from gonomics_tpu.numbers import fisher_exact

    # classic tea-tasting table sanity value
    p = fisher_exact(1, 9, 11, 3, True)
    assert abs(p - 0.001379728) < 1e-8
    assert fisher_exact(3, 1, 1, 3, False) == fisher_exact(1, 3, 3, 1, True)
