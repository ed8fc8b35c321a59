"""assemblyStats goldens + dna melting temperature unit values."""

import numpy as np

from gonomics_tpu import dna
from gonomics_tpu.cli.assembly_stats import assembly_stats_cmd
from gonomics_tpu.io import fasta as fastaio

TD = "/root/reference/cmd/assemblyStats/testdata"


def _check(tmp_path, exp, lower):
    out = str(tmp_path / "o.txt")
    assembly_stats_cmd(f"{TD}/test.fa", out, lower)
    got = open(out).read().replace(f"{TD}/test.fa", "testdata/test.fa")
    assert got == open(f"{TD}/{exp}").read()


def test_assembly_stats_goldens(tmp_path):
    _check(tmp_path, "expFalse.txt", False)
    _check(tmp_path, "expTrue.txt", True)


def test_contig_list_units():
    recs = [fastaio.Fasta("apple", dna.from_string(
                "ACGTGAGTGAGTAGGACCACGATGACACGANNTGA")),
            fastaio.Fasta("banana", dna.from_string("GgtAC")),
            fastaio.Fasta("carrot", dna.from_string("GTAGTGAGTGA"))]
    assert sorted(fastaio.make_contig_list(recs, True)) == [1, 2, 3, 11, 30]
    assert sum(fastaio.make_contig_list(recs, False)) == 49


def test_melting_temp():
    cases = [("ATCGTGACTGA", 32.4608090067),
             ("GTCGTGATTCTGC", 41.6641715041),
             ("GTCGTTAGATTCTGT", 41.0485726487),
             ("GCTGCGAATTCGCAGC", 55.4258364707)]
    for s, want in cases:
        assert abs(dna.melting_temp(dna.from_string(s)) - want) < 1e-6
