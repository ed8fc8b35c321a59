"""gene + variant package tests, porting the reference's table-driven
expectations (gene/{gene,pointMutation,insert,delete}_test.go,
variant/effect_test.go)."""

import numpy as np

from gonomics_tpu import codon, dna
from gonomics_tpu import genemod as gene
from gonomics_tpu import variantmod as variant
from gonomics_tpu.io import fasta as fastaio
from gonomics_tpu.io import gtf as gtfio

TD = "/root/reference/gene/testdata"


def _load(gene_id: str) -> gene.Gene:
    g = gtfio.read(f"{TD}/test.gtf")
    ref = {r.name: r.seq for r in fastaio.read(f"{TD}/test.fasta")}
    return gene.gtf_to_gene(g[gene_id], ref)


def seq(s: str) -> list[int]:
    return [int(b) for b in dna.from_string(s)]


def test_gtf_to_gene_pos():
    g = _load("test_gene_id")
    assert g.start_pos == 0 and g.pos_strand
    assert g.cds_starts == [2, 7, 11] and g.cds_ends == [4, 9, 13]
    assert g.genome_seq == seq("ACATGCACCGTTAACG")
    assert g.cdna_seq == seq("ACATGCCGTAACG")
    assert g.feature_array == [-5, -5, 0, 1, 2, -1, -1, 3, 4, 5, -1, 6,
                               7, 8, -3, -3]
    assert g.utr_five_seq == seq("AC")
    assert g.utr_three_seq == seq("CG")
    assert g.coding_seq == seq("ATGCCGTAA")


def test_gtf_to_gene_neg():
    g = _load("test_gene_id_negative")
    assert g.start_pos == 15 and not g.pos_strand
    assert g.cds_starts == [2, 7, 11] and g.cds_ends == [4, 9, 13]
    assert g.genome_seq == seq("ACATGCACCGTTAACG")
    assert g.cdna_seq == seq("ACATGCCGTAACG")
    assert g.coding_seq == seq("ATGCCGTAA")


def test_position_conversion():
    g = _load("test_gene_id")
    assert gene.genomic_pos_to_cdna(g, 0) == (0, -2)
    assert gene.genomic_pos_to_cdna(g, 3) == (1, 0)
    assert gene.genomic_pos_to_cdna(g, 10) == (5, 1)
    assert gene.genomic_pos_to_cdna(g, 14) == (8, 1)
    assert gene.coding_pos_to_genomic(g, 0) == 2
    assert gene.coding_pos_to_genomic(g, 3) == 7
    assert gene.coding_pos_to_genomic(g, 6) == 11
    assert gene.coding_pos_to_genomic(g, 8) == 13

    n = _load("test_gene_id_negative")
    assert gene.genomic_pos_to_cdna(n, 0) == (8, 2)
    assert gene.genomic_pos_to_cdna(n, 3) == (7, 0)
    assert gene.genomic_pos_to_cdna(n, 10) == (2, 1)
    assert gene.genomic_pos_to_cdna(n, 14) == (0, -1)
    assert gene.coding_pos_to_genomic(n, 0) == 13
    assert gene.coding_pos_to_genomic(n, 3) == 8
    assert gene.coding_pos_to_genomic(n, 6) == 4
    assert gene.coding_pos_to_genomic(n, 8) == 2


def test_point_mutation_pos():
    g = _load("test_gene_id")
    p = gene.substitution(g, 6, dna.T)
    assert (p.cdna_pos, p.cdna_dist, p.consequence) == (3, -1,
                                                        gene.SPLICE)
    gene.reset(g)
    p = gene.substitution(g, 3, dna.A)
    assert (p.cdna_pos, p.cdna_dist, p.consequence, p.aa_pos) == \
           (1, 0, gene.DISRUPT_START, 0)
    assert p.aa_ref == [codon.MET] and p.aa_alt == [codon.LYS]
    gene.reset(g)
    p = gene.substitution(g, 8, dna.A)
    assert (p.cdna_pos, p.consequence, p.aa_pos) == (4, gene.MISSENSE, 1)
    assert p.aa_ref == [codon.PRO] and p.aa_alt == [codon.GLN]
    gene.reset(g)
    p = gene.substitution(g, 11, dna.A)
    assert (p.cdna_pos, p.consequence, p.aa_pos) == (6, gene.DISRUPT_STOP,
                                                     2)
    assert p.aa_ref == [codon.STOP] and p.aa_alt == [codon.LYS]
    gene.reset(g)
    assert g.genome_seq == seq("ACATGCACCGTTAACG")
    assert g.cdna_seq == seq("ACATGCCGTAACG")


def test_point_mutation_neg():
    g = _load("test_gene_id_negative")
    p = gene.substitution(g, 9, dna.A)
    assert (p.cdna_pos, p.cdna_dist, p.consequence) == (3, -1,
                                                        gene.SPLICE)
    gene.reset(g)
    p = gene.substitution(g, 12, dna.T)
    assert (p.cdna_pos, p.consequence) == (1, gene.DISRUPT_START)
    assert p.aa_ref == [codon.MET] and p.aa_alt == [codon.LYS]
    gene.reset(g)
    p = gene.substitution(g, 7, dna.T)
    assert (p.cdna_pos, p.consequence, p.aa_pos) == (4, gene.MISSENSE, 1)
    assert p.aa_ref == [codon.PRO] and p.aa_alt == [codon.GLN]


def _assert_state(g, cds_starts, cds_ends, genome, cdna, features, utr5,
                  utr3, coding, start_pos=0):
    assert g.start_pos == start_pos
    assert g.cds_starts == cds_starts and g.cds_ends == cds_ends
    assert g.genome_seq == seq(genome)
    assert g.cdna_seq == seq(cdna)
    assert g.feature_array == features
    assert g.utr_five_seq == seq(utr5)
    assert g.utr_three_seq == seq(utr3)
    assert g.coding_seq == seq(coding)


def test_insertion_states():
    g = _load("test_gene_id")
    gene.insertion(g, 8, seq("AT"))  # coding insertion
    _assert_state(g, [2, 7, 13], [4, 11, 15], "ACATGCACCATGTTAACG",
                  "ACATGCCATGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, 3, 4, 5, 6, 7, -1, 8, 9, 10,
                   -3, -3], "AC", "CG", "ATGCCATGTAA")
    gene.reset(g)
    gene.insertion(g, 5, seq("AT"))  # intronic
    _assert_state(g, [2, 9, 13], [4, 11, 15], "ACATGCATACCGTTAACG",
                  "ACATGCCGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, -1, -1, 3, 4, 5, -1, 6, 7, 8,
                   -3, -3], "AC", "CG", "ATGCCGTAA")
    gene.reset(g)
    gene.insertion(g, 6, seq("AT"))  # intronic
    _assert_state(g, [2, 9, 13], [4, 11, 15], "ACATGCAATCCGTTAACG",
                  "ACATGCCGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, -1, -1, 3, 4, 5, -1, 6, 7, 8,
                   -3, -3], "AC", "CG", "ATGCCGTAA")
    gene.reset(g)
    gene.insertion(g, 0, seq("AT"))  # 5' UTR
    _assert_state(g, [4, 9, 13], [6, 11, 15], "AATCATGCACCGTTAACG",
                  "AATCATGCCGTAACG",
                  [-5, -5, -5, -5, 0, 1, 2, -1, -1, 3, 4, 5, -1, 6, 7, 8,
                   -3, -3], "AATC", "CG", "ATGCCGTAA")
    gene.reset(g)
    _assert_state(g, [2, 7, 11], [4, 9, 13], "ACATGCACCGTTAACG",
                  "ACATGCCGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, 3, 4, 5, -1, 6, 7, 8, -3, -3],
                  "AC", "CG", "ATGCCGTAA")


def test_deletion_states():
    g = _load("test_gene_id")
    gene.deletion(g, 4, 12)  # multi-exon deletion
    _assert_state(g, [2, 4], [3, 5], "ACATAACG", "ACATAACG",
                  [-5, -5, 0, 1, 2, 3, -3, -3], "AC", "CG", "ATAA")
    gene.reset(g)
    gene.deletion(g, 2, 5)  # removes first CDS
    _assert_state(g, [4, 8], [6, 10], "ACCACCGTTAACG", "ACCCGTAACG",
                  [-5, -5, -1, -1, 0, 1, 2, -1, 3, 4, 5, -3, -3],
                  "AC", "CG", "CCGTAA")
    gene.reset(g)
    gene.deletion(g, 10, 11)  # intron deletion
    _assert_state(g, [2, 7, 10], [4, 9, 12], "ACATGCACCGTAACG",
                  "ACATGCCGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, 3, 4, 5, 6, 7, 8, -3, -3],
                  "AC", "CG", "ATGCCGTAA")
    gene.reset(g)
    gene.deletion(g, 0, 2)  # delete 5' UTR
    _assert_state(g, [0, 5, 9], [2, 7, 11], "ATGCACCGTTAACG",
                  "ATGCCGTAACG",
                  [0, 1, 2, -1, -1, 3, 4, 5, -1, 6, 7, 8, -3, -3],
                  "", "CG", "ATGCCGTAA", start_pos=2)
    gene.reset(g)
    _assert_state(g, [2, 7, 11], [4, 9, 13], "ACATGCACCGTTAACG",
                  "ACATGCCGTAACG",
                  [-5, -5, 0, 1, 2, -1, -1, 3, 4, 5, -1, 6, 7, 8, -3, -3],
                  "AC", "CG", "ATGCCGTAA")


# --- variant package (reference variant/effect_test.go semantics) ---

def test_variant_substitution_effect():
    cds = seq("ATGCCGTAA")
    sub = variant.Substitution("chr1", 4, dna.C, dna.A)
    eff = sub.effect(cds)
    assert eff.effect_type == variant.MISSENSE
    assert eff.removed_aa == [codon.PRO] and eff.added_aa == [codon.GLN]
    assert eff.coding_pos == 4 and eff.protein_pos == 1
    # silent
    silent = variant.Substitution("chr1", 5, dna.G, dna.A)  # CCG->CCA
    assert silent.effect(cds).effect_type == variant.SILENT
    # nonsense: Gln codon CAA at 3..5? make TAA
    cds2 = seq("ATGCAATAA")
    non = variant.Substitution("chr1", 3, dna.C, dna.T)
    assert non.effect(cds2).effect_type == variant.NONSENSE


def test_variant_insertion_deletion_effect():
    cds = seq("ATGCCGAAATAA")
    ins = variant.Insertion("chr1", 6, seq("GGG"))
    eff = ins.effect(cds)
    assert eff.effect_type == variant.IN_FRAME_INSERTION
    assert eff.added_aa == [codon.GLY]
    fs = variant.Insertion("chr1", 6, seq("GG"))
    assert fs.effect(cds).effect_type == variant.FRAMESHIFT
    dele = variant.Deletion("chr1", 3, 6)
    eff = dele.effect(cds)
    assert eff.effect_type == variant.IN_FRAME_DELETION
    assert eff.removed_aa == [codon.PRO]
    fs2 = variant.Deletion("chr1", 3, 5)
    assert fs2.effect(cds).effect_type == variant.FRAMESHIFT


def test_variant_mutate():
    s = seq("ATGCCGTAA")
    out = variant.Substitution("chr1", 4, dna.C, dna.A).mutate(list(s))
    assert out == seq("ATGCAGTAA")
    out = variant.Insertion("chr1", 3, seq("AT")).mutate(list(s))
    assert out == seq("ATGATCCGTAA")
    out = variant.Deletion("chr1", 3, 6).mutate(list(s))
    assert out == seq("ATGTAA")
    out = variant.Delins("chr1", 3, 6, seq("T")).mutate(list(s))
    assert out == seq("ATGTTAA")
