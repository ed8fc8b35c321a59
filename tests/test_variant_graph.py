"""VCF -> variant-graph construction (genomeGraph/graphTools.go:13-196)
and the gsw ggtools subcommand (cmd/gsw/ggTools.go)."""

import numpy as np

from gonomics_tpu import dna, graph as graphmod
from gonomics_tpu.gsw import GswAligner
from gonomics_tpu.io import fasta as fastaio, vcf as vcfio
from gonomics_tpu.io.fasta import Fasta


def _vcf(pos, ref, alt, info, vid="."):
    return vcfio.Vcf(chrom="chr1", pos=pos, id=vid, ref=ref, alt=[alt],
                     info=info)


def _chr1():
    return Fasta("chr1", dna.from_string("AAAACCCCGGGGTTTT"))


def test_variant_graph_snp_ins_del_structure(tmp_path):
    # hand-traced expected graph for SNP@5(C>T), INS@9(G>GAA), DEL@13(TTT>T)
    vcfs = {"chr1": [
        _vcf(5, "C", "T", "SVTYPE=SNP"),
        _vcf(9, "G", "GAA", "SVTYPE=INS"),
        _vcf(13, "TTT", "T", "SVTYPE=DEL"),
    ]}
    g = graphmod.variant_graph([_chr1()], vcfs)
    seqs = [dna.to_string(n.seq) for n in g.nodes]
    assert seqs == ["AAAA", "C", "T", "CCC", "GAA", "GGGG", "TTT", ""]
    out = tmp_path / "g.gg"
    graphmod.write(str(out), g)
    expected = (
        ">0\nAAAA\n>1\nC\n>2\nT\n>3\nCCC\n>4\nGAA\n>5\nGGGG\n>6\nTTT\n>7\n"
        "0\t0.5\t1\t0.5\t2\n"
        "1\t1\t3\n"
        "2\t1\t3\n"
        "3\t0.5\t4\t0.5\t5\n"
        "4\t1\t5\n"
        "5\t0.5\t6\t0.5\t7\n"
        "6\t1\t7\n")
    assert out.read_text() == expected
    # graph round-trips through the text serialization
    g2 = graphmod.read(str(out))
    assert [dna.to_string(n.seq) for n in g2.nodes] == seqs


def test_variant_graph_adjacent_snps_merge():
    # adjacent SNPs merge into one ref/alt allele pair (graphTools.go:123)
    vcfs = {"chr1": [
        _vcf(5, "C", "T", "SVTYPE=SNP"),
        _vcf(6, "C", "G", "SVTYPE=SNP"),
    ]}
    g = graphmod.variant_graph([_chr1()], vcfs)
    seqs = [dna.to_string(n.seq) for n in g.nodes]
    assert "CC" in seqs and "TG" in seqs  # merged alleles


def test_variant_graph_no_variants_single_node():
    g = graphmod.variant_graph([_chr1()], {})
    assert len(g.nodes) == 1
    assert dna.to_string(g.nodes[0].seq) == "AAAACCCCGGGGTTTT"


def test_variant_graph_inversion_and_dup():
    vcfs = {"chr1": [
        _vcf(5, "C", "<INV>", "SVTYPE=INV;END=8"),
        _vcf(12, "G", "<DUP>", "SVTYPE=DUP;END=14"),
    ]}
    g = graphmod.variant_graph([_chr1()], vcfs)
    seqs = [dna.to_string(n.seq) for n in g.nodes]
    # match node absorbs the ref anchor (graphTools.go INV branch):
    assert "AAAAC" in seqs
    # inversion node = revcomp(chr[5:8]) = revcomp(CCC) = GGG
    assert "GGG" in seqs
    # dup node = chr[12:14] = TT
    assert "TT" in seqs


def test_gsw_align_on_constructed_graph():
    # reads spanning the alt allele align through the variant graph
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 400).astype(np.int8)
    chrom = Fasta("chr1", seq)
    alt = "T" if dna.to_string(seq[199:200]) != "T" else "A"
    vcfs = {"chr1": [vcfio.Vcf(chrom="chr1", pos=200,
                               ref=dna.to_string(seq[199:200]),
                               alt=[alt], info="SVTYPE=SNP")]}
    g = graphmod.variant_graph([chrom], vcfs)
    assert len(g.nodes) == 4

    aligner = GswAligner(g, seed_len=21, step_size=21)
    # a 60bp read through the ALT allele (node ids sorted: 0=left match)
    read_seq = np.concatenate([
        seq[160:199], dna.from_string(alt), seq[200:220]])
    from gonomics_tpu.io.fastq import Fastq, to_big

    fq = Fastq("altread", read_seq, np.full(len(read_seq), 30, np.uint8))
    giraf = aligner.align_read(to_big(fq))
    assert giraf.aln_score > 0
    # the alignment path must include the alt-allele node
    alt_nodes = [n.id for n in g.nodes
                 if dna.to_string(n.seq) == alt and len(n.seq) == 1]
    assert any(nid in giraf.path.nodes for nid in alt_nodes), \
        (giraf.path.nodes, alt_nodes)


def test_ggtools_vcf_to_gg(tmp_path):
    from gonomics_tpu.cli.gsw_cmd import main as gsw_main

    fa = tmp_path / "ref.fa"
    fastaio.write(str(fa), [_chr1()])
    vcf_path = tmp_path / "vars.vcf"
    with open(vcf_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write("chr1\t5\t.\tC\tT\t30\tPASS\tSVTYPE=SNP\n")
    out = tmp_path / "out.gg"
    gsw_main(["ggtools", str(vcf_path), "-t", str(fa), "-f", "gg",
              "-o", str(out)])
    g = graphmod.read(str(out))
    seqs = [dna.to_string(n.seq) for n in g.nodes]
    assert seqs == ["AAAA", "C", "T", "CCCGGGGTTTT"]


def test_ggtools_axt_to_vcf(tmp_path):
    from gonomics_tpu.cli.gsw_cmd import main as gsw_main

    axt = tmp_path / "aln.axt"
    # one block with a single mismatch at target pos 3
    axt.write_text("0 chr1 1 8 chrQ 1 8 + 100\nAAATAAAA\nAAACAAAA\n\n")
    out = tmp_path / "out.vcf"
    gsw_main(["ggtools", str(axt), "-f", "vcf", "-o", str(out)])
    records, header = vcfio.read(str(out))
    assert header.text[0] == "##fileformat=VCFv4.2"
    assert len(records) == 1
    v = records[0]
    assert (v.chrom, v.pos, v.ref, v.alt) == ("chr1", 4, "T", ["C"])
    assert "SVTYPE=SNP" in v.info
