"""Golden tests for the gtf package + gtfTools/getPromoter/geneIdToName
(reference cmd test tables; gtf map iteration is unordered in Go so
filter outputs compare ignore-order, matching the reference test)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.gene_id_to_name import gene_id_to_name
from gonomics_tpu.cli.get_promoter import get_promoter
from gonomics_tpu.cli.gtf_tools import gtf_filter, gtf_to_bed
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import gtf as gtfio

REF = "/root/reference/cmd"
TD = f"{REF}/gtfTools/testdata"


def test_gtf_round_trip(tmp_path):
    # the reference writer drops start/stop codons, so compare parsed
    # structures (like gtf_test.go's AllAreEqual), not file bytes
    src = "/root/reference/gtf/testdata/test.gtf"
    out = str(tmp_path / "rt.gtf")
    a = gtfio.read(src)
    gtfio.write(out, a)
    b = gtfio.read(out)
    assert list(a) == list(b)
    for k in a:
        assert len(a[k].transcripts) == len(b[k].transcripts)
        for ta, tb in zip(a[k].transcripts, b[k].transcripts):
            assert (ta.chrom, ta.start, ta.end, ta.strand,
                    ta.transcript_id) == (tb.chrom, tb.start, tb.end,
                                          tb.strand, tb.transcript_id)
            assert [(e.start, e.end, e.exon_id) for e in ta.exons] == \
                   [(e.start, e.end, e.exon_id) for e in tb.exons]
            assert [(e.cds.start, e.cds.end, e.cds.frame)
                    for e in ta.exons if e.cds] == \
                   [(e.cds.start, e.cds.end, e.cds.frame)
                    for e in tb.exons if e.cds]


def test_gtf_filter_gene_list(tmp_path):
    out = str(tmp_path / "out.gtf")
    gtf_filter("/root/reference/gtf/testdata/test.gtf", out,
               gene_name_list=f"{TD}/geneList.txt")
    assert fileio.are_equal_ignore_order(out, f"{TD}/expected.filter.gtf")


def test_gtf_filter_chrom(tmp_path):
    out = str(tmp_path / "out.gtf")
    gtf_filter(f"{TD}/chromFilter.gtf", out, chrom_filter="chrM")
    assert fileio.are_equal_ignore_order(out,
                                         f"{TD}/expected.chromFilter.gtf")


def test_gtf_filter_chrom_and_genes(tmp_path):
    out = str(tmp_path / "out.gtf")
    gtf_filter(f"{TD}/chromFilter.gtf", out, chrom_filter="chr1",
               gene_name_list=f"{TD}/geneListForChromFilter.txt")
    assert fileio.are_equal_ignore_order(
        out, f"{TD}/expected.chromFilterGeneFilter.gtf")


def test_gtf_filter_coding(tmp_path):
    out = str(tmp_path / "out.gtf")
    gtf_filter(f"{TD}/codingTranscriptFilter.gtf", out,
               coding_transcript=True)
    assert fileio.are_equal_ignore_order(
        out, f"{TD}/expected.codingTranscriptFilter.gtf")


def test_gtf_to_bed_plain(tmp_path):
    out = str(tmp_path / "out.bed")
    gtf_to_bed(f"{TD}/test.gtf", out)
    assert fileio.are_equal(out, f"{TD}/testOut.bed")


def test_gtf_to_bed_tss(tmp_path):
    out = str(tmp_path / "out.bed")
    gtf_to_bed(f"{TD}/test.gtf", out, tss=True,
               chrom_size_file=f"{TD}/chr1.chrom.sizes")
    assert fileio.are_equal_ignore_order(out, f"{TD}/expected.tss.bed")


def test_gtf_to_bed_first_two_codon_bases(tmp_path):
    out = str(tmp_path / "out.bed")
    gtf_to_bed(f"{TD}/test.gtf", out, first_two_codon_bases=True)
    assert fileio.are_equal(out, f"{TD}/expected.firstTwoCodonBases.bed")


def test_get_promoter(tmp_path):
    td = f"{REF}/getPromoter/testdata"
    out = str(tmp_path / "out.bed")
    get_promoter(f"{td}/uniqueGenes.txt", f"{td}/gtfFileTest.gtf", out,
                 f"{td}/hg38.chrom.sizes")
    assert bedio.read(out) == bedio.read(f"{td}/expected1kb.bed")
    get_promoter(f"{td}/uniqueGenes.txt", f"{td}/gtfFileTest.gtf", out,
                 f"{td}/hg38.chrom.sizes", upstream=5000, downstream=1000)
    assert bedio.read(out) == bedio.read(f"{td}/expected5kb.bed")


def test_gene_id_to_name(tmp_path, capsys):
    td = f"{REF}/geneIdToName/testdata"
    out = str(tmp_path / "out.txt")
    gene_id_to_name(f"{td}/testConversionTable.txt", f"{td}/in.txt", out)
    assert fileio.are_equal(out, f"{td}/expected.txt")
    gene_id_to_name(f"{td}/testConversionTable.txt", f"{td}/in.txt", out,
                    keep_matching=True)
    assert fileio.are_equal(out, f"{td}/expectedKeepMatching.txt")
