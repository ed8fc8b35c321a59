"""Golden tests for dotToNewick, multiFaScan, divergenceSpectrum,
faToPredictSet, formatIdeogram, prcompFormat, intervalContacts,
quickOrthologs, axTools, axtSam (reference cmd test tables)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.ax_tools import axt_stats, query_swap_all
from gonomics_tpu.cli.axt_sam import axt_sam
from gonomics_tpu.cli.divergence_spectrum import divergence_spectrum
from gonomics_tpu.cli.dot_to_newick import dot_to_newick
from gonomics_tpu.cli.fa_to_predict_set import fa_to_predict_set
from gonomics_tpu.cli.format_ideogram import format_ideogram
from gonomics_tpu.cli.interval_contacts import interval_contacts
from gonomics_tpu.cli.multi_fa_scan import multi_fa_scan
from gonomics_tpu.cli.prcomp_format import prcomp_format
from gonomics_tpu.cli.quick_orthologs import quick_orthologs
from gonomics_tpu.io import sam as samio

REF = "/root/reference/cmd"


def test_dot_to_newick(tmp_path):
    td = f"{REF}/dotToNewick/testdata"
    out = str(tmp_path / "out.nh")
    dot_to_newick(f"{td}/primate.dot", out)
    assert fileio.are_equal(out, f"{td}/expected.nh")


def test_multi_fa_scan(tmp_path):
    td = f"{REF}/multiFaScan/testdata"
    out = str(tmp_path / "out.bed")
    multi_fa_scan(f"{td}/testInput.fa", out,
                  query_name="Human_Chimp_Ancestor", chrom="chr1")
    assert fileio.are_equal(out, f"{td}/expected.bed")


def test_divergence_spectrum(tmp_path):
    td = f"{REF}/divergenceSpectrum/testdata"
    out = str(tmp_path / "out.bed")
    divergence_spectrum(f"{td}/test.bed", f"{td}/test.vcf", out)
    assert fileio.are_equal(out, f"{td}/expected.bed")


def test_fa_to_predict_set(tmp_path):
    td = f"{REF}/faToPredictSet/testdata"
    out = str(tmp_path / "out.txt")
    fa_to_predict_set(f"{td}/test.fa", out, window_size=10, stride=1)
    assert fileio.are_equal(out, f"{td}/expected.txt")
    fa_to_predict_set(f"{td}/test.fa", out, window_size=10, stride=1,
                      with_rev_comp=True)
    assert fileio.are_equal(out, f"{td}/expected.withRevComp.txt")


def test_format_ideogram(tmp_path):
    td = f"{REF}/formatIdeogram/testdata"
    out = str(tmp_path / "out.txt")
    format_ideogram(f"{td}/test.bed", out)
    assert fileio.are_equal(out, f"{td}/expected.Score.txt")
    format_ideogram(f"{td}/test.bed", out, no_score=True)
    assert fileio.are_equal(out, f"{td}/expected.NoScore.txt")


def test_prcomp_format(tmp_path):
    td = f"{REF}/prcompFormat/testdata"
    out = str(tmp_path / "out.tsv")
    prcomp_format(f"{td}/test.fa", out)
    assert fileio.are_equal(out, f"{td}/expected.tsv")


def test_interval_contacts(tmp_path):
    td = f"{REF}/intervalContacts/testdata"
    out = str(tmp_path / "out.bed")
    interval_contacts(f"{td}/contacts.bedpe", f"{td}/input.bed", out)
    assert fileio.are_equal(out, f"{td}/expected.out.bed")
    interval_contacts(f"{td}/contacts.bedpe", f"{td}/input.vcf", out)
    assert fileio.are_equal(out, f"{td}/expected.vcf.out.bed")


def test_quick_orthologs(tmp_path):
    td = f"{REF}/quickOrthologs/testdata"
    out, un = str(tmp_path / "out.txt"), str(tmp_path / "un.txt")
    quick_orthologs("hg38", "panTro6", f"{td}/chrM.hg38.panTro6.gtf",
                    f"{td}/chrM.hg38.panTro6.chain", f"{td}/chrM.chrom.sizes",
                    out, un)
    # the reference test sorts lines (Go map iteration order)
    assert sorted(fileio.read(out)) == sorted(
        fileio.read(f"{td}/expected.out.txt"))
    assert sorted(fileio.read(un)) == sorted(
        fileio.read(f"{td}/expected.unmapped.txt"))


def test_axt_stats(tmp_path):
    td = f"{REF}/axTools/testdata"
    out = str(tmp_path / "out.txt")
    axt_stats(f"{td}/test.axt", "", out)
    assert fileio.are_equal(out, f"{td}/exp.stats.txt")
    axt_stats(f"{td}/test.axt", f"{td}/bed1.bed", out)
    assert fileio.are_equal(out, f"{td}/exp.stats.bed.txt")


def test_axt_swap_round_trip(tmp_path):
    td = f"{REF}/axTools/testdata"
    sizes = str(tmp_path / "t.sizes")
    with open(sizes, "w") as f:
        for name in ("chr1", "chr2", "chr3", "chr4"):
            f.write(f"{name}\t1000\n")
    once = str(tmp_path / "once.axt")
    twice = str(tmp_path / "twice.axt")
    query_swap_all(f"{td}/test.axt", once, sizes, sizes)
    query_swap_all(once, twice, sizes, sizes)
    import gonomics_tpu.io.formats as formats
    orig, rt = formats.read_axt(f"{td}/test.axt"), formats.read_axt(twice)
    assert [(a.r_name, a.r_start, a.r_end) for a in orig] == \
        [(a.r_name, a.r_start, a.r_end) for a in rt]


def test_axt_sam(tmp_path):
    td = f"{REF}/axTools/testdata"
    sizes = str(tmp_path / "t.sizes")
    with open(sizes, "w") as f:
        for name in ("chr1", "chr3"):
            f.write(f"{name}\t1000\n")
    out = str(tmp_path / "out.sam")
    axt_sam(f"{td}/test.axt", out, chrom_sizes=sizes)
    header, records = samio.read(out)
    assert header.text[0] == "@HD\tVN:1.6\tSO:unsorted"
    assert len(records) == 2
    assert records[0].rname == "chr1" and records[0].pos == 101
    assert records[0].mapq == 255
    # second record is minus strand
    assert records[1].flag == 16
    # cigar covers the gapped alignment with =/X/I/D ops
    from gonomics_tpu.io import cigar as samcigar
    assert "D" in samcigar.to_string(records[1].cigar)
    assert "I" in samcigar.to_string(records[1].cigar)
