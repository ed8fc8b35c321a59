"""ontology package tests: obo/gaf IO goldens, DAG tools, fill-space
goldens, gafFilter/oboTools CLI goldens."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.ontology_tools import gaf_filter, obo_tools_mapping
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import bedpe as bedpeio
from gonomics_tpu.io import chrom_info
from gonomics_tpu.ontology import (fill_3d_space,
                                   fill_space_hidden_value,
                                   fill_space_no_hidden_value)
from gonomics_tpu.ontology import gaf as gafmod
from gonomics_tpu.ontology import obo as obomod

OBO_TD = "/root/reference/ontology/obo/testdata"
GAF_TD = "/root/reference/ontology/gaf/testdata"
ONT_TD = "/root/reference/ontology/testdata"


def test_obo_read_write_round_trip(tmp_path):
    records, header = obomod.read(f"{OBO_TD}/test.obo", force=True)
    out = str(tmp_path / "out.obo")
    obomod.write(out, records, header)
    again, _ = obomod.read(out, force=True)
    assert list(records) == list(again)
    for k in records:
        assert records[k].name == again[k].name
        assert records[k].is_a == again[k].is_a


def test_obo_to_dot(tmp_path):
    records, _ = obomod.read(f"{OBO_TD}/test.obo", force=True)
    out = str(tmp_path / "out.dot")
    obomod.to_dot(out, records)
    assert fileio.are_equal_ignore_order(out, f"{OBO_TD}/expected.dot")


def test_obo_subtree_report(tmp_path):
    records, _ = obomod.read(f"{OBO_TD}/test.obo", force=True)
    obomod.number_of_descendents(records)
    out = str(tmp_path / "report.txt")
    obomod.subtree_report(out, records)
    assert fileio.are_equal_ignore_order(out,
                                         f"{OBO_TD}/expected.report.txt")


def test_obo_subtree_to_dot(tmp_path):
    records, _ = obomod.read(f"{OBO_TD}/test.obo", force=True)
    out = str(tmp_path / "sub.dot")
    obomod.subtree_to_dot(out, "GO:0000030", records)
    assert fileio.are_equal(
        out, f"{OBO_TD}/expected.mannosyltransferaseActivity.dot")


def test_gaf_round_trip(tmp_path):
    records, header = gafmod.read(f"{GAF_TD}/test.gaf")
    out = str(tmp_path / "out.gaf")
    gafmod.write(out, records, header)
    assert fileio.are_equal(out, f"{GAF_TD}/test.gaf")


def test_gaf_filter_golden(tmp_path):
    td = "/root/reference/cmd/gafFilter/testdata"
    out = str(tmp_path / "out.gaf")
    gaf_filter(f"{td}/test.gaf", out, remove_not=True)
    assert fileio.are_equal(out, f"{td}/expected.gaf")


def test_obo_tools_mapping_golden(tmp_path):
    out = str(tmp_path / "map.txt")
    obo_tools_mapping(f"{OBO_TD}/test.obo", out, force=True)
    assert fileio.are_equal_ignore_order(
        out, "/root/reference/cmd/oboTools/testdata/expected.mapping.txt")


def test_fill_space_no_hidden_golden(tmp_path):
    genome = {"chr1": chrom_info.ChromInfo("chr1", 600, 0),
              "chr2": chrom_info.ChromInfo("chr2", 60, 1)}
    records = bedio.read(f"{ONT_TD}/FillSpace.Input.bed")
    out = str(tmp_path / "out.bed")
    bedio.write(out, fill_space_no_hidden_value(records, genome))
    assert fileio.are_equal(out, f"{ONT_TD}/FillSpace.Expected.bed")


def test_fill_space_hidden_golden(tmp_path):
    genome = {"chr1": chrom_info.ChromInfo("chr1", 600, 0),
              "chr2": chrom_info.ChromInfo("chr2", 60, 1)}
    records = bedio.read(f"{ONT_TD}/FillSpace.Hidden.Input.bed")
    out = str(tmp_path / "out.bed")
    bedio.write(out, fill_space_hidden_value(records, genome))
    assert fileio.are_equal(out, f"{ONT_TD}/FillSpace.Hidden.Expected.bed")


def test_fill_3d_space_golden():
    genes = [bedio.Bed("chr1", 2, 3, "first", 0),
             bedio.Bed("chr1", 13, 14, "second", 0),
             bedio.Bed("chr1", 500, 501, "third", 0),
             bedio.Bed("chr2", 10, 40, "fourth", 0)]
    contacts = [
        bedpeio.BedPe(bedio.Bed("chr1", 80, 81),
                      bedio.Bed("chr1", 300, 301)),
        bedpeio.BedPe(bedio.Bed("chr2", 0, 5), bedio.Bed("chr2", 85, 95)),
        bedpeio.BedPe(bedio.Bed("chr3", 0, 5), bedio.Bed("chr3", 85, 95)),
    ]
    sizes = {"chr1": chrom_info.ChromInfo("chr1", 600, 0),
             "chr2": chrom_info.ChromInfo("chr2", 100, 1)}
    answer = fill_3d_space(contacts, genes, sizes)
    expected = bedio.read(f"{ONT_TD}/expected.fill3dSpace.bed")
    got = [(b.chrom, b.chrom_start, b.chrom_end)
           for b in answer]
    want = [(b.chrom, b.chrom_start, b.chrom_end) for b in expected]
    assert got == want
    assert [b.name for b in answer] == [b.name for b in expected]
