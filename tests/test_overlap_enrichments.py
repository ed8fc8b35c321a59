"""overlapEnrichments goldens (reference cmd test table; expected files
record testdata-relative input paths, so tests chdir to the reference
command directory and write output to tmp)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.overlap_enrichments import overlap_enrichments

TD = "/root/reference/cmd/overlapEnrichments"

CASES = [
    ("exact", "testdata/elements2.bed", False, "",
     "within", "testdata/elements1.elements2.enrichment.txt"),
    ("exact", "testdata/elements1.bed", False, "",
     "within", "testdata/elements1.elements1.enrichment.txt"),
    ("exact", "testdata/elements2.bed", True, "",
     "within", "testdata/elements1.elements2.enrichment.txt"),
    ("exact", "testdata/elements3.bed", True, "",
     "within", "testdata/elements1.elements3.enrichment.txt"),
    ("exact", "testdata/elements1.bed", True, "testdata/listOfFiles.txt",
     "within", "testdata/expected.listOfFiles.txt"),
    ("exact", "testdata/elements3.bed", True, "",
     "any", "testdata/elements1.elements3.enrichment.any.txt"),
]


@pytest.mark.parametrize("method,e2,trim,file_list,rel,expected", CASES,
                         ids=[c[-1].split("/")[-1] + c[4] for c in CASES])
def test_overlap_enrichments(tmp_path, monkeypatch, method, e2, trim,
                             file_list, rel, expected):
    monkeypatch.chdir(TD)
    out = str(tmp_path / "out.txt")
    overlap_enrichments(method, "testdata/elements1.bed", e2,
                        "testdata/tinyNoGap.bed", out,
                        trim_to_search_space=trim,
                        second_file_list=file_list, relationship=rel)
    assert fileio.are_equal(out, f"{TD}/{expected}")
