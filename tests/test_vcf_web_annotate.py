"""vcfWebAnnotate offline machinery (reference cmdx/vcfWebAnnotate.go);
the CellBase query is stubbed (no egress on this machine — the reference
test likewise skips when the server is unreachable)."""

from gonomics_tpu.cli.vcf_web_annotate import (add_annotation_header,
                                               vcf_web_annotate)
from gonomics_tpu.io import vcf as vcfio

TD = "/root/reference/cmdx/testdata"


def _canned_response(n):
    return {"response": [
        {"result": [{
            "displayConsequenceType": "missense_variant",
            "consequenceTypes": [{
                "geneName": "GENE1",
                "ensemblTranscriptId": "ENST0001",
                "proteinVariantAnnotation": {
                    "position": 42, "reference": "LEU",
                    "alternate": "PRO"},
            }],
            "populationFrequencies": [
                {"study": "gnomAD", "population": "ALL",
                 "refAlleleFreq": 0.9875, "altAlleleFreq": 0.0125}],
        }]} for _ in range(n)]}


def test_vcf_web_annotate_offline(tmp_path):
    records, _ = vcfio.read(f"{TD}/short.vcf")
    out = tmp_path / "ann.vcf"
    vcf_web_annotate(f"{TD}/short.vcf", str(out), batch_size=200,
                     query_fn=lambda q: _canned_response(
                         q.count(",") + 1))
    got, header = vcfio.read(str(out))
    assert len(got) == len(records)
    assert any("MaxPopAF" in ln for ln in header.text)
    for v in got:
        assert "MaxPopAF=0.013" in v.info
        assert "Consequence=missense_variant" in v.info
        assert "Gene=GENE1" in v.info
        assert "Transcript=ENST0001" in v.info
        assert "ProteinEffect=LEU42PRO" in v.info


def test_add_annotation_header_insert_position():
    h = vcfio.Header(text=["##fileformat=VCFv4.2", "##contig=<ID=chr1>",
                           "#CHROM\tPOS"])
    out = add_annotation_header(h)
    contig_idx = out.text.index("##contig=<ID=chr1>")
    assert any("MaxPopAF" in ln for ln in out.text[:contig_idx])
