"""vcfWebAnnotate — annotate a VCF by querying CellBase REST
(reference: cmdx/vcfWebAnnotate.go, jsonSchema.go). hg38/GRCh38 only.

The CellBase query is pluggable (`query_fn`) so the annotation machinery
runs offline in tests and behind firewalls; the default POSTs to the
reference's v4 endpoint."""

from __future__ import annotations

import argparse
import json
import sys

from .. import fileio
from ..io import vcf as vcfio

BASE_URL = ("http://bioinfo.hpc.cam.ac.uk/cellbase/webservices/rest/v4/"
            "hsapiens/genomic/variant/annotation?assembly=grch38")

_NO_DATA = object()


def _default_query(query: str) -> dict:
    import urllib.request

    req = urllib.request.Request(BASE_URL, data=query.encode(),
                                 headers={"Content-Type": "text/plain"})
    with urllib.request.urlopen(req) as resp:
        if resp.status != 200:
            raise SystemExit(f"{resp.status} {resp.reason}")
        return json.loads(resp.read())


def _get_max_pop_af(response: dict):
    """getMaxPopAf (vcfWebAnnotate.go:150)."""
    max_af = -1.0
    for p in response.get("result", [{}])[0].get(
            "populationFrequencies", []) or []:
        if p.get("study", "") == "":
            return _NO_DATA
        max_af = max(max_af, p.get("altAlleleFreq", 0.0))
    if max_af == -1:
        return _NO_DATA
    return max_af


def _go_2g(x: float) -> str:
    """Go %.2g formatting."""
    return f"{x:.2g}"


def annotate_vcfs(vcfs, responses: dict) -> None:
    """annotateVcfs (vcfWebAnnotate.go:105)."""
    res = responses.get("response", [])
    for i, v in enumerate(vcfs):
        ann = []
        max_af = _get_max_pop_af(res[i])
        if max_af is not _NO_DATA:
            ann.append(f"MaxPopAF={_go_2g(max_af)}")
        results = res[i].get("result", [{}])
        consequences = results[0].get("consequenceTypes", []) or []
        if len(consequences) == 0:
            continue
        consequence = consequences[0]
        if results[0].get("displayConsequenceType", ""):
            ann.append(f"Consequence="
                       f"{results[0]['displayConsequenceType']}")
        if consequence.get("geneName", ""):
            ann.append(f"Gene={consequence['geneName']}")
        if consequence.get("ensemblTranscriptId", ""):
            ann.append(f"Transcript={consequence['ensemblTranscriptId']}")
        prot = consequence.get("proteinVariantAnnotation", {}) or {}
        if prot.get("reference", ""):
            ann.append(f"ProteinEffect={prot['reference']}"
                       f"{prot.get('position', 0)}"
                       f"{prot.get('alternate', '')}")
        if v.info == ".":
            v.info = ";".join(ann)
        else:
            v.info += ";" + ";".join(ann)


def add_annotation_header(header: vcfio.Header) -> vcfio.Header:
    """addAnnotationHeader (vcfWebAnnotate.go:166): INFO lines inserted
    before the first ##contig line."""
    insert = 0
    for insert, line in enumerate(header.text):
        if line.startswith("##contig"):
            break
    saved = header.text[insert:]
    new = header.text[:insert]
    src = ('Source="bioinfo.hpc.cam.ac.uk/cellbase/webservices",'
           'Version="v4"')
    new.append(f'##INFO=<ID=MaxPopAF,Number=1,Type=Float,Description='
               f'"Maximum allele frequency of any population in '
               f'CellBase",{src}>')
    new.append(f'##INFO=<ID=Consequence,Number=1,Type=String,Description='
               f'"Variant consequence",{src}>')
    new.append(f'##INFO=<ID=Gene,Number=1,Type=String,Description='
               f'"Nearest gene",{src}>')
    new.append(f'##INFO=<ID=Transcript,Number=1,Type=String,Description='
               f'"Ensembl transcript id",{src}>')
    new.append(f'##INFO=<ID=ProteinEffect,Number=1,Type=String,'
               f'Description="Effect of variant on protein",{src}>')
    new.extend(saved)
    header.text = new
    return header


def vcf_web_annotate(in_vcf: str, out_file: str, batch_size: int = 1000,
                     query_fn=None) -> None:
    """vcfWebAnnotate (vcfWebAnnotate.go:36), batched queries."""
    if query_fn is None:
        query_fn = _default_query
    vcfs, header = vcfio.read(in_vcf)
    header = add_annotation_header(header)
    with fileio.easy_create(out_file) as out:
        vcfio.new_write_header(out, header)
        for start in range(0, len(vcfs), batch_size):
            batch = vcfs[start:start + batch_size]
            query = ",".join(f"{v.chrom}:{v.pos}:{v.ref}:{v.alt[0]}"
                             for v in batch)
            responses = query_fn(query)
            annotate_vcfs(batch, responses)
            for v in batch:
                vcfio.write_vcf(out, v)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="vcfWebAnnotate")
    p.add_argument("vcf")
    p.add_argument("-o", default="stdout")
    p.add_argument("-batchSize", type=int, default=1000)
    a = p.parse_args(argv if argv is not None else sys.argv[1:])
    vcf_web_annotate(a.vcf, "-" if a.o == "stdout" else a.o, a.batchSize)


if __name__ == "__main__":
    main()
