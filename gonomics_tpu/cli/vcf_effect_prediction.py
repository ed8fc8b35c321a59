"""vcfEffectPrediction — annotate VCF records with cDNA and protein
effect predictions (reference: cmdx/vcfEffectPrediction)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import dna, fileio
from ..io import fasta as fastaio, gtf as gtfio, gtf_variant, vcf as vcfio


def append_annotation_header(header: vcfio.Header) -> vcfio.Header:
    """AppendAnnotationHeader (vcfEffectPrediction.go:41). The reference
    appends its two lines with embedded newlines (double-spacing them in
    the output) — kept."""
    column_ids = ""
    if header.text and header.text[-1].startswith("#CHROM\t"):
        column_ids = header.text[-1]
        header.text = header.text[:-1]
    header.text.append("##GoEffectPrediction Version=1.0\n")
    header.text.append(
        '##INFO=<ID=GoEP,Number=.,Type=String,Description="Functional '
        'annotations: HGVS.g | Gene | TranscriptId : HGVS.c | HGVS.p | '
        'VariantType">\n')
    if column_ids:
        header.text.append(column_ids)
    return header


def vcf_effect_prediction(vcf_file: str, gtf_file: str, fasta_file: str,
                          out_file: str,
                          all_transcripts: bool = False) -> None:
    records = fastaio.read(fasta_file)
    for r in records:
        r.seq = dna.to_upper(r.seq).astype(np.int8)
    seq = {r.name: r.seq for r in records}
    genes = gtfio.read(gtf_file)
    tree = gtf_variant.genes_to_interval_tree(genes)
    vcfs, header = vcfio.read(vcf_file)
    header = append_annotation_header(header)
    with fileio.easy_create(out_file) as out:
        vcfio.new_write_header(out, header)
        for v in vcfs:
            variant = gtf_variant.vcf_to_variant(v, tree, seq,
                                                 all_transcripts)
            ann = gtf_variant.variant_to_annotation(variant, seq)
            v.info = v.info + ";" + ann
            vcfio.write_vcf(out, v)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="vcfEffectPrediction")
    p.add_argument("vcf")
    p.add_argument("out")
    p.add_argument("-fasta", required=True)
    p.add_argument("-gtf", required=True)
    p.add_argument("-allTranscripts", action="store_true")
    a = p.parse_args(argv if argv is not None else sys.argv[1:])
    vcf_effect_prediction(a.vcf, a.gtf, a.fasta, a.out, a.allTranscripts)


if __name__ == "__main__":
    main()
