"""vcfEffectPrediction: annotation accuracy vs the dbSNP-derived truth in
gtf/testdata/test.vcf (reference cmdx/vcfEffectPrediction test: at most 7
known mismatches allowed)."""

import numpy as np

from gonomics_tpu import dna
from gonomics_tpu.io import fasta as fastaio, gtf as gtfio, gtf_variant, \
    vcf as vcfio

TD = "/root/reference/gtf/testdata"


def _assembled_chr7():
    # vcfEffectPrediction_test.go:24-34: stitch krit1 + cftr into chr7
    krit = fastaio.read(f"{TD}/krit1.fa")
    cftr = fastaio.read(f"{TD}/cftr.fa")
    seq = np.full(92198968, dna.N, np.int8)
    seq = np.concatenate([seq, krit[0].seq])
    seq = np.concatenate([seq, np.full(117480024 - 92246100, dna.N,
                                       np.int8)])
    seq = np.concatenate([seq, cftr[0].seq])
    return {"chr7": dna.to_upper(seq).astype(np.int8)}


def test_vcf_effect_prediction_accuracy():
    seq = _assembled_chr7()
    genes = gtfio.read(f"{TD}/test.gtf")
    tree = gtf_variant.genes_to_interval_tree(genes)
    vcfs, _ = vcfio.read(f"{TD}/test.vcf")

    error_count = 0
    checked = 0
    for v in vcfs:
        variant = gtf_variant.vcf_to_variant(v, tree, seq, False)
        ann = gtf_variant.variant_to_annotation(variant, seq)
        info = (v.info + ";" + ann).split(";")
        words = info[0].split("|")
        correct_cdna, correct_prot = words[0], words[1]
        new_words = info[1].split("|")
        out_cdna = new_words[2].split(":")[1]
        out_prot = new_words[3]
        if (out_cdna == correct_cdna and out_prot == correct_prot) or \
                correct_cdna.startswith("c.-") or \
                correct_cdna.startswith("c.*"):
            checked += 1
            continue
        checked += 1
        error_count += 1
    # the reference's own test tolerates up to 7 known mismatches
    assert error_count <= 7, error_count
    assert checked == len(vcfs)
