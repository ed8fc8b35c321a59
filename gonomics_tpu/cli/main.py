"""gonomics — umbrella command dispatcher (reference: cmd/gonomics).

`gonomics <tool> [args...]` runs the named tool; `gonomics` alone lists
what's available. The reference shells out to per-tool binaries via an
embedded command cache (cmd/gonomics/gonomics.go:201); here tools are
Python entry points dispatched in-process.
"""

from __future__ import annotations

import sys

COMMANDS = {
    "globalAlignment": ("gonomics_tpu.cli.global_alignment",
                        "Align 2 single-record fasta files"),
    "faFindFast": ("gonomics_tpu.cli.fa_find_fast",
                   "Sliding-window divergence between two sequences"),
    "faFormat": ("gonomics_tpu.cli.fa_format", "Reformat fasta records"),
    "gsw": ("gonomics_tpu.cli.gsw_cmd",
            "Graph-Smith-Waterman read aligner (host or TPU engine)"),
    "callVariants": ("gonomics_tpu.cli.call_variants",
                     "Joint variant caller over experimental+normal samples"),
    "samConsensus": ("gonomics_tpu.cli.sam_consensus",
                     "Consensus fasta from a sam/bam over a reference"),
    "pileup": ("gonomics_tpu.cli.pileup_cmd",
               "Count bases from sequencing data"),
    "reconstructSeq": ("gonomics_tpu.cli.reconstruct_seq",
                       "Ancestral sequence reconstruction"),
    "bedMerge": ("gonomics_tpu.cli.bed_merge",
                 "Combine overlapping bed entries"),
    "bedToWig": ("gonomics_tpu.cli.bed_to_wig", "Convert bed values to wig"),
    "intervalOverlap": ("gonomics_tpu.cli.interval_overlap",
                        "Find non/overlapping genomic regions"),
    "mergesort": ("gonomics_tpu.cli.mergesort",
                  "External merge sort of genomic records"),
    "multiFaToVcf": ("gonomics_tpu.cli.multi_fa_to_vcf",
                     "VCF from a pairwise multiFa alignment"),
    "simulateSam": ("gonomics_tpu.cli.simulate_sam",
                    "Simulate Illumina paired reads from a reference"),
    "faFilter": ("gonomics_tpu.cli.fa_filter",
                 "Filter fasta records by name/size/GC/range"),
    "samToBed": ("gonomics_tpu.cli.sam_to_bed",
                 "Aligned read positions as bed records"),
    "bedFilter": ("gonomics_tpu.cli.bed_filter",
                  "Filter bed records by score/length/position/name"),
    "bedToFasta": ("gonomics_tpu.cli.bed_to_fasta",
                   "Extract fasta subsequences for bed regions"),
    "liftCoordinates": ("gonomics_tpu.cli.lift_coordinates",
                        "Lift bed/vcf between assemblies via chains"),
    "vcfFormat": ("gonomics_tpu.cli.vcf_format",
                  "Options alter VCF formatting"),
    "vcfToFa": ("gonomics_tpu.cli.vcf_to_fa",
                "Edit a reference fasta with vcf variant data"),
    "wigTools": ("gonomics_tpu.cli.wig_tools",
                 "Wig manipulation: peaks/filter/math/stats/trainingSet"),
    "statCalc": ("gonomics_tpu.cli.stat_calc",
                 "Command line statistics calculator"),
    "vcfFilter": ("gonomics_tpu.cli.vcf_filter",
                  "Filter vcf records"),
    "bedpeFilter": ("gonomics_tpu.cli.bedpe_filter",
                    "Filter bedpe contacts"),
    "bedpeOverlap": ("gonomics_tpu.cli.bedpe_overlap",
                     "Filter bedpe entries by select-file overlap"),
    "bedGraphToWig": ("gonomics_tpu.cli.bed_graph_to_wig",
                      "Convert bedGraph to wig"),
    "assemblyStats": ("gonomics_tpu.cli.assembly_stats",
                      "Scaffold/contig N50 statistics"),
    "faInfo": ("gonomics_tpu.cli.fa_info", "Per-record fasta base counts"),
    "faUniq": ("gonomics_tpu.cli.fa_uniq",
               "Pull unique sequences from a fasta"),
    "catMultiFa": ("gonomics_tpu.cli.cat_multi_fa",
                   "Concatenate multiFa alignments by sequence"),
    "multiFaCount": ("gonomics_tpu.cli.multi_fa_count",
                     "Count present bases in multiFa sequences"),
    "multiFaExtract": ("gonomics_tpu.cli.multi_fa_extract",
                       "Pull sub-sequence from a multiFa alignment"),
    "multiFaReduce": ("gonomics_tpu.cli.multi_fa_reduce",
                      "Keep only variable multiFa columns"),
    "mergeMultiFa": ("gonomics_tpu.cli.merge_multi_fa",
                     "Merge two multiFa files on a shared reference"),
    "multiFaSequenceSwap": ("gonomics_tpu.cli.multi_fa_sequence_swap",
                            "Swap bed regions between multiFa sequences"),
    "faBin": ("gonomics_tpu.cli.fa_bin",
              "Bin fasta records into grouped files"),
    "randSeq": ("gonomics_tpu.cli.rand_seq",
                "Generate pseudorandom DNA fasta"),
    "locateCG": ("gonomics_tpu.cli.locate_cg",
                 "Locate/compare CpG sites"),
    "countPairOfBases": ("gonomics_tpu.cli.count_pair_of_bases",
                         "Count base pairs in sequences or bed regions"),
    "bedFormat": ("gonomics_tpu.cli.bed_format",
                  "Options alter bed formatting"),
    "bedMath": ("gonomics_tpu.cli.bed_math",
                "Arithmetic on float values in bed files"),
    "bedSplit": ("gonomics_tpu.cli.bed_split",
                 "Partition a bed by name or chrom"),
    "bedShear": ("gonomics_tpu.cli.bed_shear",
                 "Split bed entries into fragments"),
    "bedSimilarity": ("gonomics_tpu.cli.bed_similarity",
                      "Overlap-proportion statistics between bed files"),
    "bedOverlapByWindow": ("gonomics_tpu.cli.bed_overlap_by_window",
                           "Count bp in bed regions per window"),
    "bedDistanceFromChrEnds": (
        "gonomics_tpu.cli.bed_distance_from_chr_ends",
        "Score = min distance to chromosome end"),
    "bedMinimumDistanceName": (
        "gonomics_tpu.cli.bed_minimum_distance_name",
        "Min distance between name-matched beds"),
    "bedValueWig": ("gonomics_tpu.cli.bed_value_wig",
                    "Annotate beds with wig max/min/average"),
    "bedToAminoAcid": ("gonomics_tpu.cli.bed_to_amino_acid",
                       "Translate bed-region DNA to amino acids"),
    "cigarToBed": ("gonomics_tpu.cli.cigar_to_bed",
                   "Affine-gap align two fastas, emit indel beds"),
    "digestGenome": ("gonomics_tpu.cli.digest_genome",
                     "Restriction-fragment bed from fasta + motif"),
    "fastqFilter": ("gonomics_tpu.cli.fastq_filter",
                    "Filter fastq records"),
    "fastqFormat": ("gonomics_tpu.cli.fastq_format",
                    "10x single-cell renaming of paired reads"),
    "fastqReplaceSeq": ("gonomics_tpu.cli.fastq_replace_seq",
                        "Prefix find-and-replace in fastq sequences"),
    "mafFilter": ("gonomics_tpu.cli.maf_tools:main_filter",
                  "Filter maf blocks by score threshold"),
    "mafToBed": ("gonomics_tpu.cli.maf_tools:main_to_bed",
                 "Maf blocks to reference-species bed"),
    "mafToMultiFa": ("gonomics_tpu.cli.maf_tools:main_to_multi_fa",
                     "Maf alignment to multi-fasta"),
    "mafIndels": ("gonomics_tpu.cli.maf_tools:main_indels",
                  "Insertions/deletions from pairwise maf e-lines"),
    "gtfTools": ("gonomics_tpu.cli.gtf_tools",
                 "GTF filter/toBed subcommands"),
    "getPromoter": ("gonomics_tpu.cli.get_promoter",
                    "Promoter beds for a gene list"),
    "geneIdToName": ("gonomics_tpu.cli.gene_id_to_name",
                     "Replace gene IDs with names via a table"),
    "overlapEnrichments": ("gonomics_tpu.cli.overlap_enrichments",
                           "Enrichment/depletion p-values for overlaps"),
    "vcfInfo": ("gonomics_tpu.cli.vcf_info",
                "VCF summary statistics (types/divergence/context)"),
    "sampleVcf": ("gonomics_tpu.cli.vcf_sampling:main_sample",
                  "Random sample of VCF variants/samples"),
    "proximityBlockVcf": ("gonomics_tpu.cli.vcf_sampling:main_proximity",
                          "Distance-blocked variant sampling"),
    "filterGenotypes": (
        "gonomics_tpu.cli.vcf_sampling:main_filter_genotypes",
        "Allele-specific genotype filter / sample subsetting"),
    "vcfAncestorAnnotation": (
        "gonomics_tpu.cli.vcf_sampling:main_ancestor",
        "Add ancestral alleles to VCF INFO"),
    "vcfAfs": ("gonomics_tpu.cli.vcf_sampling:main_afs",
               "Allele frequency spectrum from a VCF"),
    "haplotypeGenerator": ("gonomics_tpu.cli.vcf_sampling:main_haplotype",
                           "Per-sample haplotype fastas for regions"),
    "selectionMle": ("gonomics_tpu.cli.popgen_tools:main_mle",
                     "MLE of selection from a VCF AFS"),
    "selectionMcmc": ("gonomics_tpu.cli.popgen_tools:main_mcmc",
                      "MCMC posterior for selection parameters"),
    "dunnIndex": ("gonomics_tpu.cli.popgen_tools:main_dunn",
                  "Dunn index per bed region of a multiFa"),
    "mcmcTraceStats": ("gonomics_tpu.cli.popgen_tools:main_trace_stats",
                       "Summary statistics on an MCMC trace"),
    "simulateWrightFisher": (
        "gonomics_tpu.cli.popgen_tools:main_wright_fisher",
        "Multiallelic Wright-Fisher simulation"),
    "oboTools": ("gonomics_tpu.cli.ontology_tools:main_obo_tools",
                 "OBO manipulation (mapping subcommand)"),
    "gafFilter": ("gonomics_tpu.cli.ontology_tools:main_gaf_filter",
                  "Filter GAF annotation records"),
    "ontologyEnrichment": (
        "gonomics_tpu.cli.ontology_tools:main_ontology_enrichment",
        "GREAT-style GO-term enrichment over 1D/3D space"),
    "bedCountBam": ("gonomics_tpu.cli.bed_count_bam",
                    "Read counts for bed regions from an indexed bam"),
    "samInfo": ("gonomics_tpu.cli.sam_info",
                "SAM/BAM statistics (readLength/coverage/mapq)"),
    "samToWig": ("gonomics_tpu.cli.sam_to_wig",
                 "Read coverage as wig"),
    "simulateBed": ("gonomics_tpu.cli.simulate_tools:main_bed",
                    "Random bed regions within a search space"),
    "simulateVcf": ("gonomics_tpu.cli.simulate_tools:main_vcf",
                    "Simulated VCF variants from an AFS"),
    "simulateDivergentWindowsVcf": (
        "gonomics_tpu.cli.simulate_tools:main_divergent_windows",
        "Upper/lower divergence-percentile VCF windows"),
    "simulatePcr": ("gonomics_tpu.cli.simulate_tools:main_pcr",
                    "Predict PCR amplicon products"),
    "multiFaAcceleration": ("gonomics_tpu.cli.multi_fa_acceleration",
                            "Windowed velocity/acceleration scores"),
    "branchLengthsMultiFaBed": (
        "gonomics_tpu.cli.branch_lengths_multi_fa_bed",
        "Fitch-Margoliash branch lengths per bed region"),
}


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("gonomics_tpu — TPU-native sequence analysis\n\nCommands:")
        for name, (_, desc) in sorted(COMMANDS.items()):
            print(f"  {name:18s} {desc}")
        return
    cmd = argv[0]
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command: {cmd} (run 'gonomics help')")
    import importlib

    target = COMMANDS[cmd][0]
    mod_name, _, fn_name = target.partition(":")
    mod = importlib.import_module(mod_name)
    getattr(mod, fn_name or "main")(argv[1:])


if __name__ == "__main__":
    main()
