"""Genomic record formats (reference L3: fasta, fastq, sam, vcf, bed, ...)."""
