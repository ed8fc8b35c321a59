"""Data simulation: reads, sequences, evolution along trees.

Counterpart of /root/reference/simulate (sam.go, simulate.go,
nonCoding.go, bed.go, vcf.go). The reference pins Go's global PRNG for
reproducible goldens; this module uses numpy Generators with explicit
seeds — same determinism contract (fixed seed -> fixed output), different
stream. Read simulation follows IlluminaPairedSam's model: normal
fragment sizes around a uniform midpoint, soft-clipped template overruns,
binomial flat sequencing errors, proper pair flags.
"""

from __future__ import annotations

import numpy as np

from . import dna, fileio
from .io import cigar as samcigar
from .io import fasta as fastaio
from .io import sam as samio
from .io.cigar import CigarOp
from .phylo.etree import ETree, get_leaves


def rand_seq(rng: np.random.Generator, length: int,
             gc_content: float = 0.5) -> np.ndarray:
    """simulate.RandGene base model: GC split evenly between G/C."""
    p = np.array([(1 - gc_content) / 2, gc_content / 2, gc_content / 2,
                  (1 - gc_content) / 2])
    return rng.choice(4, size=length, p=p).astype(np.int8)


def mutate_seq(rng: np.random.Generator, seq: np.ndarray,
               branch_length: float) -> np.ndarray:
    """Jukes-Cantor-style substitution: each base mutates with probability
    branch_length to one of the other three (simulate.mutateBase model)."""
    seq = np.asarray(seq, np.int8).copy()
    mask = rng.random(len(seq)) < branch_length
    shifts = rng.integers(1, 4, mask.sum())
    seq[mask] = ((seq[mask] + shifts) % 4).astype(np.int8)
    return seq


def evolve_tree(root: ETree, rng: np.random.Generator,
                root_seq: np.ndarray) -> None:
    """Evolve a sequence down a tree (simulate.Simulate substitution-only
    path): each node's sequence mutates from its parent by branch length."""
    root.fasta = fastaio.Fasta(root.name or "root", root_seq.astype(np.int8))
    for child in (root.left, root.right):
        if child is None:
            continue
        child_seq = mutate_seq(rng, root_seq, child.branch_length)
        evolve_tree(child, rng, child_seq)


def _sequencing_errors(rng: np.random.Generator, seq: np.ndarray,
                       rate: float) -> np.ndarray:
    if rate <= 0:
        return seq
    n_err = rng.binomial(len(seq), rate)
    out = seq.copy()
    for _ in range(n_err):
        p = int(rng.integers(0, len(seq)))
        out[p] = (out[p] + int(rng.integers(1, 4))) % 4
    return out


def illumina_paired_sam(ref_name: str, ref: np.ndarray, num_pairs: int,
                        read_len: int, avg_fragment_size: int,
                        fragment_std: float, flat_error_rate: float,
                        rng: np.random.Generator) -> list[samio.Sam]:
    """simulate.IlluminaPairedSam (sam.go:22), own-PRNG variant. Returns
    the flattened fwd/rev records with proper pair flags."""
    if avg_fragment_size < read_len:
        raise ValueError("average fragment size is less than read length")
    out: list[samio.Sam] = []
    n = len(ref)
    i = 0
    while i < num_pairs:
        frag = max(read_len, int(rng.normal(avg_fragment_size,
                                            fragment_std)))
        midpoint = int(rng.integers(0, n))
        start = max(midpoint - frag // 2, 0)
        end = min(midpoint + frag // 2, n)
        if end - start < read_len:
            continue
        fragment = ref[start:end]
        # SAM SEQ is always reported on the forward reference strand,
        # including for flag-16 reads
        fwd_seq = _sequencing_errors(rng, fragment[:read_len].copy(),
                                     flat_error_rate)
        rev_seq = _sequencing_errors(rng, fragment[-read_len:].copy(),
                                     flat_error_rate)
        qual = "J" * read_len
        name = f"{ref_name}_Read:{i}"
        fwd = samio.Sam(qname=name, rname=ref_name, pos=start + 1, mapq=60,
                        cigar=[CigarOp(read_len, "M")], seq=fwd_seq,
                        qual=qual, rnext="=", tlen=end - start)
        rev = samio.Sam(qname=name, rname=ref_name,
                        pos=end - read_len + 1, mapq=60,
                        cigar=[CigarOp(read_len, "M")], seq=rev_seq,
                        qual=qual, rnext="=", tlen=-(end - start))
        fwd.flag = 1 | 2 | 32 | 64
        rev.flag = 1 | 2 | 16 | 128
        fwd.pnext = rev.pos
        rev.pnext = fwd.pos
        out.append(fwd)
        out.append(rev)
        i += 1
    return out


def simulate_sam(ref_file: str, out_file: str, *, num_pairs: int = 100,
                 read_len: int = 150, avg_fragment_size: int = 400,
                 fragment_std: float = 50.0, flat_error_rate: float = 0.0,
                 seed: int = 0) -> None:
    """cmd/simulateSam equivalent (text SAM output, coordinate order kept
    as generated like the reference)."""
    rng = np.random.default_rng(seed)
    records = fastaio.read(ref_file)
    header = samio.Header()
    header.text = ["@HD\tVN:1.6\tSO:unsorted"] + [
        f"@SQ\tSN:{r.name}\tLN:{len(r.seq)}" for r in records]
    sams: list[samio.Sam] = []
    for rec in records:
        sams.extend(illumina_paired_sam(
            rec.name, dna.to_upper(rec.seq).astype(np.int8), num_pairs,
            read_len, avg_fragment_size, fragment_std, flat_error_rate, rng))
    samio.write_sam(out_file, header, sams)
