"""FASTA reading/writing and multiFa alignment coordinate math.

Counterpart of /root/reference/fasta/fasta.go and multiFa.go. Sequences are
int8 code arrays (see gonomics_tpu.dna); parsing is line-batched.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import IO, Iterator

import numpy as np

from .. import dna
from .. import fileio


@dataclass
class Fasta:
    """fasta.Fasta (fasta/fasta.go:18-21)."""

    name: str
    seq: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int8))

    def __eq__(self, other) -> bool:  # fasta/compare.go IsEqual
        return (
            isinstance(other, Fasta)
            and self.name == other.name
            and len(self.seq) == len(other.seq)
            and bool((np.asarray(self.seq) == np.asarray(other.seq)).all())
        )


def _parse(f: IO[str], conv) -> Iterator[Fasta]:
    name: str | None = None
    chunks: list[np.ndarray] = []
    for line in fileio.real_lines(f):
        if line.startswith(">"):
            if name is not None:
                yield Fasta(name, _concat(chunks))
            name = line[1:]
            chunks = []
        elif line:
            if name is None:
                raise ValueError("fasta record missing a sequence name (e.g. >chr1)")
            chunks.append(conv(line))
    if name is not None:
        yield Fasta(name, _concat(chunks))


def _concat(chunks: list[np.ndarray]) -> np.ndarray:
    if not chunks:
        return np.zeros(0, dtype=np.int8)
    return np.concatenate(chunks)


def read(filename: str) -> list[Fasta]:
    """fasta.Read (fasta/fasta.go:31): names must be unique."""
    with fileio.easy_open(filename) as f:
        records = list(_parse(f, dna.from_string))
    names = [r.name for r in records]
    if len(set(names)) != len(names):
        raise ValueError("fasta record names must be unique")
    return records


def read_forced(filename: str) -> list[Fasta]:
    """fasta.ReadForced: invalid characters masked to N."""
    with fileio.easy_open(filename) as f:
        return list(_parse(f, dna.from_string_forced))


def to_map(records: list[Fasta]) -> dict[str, np.ndarray]:
    m: dict[str, np.ndarray] = {}
    for r in records:
        if r.name in m:
            raise ValueError(f"{r.name} used for multiple fasta records")
        m[r.name] = r.seq
    return m


def read_to_map(filename: str) -> dict[str, np.ndarray]:
    return to_map(read(filename))


def write_fasta(f: IO[str], rec: Fasta, line_length: int = 50) -> None:
    """fasta.WriteFasta (fasta/fasta.go:167): 50-char wrapped lines."""
    f.write(f">{rec.name}\n")
    s = np.asarray(rec.seq)
    for i in range(0, len(s), line_length):
        f.write(dna.to_string(s[i:i + line_length]))
        f.write("\n")


def write(filename: str, records: list[Fasta], line_length: int = 50) -> None:
    with fileio.easy_create(filename) as f:
        for rec in records:
            write_fasta(f, rec, line_length)


# ---------------------------------------------------------------------------
# multiFa alignment coordinate math (fasta/multiFa.go:10-94)
# ---------------------------------------------------------------------------

def ref_pos_to_aln_pos(record: Fasta, ref_pos: int) -> int:
    """RefPosToAlnPos (multiFa.go:10). Vectorized equivalent of the
    reference loop: scans columns alnStart+1.., counting non-gap columns,
    and returns the column where the count reaches ref_pos."""
    return ref_pos_to_aln_pos_counter(record, ref_pos, 0, 0)


def ref_pos_to_aln_pos_counter(record: Fasta, ref_pos: int,
                               ref_start: int, aln_start: int) -> int:
    """RefPosToAlnPosCounter (multiFa.go:24)."""
    if ref_start > ref_pos:
        raise ValueError("refStart > RefPos")
    if ref_start == ref_pos:
        return aln_start
    seq = np.asarray(record.seq)
    ng = np.cumsum(seq[aln_start + 1:] != dna.GAP)
    idx = int(np.searchsorted(ng, ref_pos - ref_start, side="left"))
    if idx >= len(ng):
        raise IndexError("Ran out of chromosome.")
    return aln_start + 1 + idx


def aln_pos_to_ref_pos(record: Fasta, aln_pos: int) -> int:
    """AlnPosToRefPos (multiFa.go:84): counts non-gap columns in
    seq[:aln_pos] (reference position of the base at that column)."""
    return aln_pos_to_ref_pos_counter(record, aln_pos, 0, 0)


def aln_pos_to_ref_pos_counter(record: Fasta, aln_pos: int,
                               ref_start: int, aln_start: int) -> int:
    """AlnPosToRefPosCounter (multiFa.go:89-107), literal semantics."""
    seq = np.asarray(record.seq)
    if aln_start > aln_pos:
        ref_start, aln_start = 0, 0
    if aln_pos > len(seq):
        raise IndexError("Ran out of chromosome.")
    return ref_start + int((seq[aln_start:aln_pos] != dna.GAP).sum())


def segregating_sites(records: list[Fasta]) -> list[int]:
    """SegregatingSites (multiFa.go:179): columns where sequences differ
    (gaps count as differences; columns with N in any sequence skipped)."""
    if not records:
        return []
    mat = np.stack([np.asarray(r.seq) for r in records])
    has_n = (dna.to_upper(mat) == dna.N).any(axis=0)
    differs = (mat != mat[0]).any(axis=0)
    return [int(i) for i in np.nonzero(differs & ~has_n)[0]]


# --- assembly statistics (reference: fasta/assemblyStats.go) ---

def make_contig_list(records: list[Fasta], count_lower_as_gaps: bool):
    """MakeContigList (assemblyStats.go:62): contig lengths split on N
    (and lowercase when countLowerAsGaps)."""
    out: list[int] = []
    for rec in records:
        seq = np.asarray(rec.seq)
        is_gap = seq == dna.N
        if count_lower_as_gaps:
            is_gap |= (seq >= dna.LOWER_A) & (seq <= dna.LOWER_N)
        run = 0
        for g in is_gap:
            if g:
                if run:
                    out.append(run)
                run = 0
            else:
                run += 1
        if run:
            out.append(run)
    return out


def calculate_n50_l50(sorted_contigs: list[int], half_genome: int):
    """CalculateN50L50 (assemblyStats.go:44)."""
    total = 0
    l50 = 0
    for i in range(len(sorted_contigs) - 1, -1, -1):
        l50 += 1
        total += sorted_contigs[i]
        if total >= half_genome:
            return sorted_contigs[i], l50
    raise ValueError("unable to calculate N50/L50")


def assembly_stats(infile: str, count_lower_as_gaps: bool):
    """AssemblyStats (assemblyStats.go:15): returns (N50, L50,
    halfGenome, genomeLength, largestContig, numContigs)."""
    contigs = make_contig_list(read(infile), count_lower_as_gaps)
    if not contigs:
        raise ValueError("contig list is empty")
    genome_length = sum(contigs)
    contigs.sort()
    half = genome_length // 2
    n50, l50 = calculate_n50_l50(contigs, half)
    return n50, l50, half, genome_length, contigs[-1], len(contigs)


def write_assembly_stats(name: str, outfile: str, n50: int, l50: int,
                         half: int, genome_length: int, largest: int,
                         num_contigs: int) -> None:
    """WriteAssemblyStats (assemblyStats.go:110)."""
    with fileio.easy_create(outfile) as f:
        f.write(f"Assembly Name: {name}\n")
        f.write(f"halfGenome: {half}\n")
        f.write(f"genomeLength: {genome_length}\n")
        f.write(f"Number of contigs: {num_contigs}\n")
        f.write(f"Largest Contig: {largest}\n")
        f.write(f"N50: {n50}\n")
        f.write(f"L50: {l50}\n")


# --- multiFa scan/extract helpers (reference: fasta/multiFa.go, modify.go,
#     fasta.go:184, faBin.go) ---

def copy(rec: Fasta) -> Fasta:
    """fasta.Copy (modify.go:55)."""
    return Fasta(rec.name, np.array(rec.seq, dtype=np.int8, copy=True))


def empty_copy(records: list[Fasta]) -> list[Fasta]:
    """fasta.EmptyCopy (multiFa.go:169)."""
    return [Fasta(r.name, np.zeros(0, np.int8)) for r in records]


def extract(rec: Fasta, start: int, end: int, name: str) -> Fasta:
    """fasta.Extract (fasta.go:184)."""
    return Fasta(name, np.asarray(rec.seq)[start:end])


def remove_gaps(records: list[Fasta]) -> list[Fasta]:
    """fasta.RemoveGaps (modify.go:15)."""
    for r in records:
        s = np.asarray(r.seq)
        r.seq = s[s != dna.GAP]
    return records


def find_sequence_index(records: list[Fasta], query_name: str) -> int:
    """findSequenceIndex (multiFa.go:441): unique-name lookup."""
    idx: dict[str, int] = {}
    for i, r in enumerate(records):
        if r.name in idx:
            raise ValueError(f"{r.name} used for multiple fasta records. "
                             "record names must be unique.")
        idx[r.name] = i
    if query_name not in idx:
        raise SystemExit(f"queryName {query_name} not found in fasta "
                         "records.")
    return idx[query_name]


def _present(seq: np.ndarray) -> np.ndarray:
    return np.asarray(seq) <= dna.T  # uppercase A,C,G,T codes are 0..3


def scan_n(records: list[Fasta], query_name: str) -> list[tuple[int, int]]:
    """fasta.ScanN (multiFa.go:353): positions of N in the query sequence,
    reported as 1-base [start,end) spans in reference (records[0])
    coordinates."""
    query = np.asarray(records[find_sequence_index(records, query_name)].seq)
    out: list[tuple[int, int]] = []
    last_ref = last_aln = 0
    for i in np.flatnonzero(query == dna.N):
        start = aln_pos_to_ref_pos_counter(records[0], int(i),
                                           last_ref, last_aln)
        last_ref, last_aln = start, int(i)
        out.append((start, start + 1))
    return out


def scan_present_base(records: list[Fasta], query: str) -> int:
    """fasta.ScanPresentBase (multiFa.go:376)."""
    return int(_present(records[find_sequence_index(records, query)].seq)
               .sum())


def scan_present_base_both(records: list[Fasta], q1: str, q2: str) -> int:
    """fasta.ScanPresentBaseBoth (multiFa.go:394)."""
    a = _present(records[find_sequence_index(records, q1)].seq)
    b = _present(records[find_sequence_index(records, q2)].seq)
    return int((a & b).sum())


def scan_present_base_either(records: list[Fasta], q1: str, q2: str,
                             q3: str) -> int:
    """fasta.ScanPresentBaseEither (multiFa.go:415)."""
    a = _present(records[find_sequence_index(records, q1)].seq)
    b = _present(records[find_sequence_index(records, q2)].seq)
    c = _present(records[find_sequence_index(records, q3)].seq)
    return int((a | b | c).sum())


def segregating_columns(records: list[Fasta]) -> np.ndarray:
    """Column indices where fasta.IsSegregating (multiFa.go:179) is true
    (any base differs from the first sequence, gaps and N included)."""
    mat = np.stack([np.asarray(r.seq) for r in records])
    return np.nonzero((mat != mat[0]).any(axis=0))[0]


def segregating_sites_fasta(records: list[Fasta]) -> list[Fasta]:
    """fasta.SegregatingSites (multiFa.go:211): only variable columns."""
    cols = segregating_columns(records)
    return [Fasta(r.name, np.asarray(r.seq)[cols]) for r in records]


def bin_genome_no_breaks(genome: list[Fasta], bin_num: int,
                         min_size: int) -> dict[int, list[Fasta]]:
    """fasta.BinGenomeNoBreaks (faBin.go:17): whole records into bins."""
    bins: dict[int, list[Fasta]] = {}
    if min_size != -1:
        for j, rec in enumerate(genome):
            if not bins:
                bins[0] = [rec]
            elif len(rec.seq) > min_size:
                bins[len(bins)] = [rec]
            else:
                k = -1  # findBinBelowMin: LAST bin below min (faBin.go:108)
                for i in range(len(bins)):
                    if sum(len(f.seq) for f in bins[i]) < min_size:
                        k = i
                if k < 0 and j + 1 == len(genome):
                    bins[len(bins) - 1].append(rec)  # faBin.go:90
                elif k < 0:
                    bins[len(bins)] = [rec]
                else:
                    bins[k].append(rec)
        return bins
    if len(genome) < bin_num:
        raise SystemExit("Number of bins is greater than the number of "
                         "contigs in the given genome. Reduce bin number.")
    for n in range(bin_num):
        bins[n] = [genome[n]]
    for rec in genome[bin_num:]:  # fillSmallestBin (faBin.go:40)
        sizes = {i: sum(len(f.seq) for f in bins[i]) for i in bins}
        smallest, size_smallest = 0, 0
        for i in range(len(bins)):
            if sizes[i] < size_smallest:
                smallest, size_smallest = i, sizes[i]
            elif size_smallest == 0:
                size_smallest = sizes[i]
        bins[smallest].append(rec)
    return bins


def copy_subset(records: list[Fasta], start: int, end: int) -> list[Fasta]:
    """fasta.CopySubset (multiFa.go:109)."""
    return [Fasta(r.name, np.array(np.asarray(r.seq)[start:end],
                                   copy=True)) for r in records]


def remove_missing_mult(records: list[Fasta]) -> list[Fasta]:
    """fasta.RemoveMissingMult (multiFa.go:121): drop all-gap entries."""
    return [r for r in records
            if len(r.seq) and bool((np.asarray(r.seq) != dna.GAP).any())]


def dist_column(records: list[Fasta]) -> list[Fasta]:
    """fasta.DistColumn (multiFa.go:140): columns with no gaps or
    lowercase bases in any sequence."""
    mat = np.stack([np.asarray(r.seq) for r in records])
    bad = (mat == dna.GAP) | ((mat >= dna.LOWER_A) & (mat <= dna.LOWER_N))
    keep = ~bad.any(axis=0)
    return [Fasta(r.name, mat[i][keep]) for i, r in enumerate(records)]


def num_segregating_sites(records: list[Fasta]) -> int:
    """fasta.NumSegregatingSites (multiFa.go:225)."""
    segregating = segregating_sites_fasta(records)
    return len(segregating[0].seq) if segregating else 0
