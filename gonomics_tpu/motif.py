"""Transcription-factor motif matrices and genome scanning.

Counterpart of /root/reference/motif (motif.go, convert.go, match.go).
Matrices are (4, L) float64 numpy arrays (rows A,C,G,T). The genome scan
is a position-weight correlation: on TPU it runs as a one-hot matmul over
windows (scan_scores_jax) — the conv/matmul form of the reference's
k-mer-hash RapidMatch (match.go:61); on host it is the same einsum in
numpy. Score semantics match ScoreWindow (gaps skipped, N disqualifies).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from . import dna, fileio
from .io import bed as bedio
from .io import fasta as fastaio

FREQUENCY, PROBABILITY, WEIGHT = "Frequency", "Probability", "Weight"


@dataclass
class PositionMatrix:
    id: str = ""
    name: str = ""
    type: str = FREQUENCY
    mat: np.ndarray = field(default_factory=lambda: np.zeros((4, 0)))


def _fmt6g(x: float) -> str:
    return f"{x:.6g}"


def write_jaspar_record(f, m: PositionMatrix) -> None:
    """motif.WritePositionMatrixJaspar, byte-exact row formatting."""
    f.write(f">{m.id}\t{m.name}\n")
    rows = ["A\t[\t", "C [ ", "G [ ", "T [ "]
    for r in range(4):
        f.write(rows[r])
        for v in m.mat[r]:
            f.write(f"\t{_fmt6g(v)}")
        f.write("\t]\n")


def write_jaspar(filename: str, records: list[PositionMatrix]) -> None:
    """motif.WriteJaspar (motif.go:34)."""
    with fileio.easy_create(filename) as f:
        for m in records:
            write_jaspar_record(f, m)


def read_jaspar(filename: str, type_: str) -> list[PositionMatrix]:
    lines = [ln for ln in fileio.read(filename) if ln]
    if len(lines) % 5:
        raise ValueError("JASPAR file line count must be a multiple of 5")
    out = []
    seen = set()
    for i in range(0, len(lines), 5):
        header = lines[i]
        if not header.startswith(">"):
            raise ValueError("Pfm header line must begin with '>'")
        fields = header[1:].split()
        pm = PositionMatrix(id=fields[0],
                            name=fields[1] if len(fields) > 1 else "",
                            type=type_)
        if pm.id in seen:
            raise ValueError(f"duplicate motif ID {pm.id}")
        seen.add(pm.id)
        rows = []
        for line in lines[i + 1:i + 5]:
            vals = line.replace("[", " ").replace("]", " ").split()[1:]
            rows.append([float(v) for v in vals])
        pm.mat = np.array(rows, np.float64)
        out.append(pm)
    return out


def pfm_to_ppm(pm: PositionMatrix, pseudocount: float) -> PositionMatrix:
    """motif.PfmToPpm (convert.go:15), column-sum order preserved."""
    if pm.type != FREQUENCY:
        raise ValueError("input must be a Frequency matrix")
    mat = pm.mat
    out = np.empty_like(mat)
    for c in range(mat.shape[1]):
        col_sum = mat[0, c] + mat[1, c] + mat[2, c] + mat[3, c] \
            + pseudocount * 4
        for r in range(4):
            out[r, c] = (mat[r, c] + pseudocount) / col_sum
    return PositionMatrix(pm.id, pm.name, PROBABILITY, out)


def ppm_to_pwm(pm: PositionMatrix, gc_content: float) -> PositionMatrix:
    if pm.type != PROBABILITY:
        raise ValueError("input must be a Probability matrix")
    from .numbers.gomath import go_log2

    p_gc = gc_content / 2.0
    p_at = (1 - gc_content) / 2.0
    out = np.empty_like(pm.mat)
    # scalar go_log2 keeps last-ulp parity with Go math.Log2 (convert.go:55)
    for c in range(pm.mat.shape[1]):
        out[0, c] = go_log2(pm.mat[0, c] / p_at)
        out[1, c] = go_log2(pm.mat[1, c] / p_gc)
        out[2, c] = go_log2(pm.mat[2, c] / p_gc)
        out[3, c] = go_log2(pm.mat[3, c] / p_at)
    return PositionMatrix(pm.id, pm.name, WEIGHT, out)


def pwm_to_ppm(pm: PositionMatrix) -> PositionMatrix:
    if pm.type != WEIGHT:
        raise ValueError("input must be a Weight matrix")
    out = np.power(2.0, pm.mat) / 4.0
    return PositionMatrix(pm.id, pm.name, PROBABILITY, out)


def consensus_sequence(pm: PositionMatrix) -> fastaio.Fasta:
    """Deterministic consensus (reference tieBreak randomness omitted;
    first max wins like its tieBreak=false path)."""
    return fastaio.Fasta(pm.name, np.argmax(pm.mat, axis=0).astype(np.int8))


def reverse_complement(pm: PositionMatrix) -> PositionMatrix:
    mat = pm.mat[::-1, ::-1].copy()
    return PositionMatrix(pm.id, pm.name, pm.type, mat)


def score_window(pm: PositionMatrix, seq: np.ndarray, aln_start: int):
    """motif.ScoreWindow (match.go:19): (score, end_pos, ok). Gaps are
    skipped without advancing the motif; N disqualifies the window."""
    pos = aln_start
    score = 0.0
    motif_pos = 0
    L = pm.mat.shape[1]
    while motif_pos < L:
        if pos >= len(seq):
            return -1.0, -1, False
        b = int(seq[pos])
        if b == dna.GAP:
            pass
        elif b <= dna.T:
            score += pm.mat[b][motif_pos]
            motif_pos += 1
        elif b == dna.N:
            return -1.0, -1, False
        else:
            raise ValueError("unrecognized base in score_window")
        pos += 1
    return score, pos, True


def scan_scores(pm: PositionMatrix, seq: np.ndarray) -> np.ndarray:
    """All window scores of an ungapped sequence (windows containing
    non-ACGT get -inf). Host einsum; same math as the TPU path."""
    L = pm.mat.shape[1]
    s = np.asarray(seq, np.int64)
    n = len(s) - L + 1
    if n <= 0:
        return np.zeros(0)
    onehot = np.zeros((len(s), 4), np.float64)
    ok = s < 4
    onehot[np.arange(len(s))[ok], s[ok]] = 1.0
    per_pos = onehot @ pm.mat  # (len, L): score of base i at motif col j
    scores = np.zeros(n)
    for j in range(L):
        scores += per_pos[j:j + n, j]
    bad = ~np.lib.stride_tricks.sliding_window_view(ok, L).all(axis=1)
    scores[bad] = -np.inf
    return scores


def scan_scores_jax(pm: PositionMatrix, seq, interpret: bool = False):
    """TPU scan: one-hot (L,4) fed through lax.conv (MXU). Returns a jnp
    array of window scores."""
    import jax.numpy as jnp
    from jax import lax

    L = pm.mat.shape[1]
    s = jnp.asarray(seq, jnp.int32)
    onehot = jnp.where((s[:, None] == jnp.arange(4)[None, :]), 1.0, 0.0)
    x = onehot.T[None, :, :]                      # (1, 4, len)
    w = jnp.asarray(pm.mat, jnp.float32)[None, :, :]  # (1, 4, L)
    res = lax.conv_general_dilated(
        x.astype(jnp.float32), w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    scores = res[0, 0]
    bad = lax.conv_general_dilated(
        (s[None, None, :] >= 4).astype(jnp.float32),
        jnp.ones((1, 1, L), jnp.float32), (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))[0, 0]
    return jnp.where(bad > 0, -jnp.inf, scores)


# ---------------------------------------------------------------------------
# RapidMatch / MatchComp — faithful ports of the k-mer-hash scanner
# (reference: motif/match.go, motif/matchComp.go). The scan mechanics are
# replicated exactly, including the reference's quirks: motifs span
# alignment gaps, N resets the rolling key, and the base at the position
# returned by getNewKey is skipped by the outer loop (match.go:106-110).
# ---------------------------------------------------------------------------


def _rank_tensor(pm: PositionMatrix):
    """initializeRankTensor (match.go:205): per-column selection sort of
    (value, base) rows, descending, Go tie behavior (first max wins)."""
    L = pm.mat.shape[1]
    cols = []
    for c in range(L):
        rows = [(float(pm.mat[r][c]), r) for r in range(4)]
        for rank in range(3):
            max_row, max_val = rank, rows[rank][0]
            for r in range(rank + 1, 4):
                if rows[r][0] > max_val:
                    max_row, max_val = r, rows[r][0]
            rows[max_row], rows[rank] = rows[rank], rows[max_row]
        cols.append(rows)
    # transpose to rank-major like the Go [][]rankTensorElement
    return [[cols[c][rank] for c in range(L)] for rank in range(4)]


def _pack_key(bases) -> int:
    key = 0
    for b in bases:
        key = (key << 2) | int(b)
    return key


def build_kmer_hash(pm: PositionMatrix,
                    threshold_proportion: float) -> dict[int, float]:
    """motif.BuildKmerHash (match.go:253): all 2-bit-packed k-mers whose
    PWM score >= threshold_proportion * consensus score (consensus always
    included), found by rank-tensor pruned DFS."""
    cons = consensus_sequence(pm).seq.tolist()
    consensus_value, _, ok = score_window(pm, np.array(cons, np.int8), 0)
    if not ok:
        raise ValueError("could not score consensus sequence")
    threshold = threshold_proportion * consensus_value
    rank = _rank_tensor(pm)
    L = pm.mat.shape[1]
    answer = {_pack_key(cons): consensus_value}
    rank_vec = [0] * L
    seq = list(cons)
    shift = [2 * (L - 1 - i) for i in range(L)]
    key = [_pack_key(cons)]  # incrementally XOR-updated with seq edits

    def recurse(parent_value: float, index: int) -> None:
        curr = (parent_value + rank[rank_vec[index]][index][0]
                - rank[rank_vec[index] - 1][index][0])
        if curr < threshold:
            return
        answer[key[0]] = curr
        for i in range(index, L):
            if rank_vec[i] < 3:
                # Go sets the pre-increment rank's base here
                # (matchComp-era quirk, match.go:295) — keys can lag values
                b = rank[rank_vec[i]][i][1]
                key[0] ^= (seq[i] ^ b) << shift[i]
                seq[i] = b
                rank_vec[i] += 1
                recurse(curr, i)
                rank_vec[i] -= 1
                b = rank[rank_vec[i]][i][1]
                key[0] ^= (seq[i] ^ b) << shift[i]
                seq[i] = b

    for col in range(L):
        b = rank[1][col][1]
        key[0] ^= (seq[col] ^ b) << shift[col]
        seq[col] = b
        rank_vec[col] = 1
        recurse(consensus_value, col)
        b = rank[0][col][1]
        key[0] ^= (seq[col] ^ b) << shift[col]
        seq[col] = b
        rank_vec[col] = 0
    return answer


def _get_new_key(seq: list[int], aln_pos: int, motif_len: int):
    """getNewKey (match.go:162): first full k-mer at/after aln_pos; N
    resets the partial key, gaps are skipped. Returns (key, end, ok)."""
    answer = 0
    motif_pos = 0
    n = len(seq)
    while motif_pos < motif_len:
        if aln_pos >= n:
            return 0, 0, False
        b = seq[aln_pos]
        if b == dna.N:
            motif_pos = 0
            answer = 0
        elif b == dna.GAP:
            pass
        elif b <= dna.T:
            answer = (answer << 2) | b
            motif_pos += 1
        else:
            raise ValueError("unrecognized base in getNewKey")
        aln_pos += 1
    return answer, aln_pos, True


def _scan_keys(seq: list[int], motif_len: int):
    """Yields (aln_pos, key) hit-check points replicating the rolling-key
    loops in scanGenome / scan*SequenceComp (match.go:97-117). The base at
    the position right after each fresh key is skipped, as in the
    reference."""
    bitmask = (1 << (2 * motif_len)) - 1
    need_new = True
    key = 0
    pos = 0
    n = len(seq)
    while pos < n:
        if need_new:
            key, pos, ok = _get_new_key(seq, pos, motif_len)
            if not ok:
                return
            need_new = False
        else:
            b = seq[pos]
            if b == dna.N:
                need_new = True
                pos += 1
                continue
            if b == dna.GAP:
                pos += 1
                continue
            if b > dna.T:
                raise ValueError("unrecognized base in scan")
            key = ((key << 2) | b) & bitmask
        yield pos, key
        pos += 1


def rapid_match(motifs: list[PositionMatrix], records: list[fastaio.Fasta],
                prop_match: float, out_file: str,
                output_as_proportion: bool = False) -> None:
    """motif.RapidMatch (match.go:61): genome-wide motif occurrence scan
    -> bed, both strands, threshold = prop_match * consensus score."""
    with fileio.easy_create(out_file) as out:
        for pm in motifs:
            L = pm.mat.shape[1]
            if L > 32:
                raise SystemExit(
                    f"RapidMatch cannot accommodate Position Matrices with "
                    f"a motif length greater than 32. Plese filter out the "
                    f"matrix with this ID: {pm.id}.")
            cons = consensus_sequence(pm)
            consensus_score, _, ok = score_window(pm, cons.seq, 0)
            if not ok:
                raise ValueError("could not score consensus sequence")
            for strand, mat in ((bedio.POSITIVE, pm),
                                (bedio.NEGATIVE, reverse_complement(pm))):
                kmer_hash = build_kmer_hash(mat, prop_match)
                for rec in records:
                    seq = np.asarray(rec.seq).tolist()
                    for pos, key in _scan_keys(seq, L):
                        score = kmer_hash.get(key)
                        if score is None:
                            continue
                        if output_as_proportion:
                            score = score / consensus_score
                        out.write(bedio.Bed(
                            chrom=rec.name, chrom_start=pos - L,
                            chrom_end=pos, name=pm.name, score=0,
                            strand=strand, fields_initialized=7,
                            annotation=[f"{score:f}"]).to_string() + "\n")


# backwards-compatible name
match = rapid_match


def _go_v(x: float) -> str:
    """Go %v float formatting (fmt.Sprintf("%v", f))."""
    import math as _math

    if _math.isnan(x):
        return "NaN"
    if _math.isinf(x):
        return "+Inf" if x > 0 else "-Inf"
    s = repr(float(x))
    return s[:-2] if s.endswith(".0") else s


class _WindowScorer:
    """Vectorized ScoreWindow over all starts of one sequence for one
    PositionMatrix. Accumulates per-motif-column in the same order as
    score_window, so results are IEEE-identical to the sequential sum."""

    def __init__(self, pm: PositionMatrix, seq: np.ndarray):
        L = pm.mat.shape[1]
        s = np.asarray(seq, np.int64)
        non_gap = np.flatnonzero(s != dna.GAP)
        comp = s[non_gap]
        n = len(comp) - L + 1
        self._L = L
        self._seq_len = len(s)
        self._non_gap = non_gap
        if n <= 0:
            self._scores = np.zeros(0)
            self._ok = np.zeros(0, bool)
            self._ends = np.zeros(0, np.int64)
            return
        scores = np.zeros(n)
        ok = np.ones(n, bool)
        for j in range(L):
            win = comp[j:j + n]
            bad = win > dna.T
            ok &= ~bad
            scores = scores + pm.mat[np.where(bad, 0, win), j]
        self._scores = scores
        self._ok = ok
        # end = position after the window's last base (ScoreWindow return)
        self._ends = non_gap[L - 1:] + 1

    def score(self, start: int):
        """score_window(pm, seq, start) equivalent: (score, end, ok)."""
        if start >= self._seq_len:
            return -1.0, -1, False
        k = int(np.searchsorted(self._non_gap, start))
        if k >= len(self._scores) or not self._ok[k]:
            return -1.0, -1, False
        return float(self._scores[k]), int(self._ends[k]), True


def _scan_sequence_comp(records, kmer_hash, pm: PositionMatrix,
                        chrom_name: str, out, residual_window_size: int,
                        consensus_score: float, strand: str, ref_start: int,
                        enforce_strand_match: bool,
                        output_as_proportion: bool,
                        alt_ends_considered: dict, residual_filter: float,
                        scan_alt: bool, scorer_cache: dict) -> None:
    """scanRefSequenceComp / scanAltSequenceComp (matchComp.go:103-319):
    scan one sequence of a pairwise alignment for motif hits and report
    the best-matching window in the other sequence."""
    L = pm.mat.shape[1]
    rev_comp_pm = reverse_complement(pm)
    scanned = records[1] if scan_alt else records[0]
    other_idx = 0 if scan_alt else 1
    seq = np.asarray(scanned.seq).tolist()
    key_fwd = (id(pm.mat), other_idx)
    if key_fwd not in scorer_cache:
        scorer_cache[key_fwd] = _WindowScorer(pm, records[other_idx].seq)
    fwd_scorer = scorer_cache[key_fwd]
    key_rev = ("rev", id(pm.mat), other_idx)
    if key_rev not in scorer_cache:
        scorer_cache[key_rev] = _WindowScorer(rev_comp_pm,
                                              records[other_idx].seq)
    rev_scorer = scorer_cache[key_rev]
    ref0 = np.asarray(records[0].seq)
    # prefix[i] = non-gap bases before aln position i (counter semantics)
    prefix = np.concatenate([[0], np.cumsum(ref0 != dna.GAP)])
    for aln_pos, key in _scan_keys(seq, L):
        this_score = kmer_hash.get(key)
        if this_score is None:
            continue
        if scan_alt and aln_pos in alt_ends_considered:
            continue
        ref_pos = int(prefix[aln_pos])
        min_residual = float("inf")
        min_residual_other = float("-inf")
        lo = max(aln_pos - L - residual_window_size + 1, 0)
        hi = min(aln_pos + residual_window_size - L + 1,
                 len(records[0].seq))
        for other_start in range(lo, hi + 1):
            other_score, other_end, ok = fwd_scorer.score(other_start)
            if not ok:
                break
            if abs(this_score - other_score) < min_residual:
                min_residual = abs(this_score - other_score)
                min_residual_other = other_score
            if not enforce_strand_match:
                other_score, other_end, ok = rev_scorer.score(other_start)
                if not ok:
                    break
                if abs(this_score - other_score) < min_residual:
                    min_residual = abs(this_score - other_score)
                    min_residual_other = other_score
            if not scan_alt:
                alt_ends_considered[other_end] = True
        if output_as_proportion:
            this_score = this_score / consensus_score
            min_residual_other = min_residual_other / consensus_score
            min_residual = abs(this_score - min_residual_other)
        if min_residual >= residual_filter:
            if scan_alt:
                ann = [_go_v(min_residual_other), _go_v(this_score),
                       _go_v(min_residual)]
            else:
                ann = [_go_v(this_score), _go_v(min_residual_other),
                       _go_v(min_residual)]
            out.write(bedio.Bed(
                chrom=chrom_name,
                chrom_start=ref_start + ref_pos - L + 1,
                chrom_end=ref_start + ref_pos + 1, name=pm.name, score=0,
                strand=strand, fields_initialized=9,
                annotation=ann).to_string() + "\n")


def match_comp(motif_file: str, motif_type: str,
               records: list[fastaio.Fasta], prop_match: float,
               chrom_name: str, out_file: str, *,
               pseudocounts: float = 0.1, residual_window_size: int = 5,
               ref_start: int = 0, output_as_proportion: bool = False,
               enforce_strand_match: bool = False,
               residual_filter: float = 0.0, gc_content: float = 0.5,
               matrix_filter: bool = False) -> None:
    """motif.MatchComp (matchComp.go:32): compare motif profiles between
    two aligned sequences; report ref hits with best-residual alt windows
    and alt-only hits not already considered."""
    motifs_unfiltered = _read_as_pwm(motif_file, motif_type, pseudocounts,
                                     gc_content)
    if matrix_filter:
        motifs = []
        for pm in motifs_unfiltered:
            if pm.mat.shape[1] <= 32:
                motifs.append(pm)
            else:
                print(f"Filtered out matrix with motif length greater than "
                      f"32. Matrix ID: {pm.id}. Motif length: "
                      f"{pm.mat.shape[1]}.")
    else:
        motifs = list(motifs_unfiltered)

    with fileio.easy_create(out_file) as out:
        for pm in motifs:
            L = pm.mat.shape[1]
            if L > 32:
                raise SystemExit(
                    f"Error: MatchComp cannot accommodate Position Matrices "
                    f"with a motif length greater than 32. Please filter "
                    f"out the matrix with this ID: {pm.id}.")
            cons = consensus_sequence(pm)
            consensus_score, _, ok = score_window(pm, cons.seq, 0)
            if not ok:
                raise ValueError("could not score consensus sequence")
            alt_ends_considered: dict = {}
            scorer_cache: dict = {}
            kmer_hash = build_kmer_hash(pm, prop_match)
            rev_pm = reverse_complement(pm)
            rev_hash = build_kmer_hash(rev_pm, prop_match)
            args = dict(chrom_name=chrom_name, out=out,
                        scorer_cache=scorer_cache,
                        residual_window_size=residual_window_size,
                        consensus_score=consensus_score,
                        ref_start=ref_start,
                        enforce_strand_match=enforce_strand_match,
                        output_as_proportion=output_as_proportion,
                        alt_ends_considered=alt_ends_considered,
                        residual_filter=residual_filter)
            _scan_sequence_comp(records, kmer_hash, pm,
                                strand=bedio.POSITIVE, scan_alt=False,
                                **args)
            _scan_sequence_comp(records, rev_hash, rev_pm,
                                strand=bedio.NEGATIVE, scan_alt=False,
                                **args)
            _scan_sequence_comp(records, kmer_hash, pm,
                                strand=bedio.POSITIVE, scan_alt=True,
                                **args)
            _scan_sequence_comp(records, rev_hash, rev_pm,
                                strand=bedio.NEGATIVE, scan_alt=True,
                                **args)


def approx_equals(alpha: str, beta: str, epsilon: float) -> bool:
    """motif.ApproxEquals (compare.go:11): line counts + field counts must
    match; annotation fields 7 and 8 compare numerically within epsilon."""
    query = fileio.read(alpha)
    answer = fileio.read(beta)
    if len(query) != len(answer):
        return False
    for q, a in zip(query, answer):
        qf, af = q.split("\t"), a.split("\t")
        if len(qf) != len(af):
            return False
        for idx in (7, 8):
            if idx >= len(qf):
                return False
            if abs(float(qf[idx]) - float(af[idx])) > epsilon:
                return False
    return True


def _read_as_pwm(motif_file: str, motif_type: str, pseudocounts: float,
                 gc_content: float) -> list[PositionMatrix]:
    """The Frequency->Ppm->Pwm / Probability->Pwm / Weight ladder shared
    by tfMatch, tfMatchComp and pwmTools info."""
    if motif_type == "Frequency":
        ms = read_jaspar(motif_file, "Frequency")
        ms = [pfm_to_ppm(m, pseudocounts) for m in ms]
        return [ppm_to_pwm(m, gc_content) for m in ms]
    if motif_type == "Probability":
        ms = read_jaspar(motif_file, "Probability")
        return [ppm_to_pwm(m, gc_content) for m in ms]
    if motif_type == "Weight":
        return read_jaspar(motif_file, "Weight")
    raise SystemExit("Error. Unexpected motif file format. Options are "
                     "'Frequency', 'Probability', and 'Weight'.")
