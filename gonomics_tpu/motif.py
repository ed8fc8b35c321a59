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


def write_jaspar(filename: str, records: list[PositionMatrix]) -> None:
    """motif.WriteJaspar (motif.go:34), byte-exact row formatting."""
    with fileio.easy_create(filename) as f:
        for m in records:
            f.write(f">{m.id}\t{m.name}\n")
            rows = ["A\t[\t", "C [ ", "G [ ", "T [ "]
            for r in range(4):
                f.write(rows[r])
                for v in m.mat[r]:
                    f.write(f"\t{_fmt6g(v)}")
                f.write("\t]\n")


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
    p_gc = gc_content / 2.0
    p_at = (1 - gc_content) / 2.0
    out = np.empty_like(pm.mat)
    out[0] = np.log2(pm.mat[0] / p_at)
    out[1] = np.log2(pm.mat[1] / p_gc)
    out[2] = np.log2(pm.mat[2] / p_gc)
    out[3] = np.log2(pm.mat[3] / p_at)
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


def match(motifs: list[PositionMatrix], records: list[fastaio.Fasta],
          prop_match: float, out_file: str,
          output_as_proportion: bool = False,
          use_jax: bool = False) -> None:
    """Genome-wide motif occurrence scan -> bed (RapidMatch behavior:
    threshold = prop_match * consensus score, both strands; negative-
    strand matches are reported on forward coordinates)."""
    with fileio.easy_create(out_file) as out:
        for pm in motifs:
            cons = consensus_sequence(pm)
            consensus_score, _, ok = score_window(pm, cons.seq, 0)
            if not ok:
                raise ValueError("could not score consensus sequence")
            threshold = prop_match * consensus_score
            for strand, mat in ((bedio.POSITIVE, pm),
                                (bedio.NEGATIVE, reverse_complement(pm))):
                for rec in records:
                    if use_jax:
                        import numpy as _np

                        scores = _np.asarray(scan_scores_jax(mat, rec.seq))
                    else:
                        scores = scan_scores(mat, rec.seq)
                    hits = np.nonzero(scores >= threshold)[0]
                    for h in hits:
                        val = scores[h] / consensus_score \
                            if output_as_proportion else scores[h]
                        L = pm.mat.shape[1]
                        out.write(bedio.Bed(
                            chrom=rec.name, chrom_start=int(h),
                            chrom_end=int(h) + L, name=pm.name,
                            score=min(1000, int(round(val))) if not
                            output_as_proportion else 0,
                            strand=strand, fields_initialized=7,
                            annotation=[_fmt6g(val)]).to_string() + "\n")
