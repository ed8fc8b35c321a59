"""pwmTools — position-matrix manipulation: filter/format/info/shuffle
(reference: cmd/pwmTools/*.go).

Parity note: the reference's format subcommand switches on s.OutFile
instead of s.OutType for Weight inputs (format.go, `switch s.OutFile`),
so Weight->Probability conversion only triggers when the output FILENAME
is literally "Probability"; reproduced as-is. Shuffle uses Go's seeded
math/rand stream in the reference; here a seeded numpy Fisher-Yates is
used (documented RNG-stream limitation), preserving the column-multiset
property."""

from __future__ import annotations

import argparse

import numpy as np

from .. import fileio, motif


def pwm_filter(in_file: str, out_file: str, *,
               matrix_type: str = "Frequency", min_length: int = 0,
               max_length: int = 2 ** 62) -> None:
    records = motif.read_jaspar(in_file, matrix_type)
    kept = [r for r in records
            if min_length <= r.mat.shape[1] <= max_length]
    motif.write_jaspar(out_file, kept)


def pwm_format(in_file: str, out_file: str, *, in_type: str = "Weight",
               out_type: str = "Frequency", pseudocount: float = 0.1,
               gc_content: float = 0.5) -> None:
    if not 0 <= gc_content <= 1:
        raise SystemExit("Error: gcContent must be a value between 0 and 1.")
    records = motif.read_jaspar(in_file, in_type)
    if in_type == "Frequency":
        if out_type == "Probability":
            records = [motif.pfm_to_ppm(r, pseudocount) for r in records]
        elif out_type == "Weight":
            records = [motif.ppm_to_pwm(motif.pfm_to_ppm(r, pseudocount),
                                        gc_content) for r in records]
        elif out_type != "Frequency":
            raise SystemExit(f"unrecognized output type: {out_type}")
    elif in_type == "Probability":
        if out_type == "Frequency":
            raise SystemExit("Cannot convert a position probability matrix "
                             "to a position frequency matrix.")
        if out_type == "Weight":
            records = [motif.ppm_to_pwm(r, gc_content) for r in records]
    elif in_type == "Weight":
        # reference parity: switches on the output FILE NAME (format.go)
        if out_file == "Probability":
            records = [motif.pwm_to_ppm(r) for r in records]
    else:
        raise SystemExit(f"unrecognized input type: {in_type}")
    motif.write_jaspar(out_file, records)


def pwm_info(in_file: str, out_file: str, *, matrix_type: str = "Frequency",
             pseudocounts: float = 0.1, gc_content: float = 0.5,
             threshold: float = 0.8) -> None:
    if not 0 <= threshold <= 1:
        raise SystemExit("Error: Threshold must be a value between 0 and 1.")
    records = motif._read_as_pwm(in_file, matrix_type, pseudocounts,
                                 gc_content)
    with fileio.easy_create(out_file) as out:
        out.write("TF\tMotifName\tLength\tConsensusScore\tCacheLength\n")
        for pm in records:
            cons = motif.consensus_sequence(pm)
            score, _, ok = motif.score_window(pm, cons.seq, 0)
            if not ok:
                raise SystemExit(f"could not score consensus for {pm.id}")
            cache = motif.build_kmer_hash(pm, threshold)
            out.write(f"{pm.name}\t{pm.id}\t{pm.mat.shape[1]}\t{score:e}\t"
                      f"{len(cache)}\n")


def pwm_shuffle(in_file: str, out_file: str, *, num_shuffle: int = 10,
                set_seed: int = 1) -> None:
    rng = np.random.default_rng(set_seed)
    records = motif.read_jaspar(in_file, "Frequency")
    with fileio.easy_create(out_file) as out:
        for pm in records:
            original_name = pm.name
            for it in range(num_shuffle):
                # Fisher-Yates over columns (shuffle.go shufflePwmColumns)
                for col in range(pm.mat.shape[1]):
                    j = int(rng.integers(0, col + 1))
                    pm.mat[:, [col, j]] = pm.mat[:, [j, col]]
                pm.name = f"{original_name}_{it}"
                motif.write_jaspar_record(out, pm)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="pwmTools")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("filter")
    f.add_argument("--minLength", type=int, default=0)
    f.add_argument("--maxLength", type=int, default=2 ** 62)
    f.add_argument("--matrixType", default="Frequency")
    f.add_argument("input")
    f.add_argument("output")

    fm = sub.add_parser("format")
    fm.add_argument("--inType", default="Weight")
    fm.add_argument("--outType", default="Frequency")
    fm.add_argument("--pfmPseudocounts", type=float, default=0.1)
    fm.add_argument("--gcContent", type=float, default=0.5)
    fm.add_argument("input")
    fm.add_argument("output")

    i = sub.add_parser("info")
    i.add_argument("--matrixType", default="Frequency")
    i.add_argument("--pfmPseudocounts", type=float, default=0.1)
    i.add_argument("--gcContent", type=float, default=0.5)
    i.add_argument("--threshold", type=float, default=0.8)
    i.add_argument("input")
    i.add_argument("output")

    s = sub.add_parser("shuffle")
    s.add_argument("--numShuffle", type=int, default=10)
    s.add_argument("--setSeed", type=int, default=1)
    s.add_argument("input")
    s.add_argument("output")

    a = p.parse_args(argv)
    if a.cmd == "filter":
        pwm_filter(a.input, a.output, matrix_type=a.matrixType,
                   min_length=a.minLength, max_length=a.maxLength)
    elif a.cmd == "format":
        pwm_format(a.input, a.output, in_type=a.inType, out_type=a.outType,
                   pseudocount=a.pfmPseudocounts, gc_content=a.gcContent)
    elif a.cmd == "info":
        pwm_info(a.input, a.output, matrix_type=a.matrixType,
                 pseudocounts=a.pfmPseudocounts, gc_content=a.gcContent,
                 threshold=a.threshold)
    elif a.cmd == "shuffle":
        pwm_shuffle(a.input, a.output, num_shuffle=a.numShuffle,
                    set_seed=a.setSeed)


if __name__ == "__main__":
    main()
