"""simulateSam — simulate Illumina paired reads (reference: cmd/simulateSam;
own-PRNG determinism, see gonomics_tpu/simulate.py)."""

from __future__ import annotations

import argparse

from ..simulate import simulate_sam


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="simulateSam")
    p.add_argument("ref")
    p.add_argument("out")
    p.add_argument("-numPairs", type=int, default=100)
    p.add_argument("-readLength", type=int, default=150)
    p.add_argument("-fragmentLength", type=int, default=400)
    p.add_argument("-fragmentStdDev", type=float, default=50.0)
    p.add_argument("-flatErrorRate", type=float, default=0.0)
    p.add_argument("-setSeed", type=int, default=0)
    a = p.parse_args(argv)
    simulate_sam(a.ref, a.out, num_pairs=a.numPairs, read_len=a.readLength,
                 avg_fragment_size=a.fragmentLength,
                 fragment_std=a.fragmentStdDev,
                 flat_error_rate=a.flatErrorRate, seed=a.setSeed)


if __name__ == "__main__":
    main()
