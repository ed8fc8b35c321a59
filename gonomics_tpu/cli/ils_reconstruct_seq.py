"""ilsReconstructSeq — ILS-aware ancestral reconstruction averaging
(reference: cmd/ilsReconstructSeq/ilsReconstructSeq.go)."""

from __future__ import annotations

import argparse

from .. import fileio
from ..io import pfasta
from ..io import wig as wigio
from ..phylo.reconstruct import ils_reconstruct_seq


def ils_reconstruct_seq_cmd(post_probs_files: str, recon_files: str,
                            chrom_sizes_file: str, out_file: str, *,
                            precision: float = 0.001) -> None:
    recons = [pfasta.read(path)[0] for path in fileio.read(recon_files)]
    post_probs = [wigio.read(path, chrom_sizes_file, 0)
                  for path in fileio.read(post_probs_files)]
    out = ils_reconstruct_seq(post_probs, recons, precision)
    pfasta.write(out_file, [out])


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ilsReconstructSeq")
    p.add_argument("--precision", type=float, default=0.001)
    p.add_argument("postProbs")
    p.add_argument("recons")
    p.add_argument("chromSizes")
    p.add_argument("outDir")
    a = p.parse_args(argv)
    ils_reconstruct_seq_cmd(a.postProbs, a.recons, a.chromSizes, a.outDir,
                            precision=a.precision)


if __name__ == "__main__":
    main()
