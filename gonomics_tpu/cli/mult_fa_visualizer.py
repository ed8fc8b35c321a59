"""multFaVisualizer — human-readable multiFa alignment view
(reference: cmd/multFaVisualizer/multFaVisualizer.go)."""

from __future__ import annotations

import argparse

from .. import browser


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="multFaVisualizer")
    p.add_argument("-noMask", action="store_true",
                   help="Converts all bases to upper case.")
    p.add_argument("-lineLength", type=int, default=100)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("start", type=int)
    p.add_argument("end")
    a = p.parse_args(argv)
    end_of_alignment = a.end.upper() == "END"
    end_pos = 0 if end_of_alignment else int(a.end)
    browser.multi_fa_visualizer(a.input, a.output, a.start, end_pos,
                                a.noMask, a.lineLength, end_of_alignment)


if __name__ == "__main__":
    main()
