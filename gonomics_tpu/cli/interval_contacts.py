"""intervalContacts — regions contacting an input set via bedpe links
(reference: cmd/intervalContacts/intervalContacts.go)."""

from __future__ import annotations

import argparse

from .. import fileio, interval
from ..io import bed as bedio
from ..io import bedpe as bedpeio


def interval_contacts(bedpe_file: str, in_file: str,
                      contact_out_file: str) -> None:
    records = interval.read_intervals(in_file)
    tree = interval.IntervalIndex(records)
    with fileio.easy_create(contact_out_file) as out:
        for contact in bedpeio.read(bedpe_file):
            if tree.query(contact.a, "any"):
                bedio.write_to_handle(out, contact.b)
            if tree.query(contact.b, "any"):
                bedio.write_to_handle(out, contact.a)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="intervalContacts")
    p.add_argument("bedpe")
    p.add_argument("input")
    p.add_argument("output")
    a = p.parse_args(argv)
    interval_contacts(a.bedpe, a.input, a.output)


if __name__ == "__main__":
    main()
