"""bamTagToReadGroup — add BAM read groups based on read tags
(reference: cmd/bamTagToReadGroup/bamTagToReadGroup.go).

Removes all existing @RG header lines, appends one
``@RG\\tID:v\\tSM:v\\tLB:v`` per tag value, strips any existing RG tag
from each record, and assigns ``RG:Z:value`` when the record's
``tagId`` tag value appears in the values file.
"""

from __future__ import annotations

import argparse

from .. import fileio
from ..io import sam as samio


def update_record(rec: samio.Sam, tag_id: str,
                  tag_values: set[str]) -> None:
    """cmd/bamTagToReadGroup/bamTagToReadGroup.go:113-138 updateRecord."""
    samio.remove_tag(rec, "RG")
    tag_value = ""
    for field in rec.extra.split("\t"):
        if field.startswith(tag_id + ":"):
            tag_value = field[5:]  # skip "XX:Z:" (reference :127)
            break
    if tag_value in tag_values:
        samio.add_tag(rec, "RG", "Z", tag_value)


def add_tags_to_header(header: samio.Header,
                       tag_values: list[str]) -> None:
    """addTagsToHeader (bamTagToReadGroup.go:100-111)."""
    new_text = [t for t in header.text if not t.startswith("@RG")]
    new_text.extend(f"@RG\tID:{v}\tSM:{v}\tLB:{v}" for v in tag_values)
    header.text = new_text


def bam_tag_to_read_group(infile: str, outfile: str, tag_id: str,
                          tag_values_file: str) -> None:
    tag_values = fileio.read(tag_values_file)
    value_set = set(tag_values)
    header, records = samio.read(infile)
    add_tags_to_header(header, tag_values)
    for rec in records:
        update_record(rec, tag_id, value_set)
    from ..io.bam_writer import write_bam
    write_bam(outfile, header, records)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="bamTagToReadGroup")
    p.add_argument("-i", required=True, help="Input bam file")
    p.add_argument("-o", default="stdout", help="Output bam file")
    p.add_argument("-tagId", required=True)
    p.add_argument("-tagValues", required=True)
    a = p.parse_args(argv)
    if len(a.tagId) != 2:
        raise SystemExit("Error: -tagId must be 2 characters")
    bam_tag_to_read_group(a.i, a.o, a.tagId, a.tagValues)


if __name__ == "__main__":
    main()
