"""Native C++ IO runtime tests (bgzf parallel decompress, fastq parse)."""

import gzip

import numpy as np

from gonomics_tpu import native
from gonomics_tpu.io import fastq as fq


def test_bgzf_matches_gzip():
    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    raw = open("/root/reference/cmd/callVariants/testdata/human_chrM.bam",
               "rb").read()
    assert native.bgzf_decompress(raw) == gzip.decompress(raw)


def test_fastq_native_matches_python(tmp_path):
    recs = [fq.Fastq(f"r{i}", np.array([0, 1, 2, 3, 4] * 10, np.int8),
                     np.arange(50).astype(np.uint8)) for i in range(7)]
    path = str(tmp_path / "t.fq")
    fq.write(path, recs)
    got = fq.read(path)
    assert len(got) == 7
    for a, b in zip(got, recs):
        assert a.name == b.name
        assert (a.seq == b.seq).all()
        assert (a.qual == b.qual).all()


def test_bam_write_round_trip(tmp_path):
    from gonomics_tpu.io import sam as samio

    src = "/root/reference/cmd/callVariants/testdata/human_chrM.bam"
    h, recs = samio.read(src)
    out = str(tmp_path / "rt.bam")
    samio.write_sam(out, h, recs)
    h2, recs2 = samio.read(out)
    assert h2.text == h.text
    assert len(recs2) == len(recs)
    for a, b in zip(recs, recs2):
        assert a.to_string() == b.to_string()
        assert getattr(a, "_raw_tags", b"") == getattr(b, "_raw_tags", b"")


def test_bam_write_native_decodable(tmp_path):
    # the C++ bgzf scanner must accept our writer's framing
    import gzip

    from gonomics_tpu import native
    from gonomics_tpu.io import sam as samio

    src = "/root/reference/sam/testdata/peak.bam"
    h, recs = samio.read(src)
    out = str(tmp_path / "o.bam")
    samio.write_sam(out, h, recs[:100])
    raw = open(out, "rb").read()
    if native.available():
        assert native.bgzf_decompress(raw) == gzip.decompress(raw)
