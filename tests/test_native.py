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
