"""fileio http(s) readers (reference fileio/http.go:14-37, easyio.go:33):
every format reader can open an http:// URL. Served from a local
http.server (no external network)."""

import gzip
import http.server
import io
import threading

import numpy as np
import pytest

from gonomics_tpu import dna, fileio
from gonomics_tpu.io import fasta as fastaio


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("www")
    (d / "hello.txt").write_text("line1\n#comment\nline2\n")
    (d / "ref.fa").write_text(">chr1\nACGTACGTAA\n")
    (d / "hello.txt.gz").write_bytes(gzip.compress(b"gz1\ngz2\n"))

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(d), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_easy_open_url(server):
    with fileio.easy_open(f"{server}/hello.txt") as f:
        assert [ln.rstrip() for ln in f] == ["line1", "#comment", "line2"]


def test_read_url_skips_comments(server):
    assert fileio.read(f"{server}/hello.txt") == ["line1", "line2"]


def test_url_gz_suffix_decompresses(server):
    with fileio.easy_open(f"{server}/hello.txt.gz") as f:
        assert f.read() == "gz1\ngz2\n"


def test_cat_url(server):
    assert fileio.cat_url(f"{server}/hello.txt") == \
        "line1\n#comment\nline2\n"


def test_fasta_reader_over_http(server):
    recs = fastaio.read(f"{server}/ref.fa")
    assert recs[0].name == "chr1"
    assert dna.to_string(recs[0].seq) == "ACGTACGTAA"


def test_local_file_with_http_in_name(tmp_path):
    # the reference's Contains(filename, "http") would break this
    p = tmp_path / "my_http_notes.txt"
    p.write_text("ok\n")
    assert fileio.read(str(p)) == ["ok"]
