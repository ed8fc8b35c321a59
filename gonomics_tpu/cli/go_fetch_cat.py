"""goFetchCat — stream an http(s) url to stdout
(reference: cmd/goFetchCat/goFetchCat.go, fileio/http.go CatUrl)."""

from __future__ import annotations

import argparse
import sys
import urllib.request


def cat_url(url: str) -> str:
    """fileio.CatUrl (http.go:14-30): fetch the url body as text,
    transparently gunzipping .gz urls."""
    if not url.startswith(("http://", "https://")):
        url = "http://" + url
    with urllib.request.urlopen(url) as resp:
        data = resp.read()
    if url.endswith(".gz"):
        import gzip
        data = gzip.decompress(data)
    return data.decode()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="goFetchCat")
    p.add_argument("url")
    a = p.parse_args(argv)
    sys.stdout.write(cat_url(a.url))


if __name__ == "__main__":
    main()
