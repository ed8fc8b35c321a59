"""chain/net package: read/write round-trip + ToBed golden
(reference chain/net/net_test.go, toBed_test.go)."""

from gonomics_tpu import fileio
from gonomics_tpu.io import bed as bedio, net

TD = "/root/reference/chain/net/testdata"


def test_net_read_write_roundtrip(tmp_path):
    nets, mp = net.read(f"{TD}/test.in.net")
    out = tmp_path / "out.net"
    net.write(str(out), nets, mp)
    assert fileio.are_equal(str(out), f"{TD}/test.in.net")


def test_net_to_bed_golden(tmp_path):
    nets, _ = net.read(f"{TD}/test.in.net")
    beds = net.to_bed(nets)
    out = tmp_path / "out.bed"
    bedio.write(str(out), beds)
    assert fileio.are_equal(str(out), f"{TD}/exp.NTB.bed")


def test_net_levels():
    nets, mp = net.read(f"{TD}/test.in.net")
    assert nets[0].klass == "fill" and nets[0].level == 1
    assert all(n.klass in ("fill", "gap") for n in nets)
    assert max(n.level for n in nets) >= 2
    assert "chr1" in mp and mp["chr1"].size == 248956422
