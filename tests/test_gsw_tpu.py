"""TPU graph aligner (gsw_tpu.TpuGswAligner, device extension DP) must
emit bit-identical giraf records to the host engine (gsw.GswAligner) —
the parity contract for SURVEY.md P2 hard-part 4.

Covers a branching multi-node graph (reference genomeGraph testdata) and
a variant_graph-constructed graph (graphTools.go:13 semantics)."""

import numpy as np
import pytest

from gonomics_tpu import dna
from gonomics_tpu.graph import GenomeGraph, Node, add_edge, read as read_gg
from gonomics_tpu.graph import variant_graph
from gonomics_tpu.gsw import GswAligner
from gonomics_tpu.gsw_tpu import TpuGswAligner
from gonomics_tpu.io import giraf as girafio
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq, to_big
from gonomics_tpu.io.vcf import Vcf

REF_TD = "/root/reference/genomeGraph/testdata"


def _same(a, b):
    return girafio.to_string(a) == girafio.to_string(b)


def _reads_from_graph(g, rng, n, L=60):
    """Simulate reads along graph paths (crossing node boundaries)."""
    reads = []
    for i in range(n):
        cur = g.nodes[int(rng.integers(0, len(g.nodes)))]
        # walk successors to build a long-enough template
        template = [cur.seq]
        tl = len(cur.seq)
        while tl < L + 10 and cur.next:
            cur = g.nodes[cur.next[int(rng.integers(0, len(cur.next)))].dest]
            template.append(cur.seq)
            tl += len(cur.seq)
        cat = np.concatenate(template)
        if len(cat) < L:
            continue
        start = int(rng.integers(0, len(cat) - L + 1))
        seq = cat[start:start + L].copy()
        if i % 3 == 1:
            p = int(rng.integers(0, L))
            seq[p] = (seq[p] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(to_big(Fastq(f"r{i}", seq.astype(np.int8),
                                  np.full(L, 30, np.uint8))))
    return reads


class TestGswCliGraphTpu:
    def test_cli_engine_tpu_matches_host(self, tmp_path):
        from gonomics_tpu.cli import gsw_cmd
        from gonomics_tpu.io import fastq as fastqio

        g = read_gg(f"{REF_TD}/mini.gg")
        rng = np.random.default_rng(3)
        reads = _reads_from_graph(g, rng, 6, L=48)
        fq = tmp_path / "r.fq"
        with open(fq, "w") as fh:
            for r in reads:
                q = "".join(chr(33 + int(x)) for x in r.qual)
                fh.write(f"@{r.name}\n{dna.to_string(r.seq)}\n+\n{q}\n")
        out_host = tmp_path / "host.giraf"
        out_tpu = tmp_path / "tpu.giraf"
        base = ["align", f"{REF_TD}/mini.gg", str(fq),
                "-i", "21", "-w", "8"]
        gsw_cmd.main(base + ["-o", str(out_host)])
        gsw_cmd.main(base + ["-o", str(out_tpu), "--engine", "tpu",
                             "--batch", "4"])
        assert out_host.read_text() == out_tpu.read_text()
        assert out_host.read_text().strip()


class TestGraphParity:
    def test_branching_graph_parity(self):
        g = read_gg(f"{REF_TD}/mini.gg")
        rng = np.random.default_rng(7)
        reads = _reads_from_graph(g, rng, 10, L=48)
        assert len(reads) >= 6
        host = GswAligner(g, seed_len=21, step_size=8)
        tpu = TpuGswAligner(g, seed_len=21, step_size=8, interpret=True,
                            wave=2)
        want = [host.align_read(r) for r in reads]
        got = tpu.align_batch(reads)
        for w, gt in zip(want, got):
            assert _same(w, gt), (girafio.to_string(w), girafio.to_string(gt))

    def test_variant_graph_parity_default_params(self):
        """The bench config's shape: variant graph + gsw-default seed
        params (-i 32 -w 32, gsw.go:53-57), 150 bp reads with one SNP —
        wave engine must stay byte-identical to the host engine."""
        rng = np.random.default_rng(21)
        ref = rng.integers(0, 4, 4000).astype(np.int8)
        vcfs = [
            Vcf(chrom="chr1", pos=p, id=".",
                ref=dna.to_string(ref[p - 1:p]),
                alt=[dna.to_string((ref[p - 1:p] + 1) % 4)],
                info="SVTYPE=SNP")
            for p in (800, 2000, 3100)
        ]
        g = variant_graph([Fasta("chr1", ref)], {"chr1": vcfs})
        reads = []
        for i in range(24):
            s = int(rng.integers(0, len(ref) - 150))
            seq = ref[s:s + 150].copy()
            p = int(rng.integers(0, 150))
            seq[p] = (seq[p] + 1) % 4
            if i % 2:
                seq = dna.reverse_complement(seq).astype(np.int8)
            reads.append(to_big(Fastq(f"b{i}", seq,
                                      np.full(150, 30, np.uint8))))
        host = GswAligner(g)
        tpu = TpuGswAligner(g, interpret=True)
        want = [host.align_read(r) for r in reads]
        got = tpu.align_batch(reads)
        for w, gt in zip(want, got):
            assert _same(w, gt), (girafio.to_string(w),
                                  girafio.to_string(gt))

    def test_variant_graph_parity(self):
        rng = np.random.default_rng(13)
        ref = rng.integers(0, 4, 400).astype(np.int8)
        vcfs = [
            Vcf(chrom="chr1", pos=60, id=".", ref=dna.to_string(ref[59:60]),
                alt=[dna.to_string((ref[59:60] + 1) % 4)],
                info="SVTYPE=SNP"),
            Vcf(chrom="chr1", pos=200, id=".",
                ref=dna.to_string(ref[199:203]),
                alt=[dna.to_string(ref[199:200])],
                info="SVTYPE=DEL"),
        ]
        g = variant_graph([Fasta("chr1", ref)], {"chr1": vcfs})
        assert len(g.nodes) > 3
        reads = _reads_from_graph(g, np.random.default_rng(5), 8, L=48)
        assert len(reads) >= 4
        host = GswAligner(g, seed_len=21, step_size=8)
        tpu = TpuGswAligner(g, seed_len=21, step_size=8, interpret=True,
                            wave=2)
        want = [host.align_read(r) for r in reads]
        got = tpu.align_batch(reads)
        for w, gt in zip(want, got):
            assert _same(w, gt), (girafio.to_string(w), girafio.to_string(gt))
