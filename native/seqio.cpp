// Native host-IO runtime: parallel BGZF decompression + FASTQ parsing.
//
// The reference feeds its aligner with Go goroutine pipelines over pgzip
// (fileio/easyio.go:42) and bgzf blocks (bgzf/reader.go:105). This is the
// TPU build's equivalent host layer (SURVEY.md 7 "feeding the beast"):
// BGZF files are sequences of independent gzip members whose compressed
// size is recorded in the BSIZE extra field, so blocks decompress in
// parallel across a thread pool. The FASTQ scanner tokenizes records and
// 2-bit-codes the bases into caller-provided int8 buffers.
//
// Exposed as a C ABI for Python ctypes (gonomics_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

struct Block {
    size_t in_off;
    size_t in_len;
    size_t out_off;
    size_t out_len;
};

// Parse BGZF block boundaries. Returns false if not BGZF (no BC extra).
bool scan_blocks(const uint8_t* data, size_t n, std::vector<Block>& blocks) {
    size_t off = 0;
    size_t out_off = 0;
    while (off + 18 <= n) {
        if (data[off] != 0x1f || data[off + 1] != 0x8b) return false;
        uint8_t flg = data[off + 3];
        if (!(flg & 4)) return false;  // no extra field -> not BGZF
        uint16_t xlen = data[off + 10] | (data[off + 11] << 8);
        size_t xoff = off + 12;
        size_t xend = xoff + xlen;
        if (xend > n) return false;
        uint32_t bsize = 0;
        bool found = false;
        while (xoff + 4 <= xend) {
            uint8_t si1 = data[xoff], si2 = data[xoff + 1];
            uint16_t slen = data[xoff + 2] | (data[xoff + 3] << 8);
            if (si1 == 'B' && si2 == 'C' && slen == 2) {
                bsize = (data[xoff + 4] | (data[xoff + 5] << 8)) + 1u;
                found = true;
            }
            xoff += 4 + slen;
        }
        if (!found || bsize == 0 || off + bsize > n) return false;
        // ISIZE: last 4 bytes of the member = uncompressed length
        uint32_t isize;
        std::memcpy(&isize, data + off + bsize - 4, 4);
        blocks.push_back({off, bsize, out_off, isize});
        out_off += isize;
        off += bsize;
    }
    return off == n && !blocks.empty();
}

int inflate_one(const uint8_t* in, size_t in_len, uint8_t* out,
                size_t out_len) {
    z_stream zs{};
    if (inflateInit2(&zs, 15 + 16) != Z_OK) return -1;  // gzip wrapper
    zs.next_in = const_cast<uint8_t*>(in);
    zs.avail_in = static_cast<uInt>(in_len);
    zs.next_out = out;
    zs.avail_out = static_cast<uInt>(out_len);
    int ret = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (out_len == 0 && ret == Z_BUF_ERROR) return 0;  // empty EOF block
    return ret == Z_STREAM_END ? 0 : -1;
}

}  // namespace

extern "C" {

// Returns total uncompressed size of a BGZF buffer, or -1 if not BGZF.
int64_t bgzf_scan(const uint8_t* data, int64_t n) {
    std::vector<Block> blocks;
    if (!scan_blocks(data, static_cast<size_t>(n), blocks)) return -1;
    size_t total = 0;
    for (const auto& b : blocks) total += b.out_len;
    return static_cast<int64_t>(total);
}

// Decompress a BGZF buffer into out (size from bgzf_scan) using nthreads.
// Returns 0 on success.
int bgzf_decompress(const uint8_t* data, int64_t n, uint8_t* out,
                    int64_t out_len, int nthreads) {
    std::vector<Block> blocks;
    if (!scan_blocks(data, static_cast<size_t>(n), blocks)) return -1;
    if (nthreads < 1) nthreads = 1;
    std::vector<int> errs(nthreads, 0);
    std::vector<std::thread> pool;
    std::size_t nb = blocks.size();
    for (int t = 0; t < nthreads; t++) {
        pool.emplace_back([&, t]() {
            for (size_t i = t; i < nb; i += nthreads) {
                const Block& b = blocks[i];
                if (b.out_off + b.out_len > static_cast<size_t>(out_len)) {
                    errs[t] = -1;
                    return;
                }
                if (inflate_one(data + b.in_off, b.in_len, out + b.out_off,
                                b.out_len) != 0) {
                    errs[t] = -1;
                    return;
                }
            }
        });
    }
    for (auto& th : pool) th.join();
    for (int e : errs)
        if (e != 0) return -1;
    return 0;
}

// Parallel block compression for the WRITE path — the pgzip/bgzf-writer
// analog of the reference's compressed outputs (fileio/easyio.go:42,
// bgzf/writer.go:46-139). Input splits into independent blocks, each
// deflated by a pool thread:
//   bgzf_mode=1: BGZF members (<=0xff00 payload, BC extra field); the
//     caller appends the 28-byte EOF block when closing the file.
//   bgzf_mode=0: plain multi-member gzip (1 MiB blocks) — readable by
//     zlib/zcat/python gzip, like pgzip's independent-block stream.
// Returns bytes written, or -1 on error / insufficient out_cap.
int64_t compress_blocks(const uint8_t* data, int64_t n, uint8_t* out,
                        int64_t out_cap, int32_t nthreads, int32_t level,
                        int32_t bgzf_mode) {
    const size_t blk = bgzf_mode ? 0xff00 : (1u << 20);
    size_t nb = n == 0 ? 1 : ((size_t)n + blk - 1) / blk;
    std::vector<std::vector<uint8_t>> parts(nb);
    std::vector<int> errs;
    if (nthreads < 1) nthreads = 1;
    errs.assign(nthreads, 0);
    auto work = [&](int t) {
        for (size_t i = t; i < nb; i += nthreads) {
            size_t off = i * blk;
            size_t len = (size_t)n - off < blk ? (size_t)n - off : blk;
            uLong bound = compressBound(len) + 64;
            std::vector<uint8_t> comp(bound);
            z_stream zs{};
            // raw deflate; gzip framing is written by hand
            if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                             Z_DEFAULT_STRATEGY) != Z_OK) {
                errs[t] = 1;
                return;
            }
            zs.next_in = const_cast<uint8_t*>(data + off);
            zs.avail_in = (uInt)len;
            zs.next_out = comp.data();
            zs.avail_out = (uInt)bound;
            if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
                deflateEnd(&zs);
                errs[t] = 1;
                return;
            }
            size_t clen = bound - zs.avail_out;
            deflateEnd(&zs);
            uint32_t crc = crc32(0L, data + off, (uInt)len);
            std::vector<uint8_t>& p = parts[i];
            if (bgzf_mode) {
                size_t bsize = clen + 26;  // header(18) + deflate + crc+len(8)
                if (bsize - 1 > 0xffff) {
                    errs[t] = 1;
                    return;
                }
                const uint8_t hdr[16] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0,
                                         0xff, 6, 0, 'B', 'C', 2, 0};
                p.insert(p.end(), hdr, hdr + 16);
                p.push_back((uint8_t)((bsize - 1) & 0xff));
                p.push_back((uint8_t)((bsize - 1) >> 8));
            } else {
                const uint8_t hdr[10] = {0x1f, 0x8b, 8, 0, 0, 0, 0, 0, 0,
                                        0xff};
                p.insert(p.end(), hdr, hdr + 10);
            }
            p.insert(p.end(), comp.data(), comp.data() + clen);
            uint32_t le[2] = {crc, (uint32_t)len};
            p.insert(p.end(), (uint8_t*)le, (uint8_t*)le + 8);
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    for (int e : errs)
        if (e) return -1;
    int64_t total = 0;
    for (auto& p : parts) total += (int64_t)p.size();
    if (total > out_cap) return -1;
    uint8_t* q = out;
    for (auto& p : parts) {
        std::memcpy(q, p.data(), p.size());
        q += p.size();
    }
    return total;
}

// Parse FASTQ text (uncompressed) into packed arrays.
//   seq_codes: int8 base codes (A=0,C=1,G=2,T=3,N=4; dna.py alphabet),
//              records padded to max_len with 4.
//   quals:     uint8 phred (ascii-33), same padding.
//   lengths:   per-record sequence length (int32).
//   name_buf:  '\n'-joined record names (up to name_cap bytes).
// Returns number of records parsed, or -1 on malformed input/overflow.
int64_t fastq_parse(const uint8_t* data, int64_t n, int32_t max_records,
                    int32_t max_len, int8_t* seq_codes, uint8_t* quals,
                    int32_t* lengths, uint8_t* name_buf, int64_t name_cap) {
    static int8_t lut[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; i++) lut[i] = 4;
        lut['A'] = 0; lut['C'] = 1; lut['G'] = 2; lut['T'] = 3;
        lut['a'] = 5; lut['c'] = 6; lut['g'] = 7; lut['t'] = 8;
        lut['n'] = 9;
        init = true;
    }
    int64_t pos = 0, rec = 0, name_off = 0;
    while (pos < n && rec < max_records) {
        if (data[pos] != '@') return -1;
        int64_t name_start = pos + 1;
        while (pos < n && data[pos] != '\n') pos++;
        int64_t name_len = pos - name_start;  // full header line
        if (name_off + name_len + 1 > name_cap) return -1;
        std::memcpy(name_buf + name_off, data + name_start, name_len);
        name_buf[name_off + name_len] = '\n';
        name_off += name_len + 1;
        pos++;  // skip newline
        int64_t seq_start = pos;
        while (pos < n && data[pos] != '\n') pos++;
        int64_t L = pos - seq_start;
        if (L > max_len) return -1;
        int8_t* sc = seq_codes + rec * static_cast<int64_t>(max_len);
        for (int64_t i = 0; i < L; i++) sc[i] = lut[data[seq_start + i]];
        for (int64_t i = L; i < max_len; i++) sc[i] = 4;
        lengths[rec] = static_cast<int32_t>(L);
        pos++;
        if (pos >= n || data[pos] != '+') return -1;
        while (pos < n && data[pos] != '\n') pos++;
        pos++;
        int64_t q_start = pos;
        while (pos < n && data[pos] != '\n') pos++;
        if (pos - q_start != L) return -1;
        uint8_t* q = quals + rec * static_cast<int64_t>(max_len);
        for (int64_t i = 0; i < L; i++) q[i] = data[q_start + i] - 33;
        for (int64_t i = L; i < max_len; i++) q[i] = 0;
        pos++;
        rec++;
    }
    return rec;
}

// Bulk bed-window line formatting for faFindFast's short output — the
// per-window "chrom\tstart\tend\tchrom_start\tmuts\n" lines dominate the
// vectorized scan (cmd/faFindFast semantics; scan math is numpy prefix
// sums host-side). Returns bytes written, or -1 if buf is too small.
static inline char* put_i64(char* p, int64_t v) {
    if (v < 0) { *p++ = '-'; v = -v; }
    char tmp[20];
    int k = 0;
    do { tmp[k++] = (char)('0' + v % 10); v /= 10; } while (v);
    while (k) *p++ = tmp[--k];
    return p;
}

int64_t format_bed_windows(const char* name, const int64_t* s,
                           const int64_t* e, const int64_t* m, int64_t n,
                           char* buf, int64_t buf_len) {
    size_t name_len = std::strlen(name);
    char* p = buf;
    char* end = buf + buf_len;
    for (int64_t i = 0; i < n; i++) {
        if ((size_t)(end - p) < 2 * name_len + 70) return -1;
        std::memcpy(p, name, name_len); p += name_len; *p++ = '\t';
        p = put_i64(p, s[i]); *p++ = '\t';
        p = put_i64(p, e[i]); *p++ = '\t';
        std::memcpy(p, name, name_len); p += name_len; *p++ = '_';
        p = put_i64(p, s[i]); *p++ = '\t';
        p = put_i64(p, m[i]); *p++ = '\n';
    }
    return p - buf;
}

// Bulk SAM line formatting for the batched read aligner's emit path
// (tpu_align.finish_batch_lines): per-read Sam-object assembly +
// f-string joins were the serial host cost bounding multi-chip scaling.
// Layout matches io/sam.py Sam.to_string byte-for-byte.
//   qnames/names: '\n'-joined tables; rsel < 0 means rname "*".
//   cig_off/cig_cnt index into run_lens/run_ops (forward order, clips
//   included); cnt == 0 emits "*".
//   has_as != 0 appends "\tAS:i:<score>".
// Returns bytes written, or -1 if buf is too small.
int64_t format_sam_lines(const uint8_t* qnames, int64_t qnames_len,
                         const uint8_t* names, int64_t names_len,
                         const int32_t* flags, const int32_t* rsel,
                         const int32_t* poss, const int32_t* mapqs,
                         const int64_t* scores, const uint8_t* has_as,
                         const int8_t* seqs, const uint8_t* quals,
                         const int32_t* lens, int32_t L,
                         const int32_t* cig_off, const int32_t* cig_cnt,
                         const int32_t* run_lens, const uint8_t* run_ops,
                         int64_t B, char* buf, int64_t buf_len) {
    static const char BASE_CHR[16] = {'A', 'C', 'G', 'T', 'N', 'a', 'c',
                                      'g', 't', 'n', '-', '.', '*', 'N',
                                      'N', 'N'};
    // split the chrom-name table
    std::vector<const uint8_t*> nm;
    std::vector<size_t> nm_len;
    {
        int64_t s = 0;
        for (int64_t i = 0; i <= names_len; i++) {
            if (i == names_len || names[i] == '\n') {
                nm.push_back(names + s);
                nm_len.push_back(i - s);
                s = i + 1;
            }
        }
    }
    char* p = buf;
    char* end = buf + buf_len;
    int64_t q = 0;
    for (int64_t b = 0; b < B; b++) {
        int64_t q0 = q;
        while (q < qnames_len && qnames[q] != '\n') q++;
        int32_t cnt = cig_cnt[b];
        if (end - p < (q - q0) + 2 * (int64_t)L + 12 * (cnt + 8) + 64)
            return -1;
        std::memcpy(p, qnames + q0, q - q0);
        p += q - q0;
        q++;  // skip '\n'
        *p++ = '\t';
        p = put_i64(p, flags[b]); *p++ = '\t';
        if (rsel[b] < 0) {
            *p++ = '*';
        } else {
            std::memcpy(p, nm[rsel[b]], nm_len[rsel[b]]);
            p += nm_len[rsel[b]];
        }
        *p++ = '\t';
        p = put_i64(p, poss[b]); *p++ = '\t';
        p = put_i64(p, mapqs[b]); *p++ = '\t';
        if (cnt == 0) {
            *p++ = '*';
        } else {
            for (int32_t k = 0; k < cnt; k++) {
                p = put_i64(p, run_lens[cig_off[b] + k]);
                *p++ = (char)run_ops[cig_off[b] + k];
            }
        }
        *p++ = '\t'; *p++ = '*'; *p++ = '\t'; *p++ = '0'; *p++ = '\t';
        *p++ = '0'; *p++ = '\t';
        const int8_t* sq = seqs + b * (int64_t)L;
        for (int32_t i = 0; i < lens[b]; i++)
            *p++ = BASE_CHR[sq[i] & 15];
        *p++ = '\t';
        const uint8_t* ql = quals + b * (int64_t)L;
        for (int32_t i = 0; i < lens[b]; i++)
            *p++ = (char)(ql[i] + 33);
        if (has_as[b]) {
            std::memcpy(p, "\tAS:i:", 6); p += 6;
            p = put_i64(p, scores[b]);
        }
        *p++ = '\n';
    }
    return p - buf;
}

// faFindFast short-format scan: one pass over the alignment builds
// per-base event values (the incrementWindowEdge outputs of
// cmd/faFindFast/efficient.go:34-269 in the prefix-sum algebra of
// cli/fa_find_fast.py, which is golden-tested), then threads sweep
// disjoint window ranges with O(1) edge updates, formatting bed lines
// into private buffers. Codes are the dna.py alphabet (A..T=0..3, N=4,
// a..t=5..8, n=9, GAP=10).
// Returns bytes written, 0 if fewer than W query bases, -1 on overflow.
int64_t fa_find_windows(const int8_t* ref, const int8_t* fq,
                        const int8_t* sq, int64_t n, int32_t W,
                        int32_t remove_n, const char* name, char* buf,
                        int64_t cap, int32_t nthreads) {
    const int8_t GAP = 10, NBASE = 4;
    auto define_base = [](int8_t x) {
        return (x >= 0 && x <= 3) || (x >= 5 && x <= 8);
    };
    // clean-mode pre-scan: with no gaps anywhere the window algebra
    // collapses to windowed substitutions with identity coordinates
    // (cs = ws, ce = ws + W) — the common whole-chromosome case
    {
        bool clean = true;
        for (int64_t j = 0; j < n && clean; j++)
            clean = ref[j] != GAP && fq[j] != GAP && sq[j] != GAP;
        if (clean && n >= W) {
            std::vector<int8_t> subst(n), isn;
            for (int64_t j = 0; j < n; j++) {
                int8_t fb = fq[j], sb = sq[j];
                subst[j] = fb != sb && define_base(fb) && define_base(sb);
            }
            if (remove_n) {
                isn.resize(n);
                for (int64_t j = 0; j < n; j++)
                    isn[j] = (fq[j] == NBASE) + (sq[j] == NBASE);
            }
            int64_t n_win = n - W + 1;
            if (nthreads < 1) nthreads = 1;
            if (nthreads > n_win) nthreads = 1;
            int64_t chunk = (n_win + nthreads - 1) / nthreads;
            size_t name_len = std::strlen(name);
            std::vector<std::vector<char>> outs(nthreads);
            std::vector<int64_t> out_len(nthreads, 0);
            auto work = [&](int t) {
                int64_t w0 = t * chunk;
                int64_t w1 = w0 + chunk < n_win ? w0 + chunk : n_win;
                if (w0 >= w1) return;
                std::vector<char>& ob = outs[t];
                ob.resize((w1 - w0) * (2 * name_len + 48) + 96);
                char* out = ob.data();
                int64_t s_sub = 0, s_nn = 0;
                for (int64_t k = w0; k < w0 + W; k++) {
                    s_sub += subst[k];
                    if (remove_n) s_nn += isn[k];
                }
                // incremental line template: successive cs/ce advance by
                // one, so their decimal strings are incremented in place
                // and only the muts tail is reformatted per window
                char line[96];
                int cs1_end = 0, cs2_end = 0, ce_end = 0, muts_off = 0;
                int64_t cs = w0;
                auto rebuild = [&]() {
                    char* p = line;
                    std::memcpy(p, name, name_len); p += name_len;
                    *p++ = '\t';
                    p = put_i64(p, cs); cs1_end = (int)(p - line);
                    *p++ = '\t';
                    p = put_i64(p, cs + W); ce_end = (int)(p - line);
                    *p++ = '\t';
                    std::memcpy(p, name, name_len); p += name_len;
                    *p++ = '_';
                    p = put_i64(p, cs); cs2_end = (int)(p - line);
                    *p++ = '\t';
                    muts_off = (int)(p - line);
                };
                auto inc_dec = [&](int end_idx) {
                    // increment the decimal string ending at end_idx-1;
                    // returns false on digit-count rollover
                    char* d = line + end_idx - 1;
                    while (*d == '9') {
                        *d-- = '0';
                        if (*d < '0' || *d > '9') return false;
                    }
                    (*d)++;
                    return true;
                };
                rebuild();
                for (int64_t ws = w0; ws < w1; ws++) {
                    if (ws > w0) {
                        s_sub += subst[ws + W - 1] - subst[ws - 1];
                        if (remove_n) s_nn += isn[ws + W - 1] - isn[ws - 1];
                        cs = ws;
                        if (!inc_dec(cs1_end) || !inc_dec(ce_end) ||
                            !inc_dec(cs2_end))
                            rebuild();
                    }
                    if (remove_n && s_nn != 0) continue;
                    char* p = line + muts_off;
                    p = put_i64(p, s_sub);
                    *p++ = '\n';
                    std::memcpy(out, line, p - line);
                    out += p - line;
                }
                out_len[t] = out - ob.data();
            };
            if (nthreads == 1) {
                work(0);
            } else {
                std::vector<std::thread> pool;
                for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
                for (auto& th : pool) th.join();
            }
            int64_t total = 0;
            for (int t = 0; t < nthreads; t++) total += out_len[t];
            if (total > cap) return -1;
            char* p = buf;
            for (int t = 0; t < nthreads; t++) {
                std::memcpy(p, outs[t].data(), out_len[t]);
                p += out_len[t];
            }
            return total;
        }
    }
    // phase A: per-fq-base events
    std::vector<int8_t> subst, nn, run_oc, op, cl, ref_nongap;
    std::vector<int32_t> run_ns, refcnt;
    int64_t est = n;  // K <= n
    subst.reserve(est); nn.reserve(est); run_oc.reserve(est);
    op.reserve(est); cl.reserve(est); ref_nongap.reserve(est);
    run_ns.reserve(est); refcnt.reserve(est);
    int32_t rcnt = 0;
    int32_t cur_run_ns = 0;
    int8_t cur_run_oc = 0;
    bool prev_sq_gap = false, have_prev = false;
    for (int64_t j = 0; j < n; j++) {
        if (fq[j] == GAP) {
            if (sq[j] == NBASE) cur_run_ns++;
            if (sq[j] != GAP) cur_run_oc = 1;
        } else {
            int8_t fb = fq[j], sb = sq[j];
            bool sg = sb == GAP;
            subst.push_back(fb != sb && define_base(fb) && define_base(sb));
            nn.push_back((fb == NBASE) + (sb == NBASE));
            run_ns.push_back(cur_run_ns);
            run_oc.push_back(cur_run_oc);
            op.push_back(sg && (!have_prev || !prev_sq_gap));
            cl.push_back(!sg && have_prev && prev_sq_gap);
            refcnt.push_back(rcnt);
            ref_nongap.push_back(ref[j] != GAP);
            cur_run_ns = 0; cur_run_oc = 0;
            prev_sq_gap = sg; have_prev = true;
        }
        if (ref[j] != GAP) rcnt++;
    }
    int64_t K = (int64_t)subst.size();
    if (K < W) return 0;
    int64_t n_win = K - W + 1;
    // prefix sums of op/cl for thread-start initialization
    std::vector<int64_t> Cop(K + 1), Ccl(K + 1);
    for (int64_t k = 0; k < K; k++) {
        Cop[k + 1] = Cop[k] + op[k];
        Ccl[k + 1] = Ccl[k] + cl[k];
    }
    if (nthreads < 1) nthreads = 1;
    if (nthreads > n_win) nthreads = 1;
    int64_t chunk = (n_win + nthreads - 1) / nthreads;
    size_t name_len = std::strlen(name);
    // data-dependent tracking: alignments with no gaps (or no Ns) skip
    // the corresponding edge updates entirely — the common clean-window
    // case costs one subst update + formatting per window
    bool track_gaps = Cop[K] > 0 || Ccl[K] > 0;
    bool track_n = remove_n;
    if (!track_gaps)
        for (int64_t k = 0; k < K && !track_gaps; k++)
            if (run_oc[k]) track_gaps = true;
    std::vector<std::vector<char>> outs(nthreads);
    std::vector<int64_t> out_len(nthreads, 0);
    auto work = [&](int t) {
        int64_t w0 = t * chunk;
        int64_t w1 = w0 + chunk < n_win ? w0 + chunk : n_win;
        if (w0 >= w1) return;
        std::vector<char>& ob = outs[t];
        ob.resize((w1 - w0) * (2 * name_len + 48) + 96);
        char* p = ob.data();
        // window sums at ws = w0
        int64_t s_sub = 0, s_nn = 0, s_rns = 0, s_roc = 0;
        for (int64_t k = w0; k < w0 + W; k++) {
            s_sub += subst[k];
            s_nn += nn[k];
            if (k > w0) { s_rns += run_ns[k]; s_roc += run_oc[k]; }
        }
        int64_t op_cum = Cop[w0 + W];  // sum op[0..ws+W-1]
        int64_t cl_cum = Ccl[w0 + 1];  // sum cl[0..ws]
        for (int64_t ws = w0; ws < w1; ws++) {
            if (ws > w0) {
                s_sub += subst[ws + W - 1] - subst[ws - 1];
                if (track_n)
                    s_nn += nn[ws + W - 1] - nn[ws - 1];
                if (track_gaps) {
                    if (track_n)
                        s_rns += run_ns[ws + W - 1] - run_ns[ws];
                    s_roc += run_oc[ws + W - 1] - run_oc[ws];
                    op_cum += op[ws + W - 1];
                    cl_cum += cl[ws];
                }
            }
            if (!ref_nongap[ws] || !ref_nongap[ws + W - 1]) continue;
            if (remove_n && s_nn + s_rns != 0) continue;
            int64_t muts = s_sub + s_roc + op_cum - cl_cum;
            int64_t cs = refcnt[ws];
            int64_t ce = refcnt[ws + W - 1] + 1;  // ref_nongap at last edge
            std::memcpy(p, name, name_len); p += name_len; *p++ = '\t';
            char* digs = p;
            p = put_i64(p, cs); *p++ = '\t';
            size_t cs_len = (size_t)(p - digs) - 1;
            p = put_i64(p, ce); *p++ = '\t';
            std::memcpy(p, name, name_len); p += name_len; *p++ = '_';
            std::memcpy(p, digs, cs_len); p += cs_len; *p++ = '\t';
            p = put_i64(p, muts); *p++ = '\n';
        }
        out_len[t] = p - ob.data();
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    int64_t total = 0;
    for (int t = 0; t < nthreads; t++) total += out_len[t];
    if (total > cap) return -1;
    char* p = buf;
    for (int t = 0; t < nthreads; t++) {
        std::memcpy(p, outs[t].data(), out_len[t]);
        p += out_len[t];
    }
    return total;
}

// Scatter pileup runs into a dense (span x 13 x 2) int32 count tensor
// for one chromosome — the hot np.add.at/repeat expansion of
// pileup._dense_from_runs done in one C pass. Threads split the
// position range [lo, lo+span); each clips every run to its range, so
// writes never race (a run touches <=2 ranges in practice).
// counts must be zero-initialized by the caller.
// cnt2 (span x 13, strand-summed) and depth (span) are filled in the
// same pass — they feed callVariants' vectorized prescreen without
// extra numpy reductions over the dense tensor.
int32_t runs_to_counts(const int32_t* starts, const int32_t* lens,
                       const uint8_t* fwds, const int32_t* ridx,
                       const int8_t* bases, int64_t n_runs,
                       int32_t want_refidx, int64_t lo, int64_t span,
                       int32_t* counts, int16_t* counts16,
                       int32_t* cnt2, int32_t* depth,
                       int32_t nthreads) {
    // per-run base offsets (prefix sum over ALL runs)
    std::vector<int64_t> boff(n_runs);
    int64_t acc = 0;
    for (int64_t r = 0; r < n_runs; r++) {
        boff[r] = acc;
        acc += lens[r];
    }
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (span + nthreads - 1) / nthreads;
    // The random-write scatter pass is cache/bandwidth bound: int32x26
    // rows measured ~40% slower than int16x26, so the preferred output
    // is the caller-provided int16 tensor (counts16). Saturation of any
    // cell (needs >32k coverage of one base+strand at one position)
    // returns 1 and the caller retries in int32 mode.
    std::vector<uint8_t> sat(nthreads, 0);
    auto scatter = [&](int t, auto* tgt) {
        int64_t r_lo = lo + t * chunk;
        int64_t r_hi = r_lo + chunk;
        if (r_hi > lo + span) r_hi = lo + span;
        if (r_lo >= r_hi) return;
        for (int64_t r = 0; r < n_runs; r++) {
            if (ridx[r] != want_refidx) continue;
            int64_t s = starts[r];
            int64_t e = s + lens[r];
            if (e <= r_lo || s >= r_hi) continue;
            int64_t cs = s < r_lo ? r_lo : s;
            int64_t ce = e > r_hi ? r_hi : e;
            const int8_t* bp = bases + boff[r] + (cs - s);
            int32_t strand = fwds[r];
            for (int64_t p = cs; p < ce; p++) {
                int64_t bb = (int64_t)(*bp++);
                if (++tgt[(p - lo) * 26 + bb * 2 + strand] == 0x7FFF)
                    sat[t] = 1;
            }
        }
    };
    auto run_pool = [&](auto fn) {
        if (nthreads == 1) {
            fn(0);
        } else {
            std::vector<std::thread> pool;
            for (int t = 0; t < nthreads; t++) pool.emplace_back(fn, t);
            for (auto& th : pool) th.join();
        }
    };
    if (counts16) {
        run_pool([&](int t) { scatter(t, counts16); });
        for (int t = 0; t < nthreads; t++)
            if (sat[t]) return 1;  // caller retries in int32 mode
    } else {
        run_pool([&](int t) { scatter(t, counts); });
    }
    // derive the strand-summed matrix + depth in one sequential sweep
    auto sweep = [&](int t) {
        int64_t r_lo = t * chunk, r_hi = r_lo + chunk;
        if (r_hi > span) r_hi = span;
        for (int64_t rel = r_lo; rel < r_hi; rel++) {
            int32_t dtot = 0;
            if (counts16) {
                const int16_t* row = counts16 + rel * 26;
                for (int64_t bb = 0; bb < 13; bb++) {
                    int32_t v = (int32_t)row[bb * 2]
                                + (int32_t)row[bb * 2 + 1];
                    cnt2[rel * 13 + bb] = v;
                    dtot += v;
                }
            } else {
                const int32_t* row = counts + rel * 26;
                for (int64_t bb = 0; bb < 13; bb++) {
                    int32_t v = row[bb * 2] + row[bb * 2 + 1];
                    cnt2[rel * 13 + bb] = v;
                    dtot += v;
                }
            }
            depth[rel] = dtot;
        }
    };
    run_pool(sweep);
    return 0;
}

// Batched binary search over the sorted k-mer code table (the read
// aligner's seed lookup): lower/upper bound per query, threaded. The
// numpy searchsorted pair held the GIL and dominated host prep on
// multi-GB tables (cache-miss bound); this version splits queries
// across threads and runs lock-free.
void lookup_u64(const uint64_t* table, int64_t n, const uint64_t* q,
                int64_t nq, int32_t* lo_out, int32_t* hi_out,
                int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (nq + nthreads - 1) / nthreads;
    auto work = [&](int t) {
        int64_t a = t * chunk;
        int64_t b = a + chunk < nq ? a + chunk : nq;
        for (int64_t i = a; i < b; i++) {
            uint64_t v = q[i];
            const uint64_t* lo = std::lower_bound(table, table + n, v);
            const uint64_t* hi = std::upper_bound(lo, table + n, v);
            lo_out[i] = (int32_t)(lo - table);
            hi_out[i] = (int32_t)(hi - table);
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
}

// Packed 2-bit walk ops -> forward flattened cigar runs with soft
// clips, for the whole batch (tpu_align unpack_ops + _flat_cigars in
// one threaded pass). Crumb codes 0=M, 1=D, 2=I, 3=stop; the walk is
// backward, so forward order reverses the runs. Returns total run
// count, or -1 if run_cap is too small. mapped[b] is updated in place
// (cleared when the walk has no ops).
int64_t walk_to_cigars(const uint8_t* packed, int64_t B, int64_t P,
                       int64_t D, const int32_t* i0, const int32_t* i_end,
                       const int32_t* lens, uint8_t* mapped,
                       int32_t* cig_off, int32_t* cig_cnt,
                       int32_t* run_lens, uint8_t* run_ops,
                       int64_t run_cap, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (B + nthreads - 1) / nthreads;
    // pass 1: per-read backward-RLE into scratch, counts only
    std::vector<int32_t> nmid(B);
    auto pass1 = [&](int t) {
        int64_t b0 = t * chunk, b1 = b0 + chunk < B ? b0 + chunk : B;
        for (int64_t b = b0; b < b1; b++) {
            const uint8_t* pk = packed + b * P;
            int32_t runs = 0;
            int prev = -1;
            for (int64_t j = 0; j < D; j++) {
                int code = (pk[j >> 2] >> ((j & 3) * 2)) & 3;
                if (code == 3) break;
                if (code != prev) runs++;
                prev = code;
            }
            nmid[b] = runs;
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(pass1, t);
        for (auto& th : pool) th.join();
    }
    int64_t total = 0;
    for (int64_t b = 0; b < B; b++) {
        bool m = mapped[b] && nmid[b] > 0;
        mapped[b] = m;
        int32_t lead = m && i0[b] > 0;
        int32_t trail = m && i_end[b] < lens[b];
        cig_cnt[b] = m ? nmid[b] + lead + trail : 0;
        cig_off[b] = (int32_t)total;
        total += cig_cnt[b];
    }
    if (total > run_cap) return -1;
    // pass 2: fill runs forward (reverse of the walk) + clips
    auto pass2 = [&](int t) {
        int64_t b0 = t * chunk, b1 = b0 + chunk < B ? b0 + chunk : B;
        const uint8_t OPS[3] = {'M', 'D', 'I'};
        for (int64_t b = b0; b < b1; b++) {
            if (!mapped[b]) continue;
            const uint8_t* pk = packed + b * P;
            int32_t lead = i0[b] > 0;
            int32_t trail = i_end[b] < lens[b];
            int32_t base = cig_off[b];
            if (lead) {
                run_lens[base] = i0[b];
                run_ops[base] = 'S';
            }
            if (trail) {
                int32_t k = base + cig_cnt[b] - 1;
                run_lens[k] = lens[b] - i_end[b];
                run_ops[k] = 'S';
            }
            // write mid runs back-to-front of the mid segment
            int32_t w = base + lead + nmid[b] - 1;
            int prev = -1;
            int32_t rl = 0;
            for (int64_t j = 0; j < D; j++) {
                int code = (pk[j >> 2] >> ((j & 3) * 2)) & 3;
                if (code == 3) break;
                if (code != prev && prev != -1) {
                    run_lens[w] = rl;
                    run_ops[w] = OPS[prev];
                    w--;
                    rl = 0;
                }
                rl++;
                prev = code;
            }
            if (prev != -1) {
                run_lens[w] = rl;
                run_ops[w] = OPS[prev];
            }
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(pass2, t);
        for (auto& th : pool) th.join();
    }
    return total;
}

namespace {

// one strand's modal-diagonal vote, replicating tpu_align._vote exactly:
// sort the <=K*H candidate diagonals (invalid = -1), longest equal run
// wins (ties -> the earlier/smaller diagonal), runner-up = longest run
// with the winner masked out.
void vote_one(int64_t* diags, int n, int64_t* diag_out, int64_t* votes_out,
              int64_t* second_out) {
    std::sort(diags, diags + n);
    int64_t best_len = -1, best_diag = -1;
    {
        int run = 0;
        for (int j = 0; j < n; j++) {
            run = (j > 0 && diags[j] == diags[j - 1]) ? run + 1 : 0;
            int64_t r = diags[j] == -1 ? -1 : run;
            if (r > best_len) {
                best_len = r;
                best_diag = diags[j];
            }
        }
    }
    if (best_diag == -1) {
        *diag_out = -1;
        *votes_out = 0;
    } else {
        *diag_out = best_diag;
        *votes_out = best_len + 1;
    }
    // runner-up on the masked list (numpy: masked == -1 entries and the
    // winner excluded from run formation)
    int64_t sec = 0;
    bool any = false;
    int run2 = 0;
    int64_t prev = INT64_MIN;
    for (int j = 0; j < n; j++) {
        int64_t v = diags[j] == best_diag ? -1 : diags[j];
        if (v != -1) any = true;
        run2 = (j > 0 && v == prev && v != -1) ? run2 + 1 : 0;
        if (run2 + 1 > sec) sec = run2 + 1;
        prev = v;
    }
    *second_out = any ? sec : 0;
}

}  // namespace

// Seed lookup + modal-diagonal voting for a whole read batch in one
// threaded pass (tpu_align._candidates: _batch_codes + searchsorted +
// _vote). Exactly the numpy semantics, including the
// runner-up-vs-other-strand max. k-mer windows containing any code >= 4
// never match (the sentinel-code rule).
void seed_vote(const int8_t* fwd, const int8_t* rev, int64_t B, int64_t L,
               const int32_t* offs, int32_t K, int32_t k,
               const uint64_t* table, const int32_t* tpos, int64_t n,
               int32_t H,
               int64_t* diag_out, int64_t* votes_out, int64_t* second_out,
               uint8_t* strand_out, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (B + nthreads - 1) / nthreads;
    auto work = [&](int t) {
        std::vector<int64_t> dbuf((size_t)K * H);
        int64_t b0 = t * chunk;
        int64_t b1 = b0 + chunk < B ? b0 + chunk : B;
        for (int64_t b = b0; b < b1; b++) {
            int64_t dv[2], vv[2], sv[2];
            for (int s = 0; s < 2; s++) {
                const int8_t* seq = (s == 0 ? fwd : rev) + b * L;
                int idx = 0;
                for (int32_t q = 0; q < K; q++) {
                    int32_t off = offs[q];
                    uint64_t code = 0;
                    bool bad = false;
                    for (int32_t i = 0; i < k; i++) {
                        int8_t c = seq[off + i];
                        if (c >= 4 || c < 0) bad = true;
                        code = (code << 2) | (uint64_t)(c & 3);
                    }
                    int64_t lo = 0, hi = 0;
                    if (!bad) {
                        const uint64_t* l =
                            std::lower_bound(table, table + n, code);
                        const uint64_t* h =
                            std::upper_bound(l, table + n, code);
                        lo = l - table;
                        hi = h - table;
                        if (hi > lo + H) hi = lo + H;
                    }
                    for (int32_t j = 0; j < H; j++)
                        dbuf[idx++] = lo + j < hi
                            ? (int64_t)tpos[lo + j] - off : -1;
                }
                vote_one(dbuf.data(), idx, &dv[s], &vv[s], &sv[s]);
            }
            bool use_fwd = vv[0] >= vv[1];
            diag_out[b] = use_fwd ? dv[0] : dv[1];
            votes_out[b] = use_fwd ? vv[0] : vv[1];
            int64_t oth = use_fwd ? vv[1] : vv[0];
            int64_t sec = use_fwd ? sv[0] : sv[1];
            second_out[b] = sec > oth ? sec : oth;
            strand_out[b] = use_fwd ? 1 : 0;
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
}

// callVariants candidate prescreen over the dense per-sample count
// arrays (the numpy body of cli/call_variants.py's per-chromosome loop,
// done in one threaded C pass): computes per-sample exists/depth rows,
// the experimental count sum, and the candidate-site mask — exactly
// getPossibleAlts' non-empty condition (testVariant.go:166-285).
//   cnt2s[s]  : (span_s, 13) int32 strand-summed counts
//   depths_in : (span_s,) int32 base depths
//   offs/spans: per-sample placement within [lo, lo+L)
//   ins_pos/ins_tot: per-sample insertion positions (ABSOLUTE) + total
//   counts (f+r); concatenated, indexed by ins_off[s]..ins_off[s+1]
//   refarr    : chromosome base codes (1-based positions p -> refarr[p-1])
// Outputs: exists (n_samp, L) u8, depth_out (n_samp, L) i32,
// expsum (L, 13) i32, cand/indel_pos (L) u8. Returns n_sites (union of
// exists) as int64.
int64_t cv_prescreen(const int32_t** cnt2s, const int32_t** depths_in,
                     const int64_t* offs, const int64_t* spans,
                     const int32_t* ins_pos, const int32_t* ins_tot,
                     const int64_t* ins_off,
                     const int32_t* del_pos, const int64_t* del_off,
                     int32_t n_samp, int32_t n_exp, int64_t L, int64_t lo,
                     const int8_t* refarr, int64_t ref_len,
                     int32_t min_coverage,
                     uint8_t* exists, int32_t* depth_out, int32_t* expsum,
                     uint8_t* cand, uint8_t* indel_pos,
                     int32_t nthreads) {
    std::memset(exists, 0, (size_t)n_samp * L);
    std::memset(depth_out, 0, (size_t)n_samp * L * 4);
    std::memset(expsum, 0, (size_t)L * 13 * 4);
    std::memset(cand, 0, (size_t)L);
    std::memset(indel_pos, 0, (size_t)L);
    if (nthreads < 1) nthreads = 1;
    int64_t chunk = (L + nthreads - 1) / nthreads;
    // dense depth placement (ins corrections applied after, sparse)
    auto work = [&](int t) {
        int64_t r_lo = t * chunk;
        int64_t r_hi = r_lo + chunk < L ? r_lo + chunk : L;
        for (int s = 0; s < n_samp; s++) {
            const int32_t* dep = depths_in[s];
            int64_t off = offs[s], span = spans[s];
            int64_t a = r_lo > off ? r_lo : off;
            int64_t b = r_hi < off + span ? r_hi : off + span;
            int32_t* drow = depth_out + (size_t)s * L;
            for (int64_t p = a; p < b; p++) drow[p] = dep[p - off];
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    // sparse insertion corrections (depth += total; touched flag via
    // nonzero depth OR an ins at the position)
    for (int s = 0; s < n_samp; s++) {
        int32_t* drow = depth_out + (size_t)s * L;
        for (int64_t k = ins_off[s]; k < ins_off[s + 1]; k++) {
            int64_t p = (int64_t)ins_pos[k] - lo;
            if (p >= 0 && p < L) drow[p] += ins_tot[k];
        }
    }
    // exists / expsum / cand
    auto work2 = [&](int t) {
        int64_t r_lo = t * chunk;
        int64_t r_hi = r_lo + chunk < L ? r_lo + chunk : L;
        for (int s = 0; s < n_samp; s++) {
            const int32_t* cnt = cnt2s[s];
            const int32_t* dep0 = depths_in[s];
            int64_t off = offs[s], span = spans[s];
            int32_t* drow = depth_out + (size_t)s * L;
            uint8_t* erow = exists + (size_t)s * L;
            for (int64_t p = r_lo; p < r_hi; p++) {
                bool in_span = p >= off && p < off + span;
                bool touched = (in_span && dep0[p - off] > 0) ||
                               (drow[p] > (in_span ? dep0[p - off] : 0));
                if (touched && drow[p] >= min_coverage) {
                    erow[p] = 1;
                    if (s < n_exp && in_span) {
                        const int32_t* row = cnt + (size_t)(p - off) * 13;
                        int32_t* es = expsum + (size_t)p * 13;
                        for (int c = 0; c < 13; c++) es[c] += row[c];
                    }
                }
            }
        }
        for (int64_t p = r_lo; p < r_hi; p++) {
            // SNV evidence = row total minus ref-base and Gap columns
            int64_t gp = lo + p;  // 1-based genome position
            int ref_code = 4;     // N
            if (gp >= 1 && gp <= ref_len) {
                int rc = refarr[gp - 1];
                if (rc >= 5 && rc <= 9) rc -= 5;  // to_upper
                ref_code = rc;
            }
            const int32_t* es = expsum + (size_t)p * 13;
            int64_t tot = 0;
            for (int c = 0; c < 13; c++) tot += es[c];
            int cc = ref_code < 0 ? 0 : (ref_code > 12 ? 12 : ref_code);
            tot -= es[cc];
            if (cc != 10) tot -= es[10];  // Gap column
            bool exp_any = false;
            for (int s = 0; s < n_exp && !exp_any; s++)
                exp_any = exists[(size_t)s * L + p] != 0;
            cand[p] = exp_any && tot > 0;
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work2, t);
        for (auto& th : pool) th.join();
    }
    // indel positions + indel evidence -> cand (sparse, serial)
    for (int s = 0; s < n_samp; s++) {
        for (int64_t k = ins_off[s]; k < ins_off[s + 1]; k++) {
            int64_t p = (int64_t)ins_pos[k] - lo;
            if (p >= 0 && p < L) {
                indel_pos[p] = 1;
                if (s < n_exp && exists[(size_t)s * L + p] &&
                    ins_tot[k] > 0)
                    cand[p] = 1;
            }
        }
        for (int64_t k = del_off[s]; k < del_off[s + 1]; k++) {
            int64_t p = (int64_t)del_pos[k] - lo;
            if (p >= 0 && p < L) {
                indel_pos[p] = 1;
                if (s < n_exp && exists[(size_t)s * L + p]) cand[p] = 1;
            }
        }
    }
    int64_t n_sites = 0;
    for (int64_t p = 0; p < L; p++) {
        bool any = false;
        for (int s = 0; s < n_samp && !any; s++)
            any = exists[(size_t)s * L + p] != 0;
        n_sites += any;
    }
    return n_sites;
}

// SAM-text -> pileup scatter runs: tokenizes alignment lines and walks
// cigars into flat (start, len, fwd, refidx) runs with base codes (GAP
// for deletions), plus sparse del/ins event lists — the C++ host-layer
// form of sam.GoPileup's per-read walk (sam/pileup.go:221-311) feeding
// the dense count scatter. Semantics replicate gonomics_tpu.pileup
// exactly: terminal-insertion soft-clip rewriting, mapq filter, unmapped
// skip, strand = fwd unless (paired && !first-of-pair).
// Returns 0, or -1 on malformed input / capacity overflow.
int sam_scatter(const uint8_t* text, int64_t n,
                const uint8_t* names, int64_t names_len, int32_t min_mapq,
                int32_t* run_start, int32_t* run_len, uint8_t* run_fwd,
                int32_t* run_refidx, int64_t run_cap,
                int8_t* bases, int64_t base_cap,
                int32_t* del_ev, int64_t del_cap,
                int32_t* ins_ev, int64_t ins_cap,
                uint8_t* ins_str, int64_t ins_str_cap,
                int64_t* counts_out) {
    static int8_t lut[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; i++) lut[i] = 4;
        lut['A'] = 0; lut['C'] = 1; lut['G'] = 2; lut['T'] = 3;
        lut['a'] = 0; lut['c'] = 1; lut['g'] = 2; lut['t'] = 3;
        lut['-'] = 10; lut['.'] = 11; lut['*'] = 12;
        init = true;
    }
    // chrom name table
    std::vector<const uint8_t*> nm;
    std::vector<size_t> nm_len;
    {
        int64_t s = 0;
        for (int64_t i = 0; i <= names_len; i++) {
            if (i == names_len || names[i] == '\n') {
                nm.push_back(names + s);
                nm_len.push_back(i - s);
                s = i + 1;
            }
        }
    }
    int64_t n_runs = 0, n_bases = 0, n_del = 0, n_ins = 0, ins_off = 0;
    int64_t pos_i = 0;
    struct Op { int32_t len; char op; };
    std::vector<Op> cig;
    while (pos_i < n) {
        int64_t line_end = pos_i;
        while (line_end < n && text[line_end] != '\n') line_end++;
        if (text[pos_i] == '@') { pos_i = line_end + 1; continue; }
        // field boundaries
        const uint8_t* f[12];
        size_t flen[12];
        int nf = 0;
        int64_t fs = pos_i;
        for (int64_t i = pos_i; i <= line_end && nf < 12; i++) {
            if (i == line_end || text[i] == '\t') {
                f[nf] = text + fs;
                flen[nf] = i - fs;
                nf++;
                fs = i + 1;
            }
        }
        pos_i = line_end + 1;
        if (nf < 11) return -1;
        auto to_int = [](const uint8_t* p, size_t l) {
            int64_t v = 0;
            for (size_t i = 0; i < l; i++) v = v * 10 + (p[i] - '0');
            return v;
        };
        int32_t flag = (int32_t)to_int(f[1], flen[1]);
        int32_t mapq = (int32_t)to_int(f[4], flen[4]);
        // unmapped cigar check first (matches python path order)
        if (flen[5] == 1 && f[5][0] == '*') continue;
        if (mapq < min_mapq) continue;
        // parse cigar
        cig.clear();
        {
            int32_t v = 0;
            for (size_t i = 0; i < flen[5]; i++) {
                uint8_t c = f[5][i];
                if (c >= '0' && c <= '9') v = v * 10 + (c - '0');
                else { cig.push_back({v, (char)c}); v = 0; }
            }
        }
        if (cig.empty()) continue;
        // _sclip_terminal_ins
        if (cig.front().op == 'I') cig.front().op = 'S';
        if (cig.back().op == 'I') cig.back().op = 'S';
        if (cig.size() >= 2 && cig[0].op == 'S' && cig[1].op == 'I') {
            cig[1].op = 'S';
            cig[1].len += cig[0].len;
            cig.erase(cig.begin());
        }
        if (cig.size() >= 2 && cig[cig.size() - 1].op == 'S' &&
            cig[cig.size() - 2].op == 'I') {
            cig[cig.size() - 2].op = 'S';
            cig[cig.size() - 2].len += cig.back().len;
            cig.pop_back();
        }
        // refidx
        int32_t refidx = -1;
        for (size_t i = 0; i < nm.size(); i++) {
            if (nm_len[i] == flen[2] &&
                std::memcmp(nm[i], f[2], flen[2]) == 0) {
                refidx = (int32_t)i;
                break;
            }
        }
        if (refidx < 0) return -1;
        int32_t fwd = (!(flag & 1) || (flag & 64)) ? 0 : 1;
        int32_t ref_pos = (int32_t)to_int(f[3], flen[3]);
        int64_t seq_pos = 0;
        const uint8_t* seq = f[9];
        for (const Op& c : cig) {
            if (c.op == 'M' || c.op == '=' || c.op == 'X') {
                if (n_runs >= run_cap || n_bases + c.len > base_cap)
                    return -1;
                run_start[n_runs] = ref_pos;
                run_len[n_runs] = c.len;
                run_fwd[n_runs] = (uint8_t)fwd;
                run_refidx[n_runs] = refidx;
                n_runs++;
                for (int32_t i = 0; i < c.len; i++)
                    bases[n_bases + i] = lut[seq[seq_pos + i]];
                n_bases += c.len;
                ref_pos += c.len;
                seq_pos += c.len;
            } else if (c.op == 'D') {
                if (n_runs >= run_cap || n_del >= del_cap ||
                    n_bases + c.len > base_cap)
                    return -1;
                del_ev[n_del * 4] = refidx;
                del_ev[n_del * 4 + 1] = ref_pos;
                del_ev[n_del * 4 + 2] = c.len;
                del_ev[n_del * 4 + 3] = fwd;
                n_del++;
                run_start[n_runs] = ref_pos;
                run_len[n_runs] = c.len;
                run_fwd[n_runs] = (uint8_t)fwd;
                run_refidx[n_runs] = refidx;
                n_runs++;
                for (int32_t i = 0; i < c.len; i++)
                    bases[n_bases + i] = 10;  // dna.GAP
                n_bases += c.len;
                ref_pos += c.len;
            } else if (c.op == 'I') {
                if (n_ins >= ins_cap || ins_off + c.len > ins_str_cap)
                    return -1;
                ins_ev[n_ins * 5] = refidx;
                ins_ev[n_ins * 5 + 1] = ref_pos - 1;
                ins_ev[n_ins * 5 + 2] = fwd;
                ins_ev[n_ins * 5 + 3] = (int32_t)ins_off;
                ins_ev[n_ins * 5 + 4] = c.len;
                // normalized spelling (code -> char), matching the
                // python path's dna.to_string(codes) keys
                static const char BCH[13] = {'A', 'C', 'G', 'T', 'N', 'a',
                                             'c', 'g', 't', 'n', '-', '.',
                                             '*'};
                for (int32_t i = 0; i < c.len; i++)
                    ins_str[ins_off + i] = BCH[(int)lut[seq[seq_pos + i]]];
                ins_off += c.len;
                n_ins++;
                seq_pos += c.len;
            } else {
                // N consumes ref; S consumes query; H/P neither
                if (c.op == 'N') ref_pos += c.len;
                if (c.op == 'S') seq_pos += c.len;
            }
        }
    }
    counts_out[0] = n_runs;
    counts_out[1] = n_bases;
    counts_out[2] = n_del;
    counts_out[3] = n_ins;
    counts_out[4] = ins_off;
    return 0;
}

// ---- sparse genome-scale seed index (round 5) ----------------------
// The dense (code u64, pos i32) table costs ~12 B/bp and its binary
// search goes cache-miss bound at multi-hundred-MB tables (PERF_NOTES
// r4). The sparse design stores ONLY step-sampled positions sorted by
// k-mer code, found via a two-level structure: a 2^BB-entry bucket
// offset table on the code's top BB bits plus a uint16 remainder column
// (the next 16 code bits) searched within the bucket; full codes are
// recomputed from the genome only for remainder matches. Steady RSS
// ~(4+2)/step B/bp + genome. Reference analog: the 32-bit packed,
// step-sampled gsw index (genomeGraph/index.go:21-57).

static inline uint64_t code_at(const int8_t* g, int64_t p, int k) {
    uint64_t c = 0;
    for (int i = 0; i < k; i++) c = (c << 2) | (uint64_t)g[p + i];
    return c;
}

int64_t sparse_index_build(const int8_t* genome, int64_t n, int32_t k,
                           int32_t step, int32_t BB,
                           int32_t* pos_out, uint16_t* rem_out,
                           int64_t* bucket_off, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int64_t nb = (int64_t)1 << BB;
    int rem_sh = 2 * k - BB - 16;  // may be negative for tiny k
    int64_t n_pos = n >= k ? (n - k) / step + 1 : 0;
    // pass 1+2: per-thread histograms over sampled valid windows, then
    // placement at global offsets
    int64_t chunk = (n_pos + nthreads - 1) / nthreads;
    std::vector<std::vector<int64_t>> hist(nthreads);
    auto scan = [&](int t, bool place,
                    std::vector<int64_t>* cursors) {
        std::vector<int64_t>& h = hist[t];
        if (!place) h.assign(nb, 0);
        int64_t i0 = t * chunk;
        int64_t i1 = i0 + chunk < n_pos ? i0 + chunk : n_pos;
        for (int64_t i = i0; i < i1; i++) {
            int64_t p = i * step;
            bool ok = true;
            uint64_t c = 0;
            for (int j = 0; j < k; j++) {
                int8_t b = genome[p + j];
                if (b < 0 || b >= 4) { ok = false; break; }
                c = (c << 2) | (uint64_t)b;
            }
            if (!ok) continue;
            int64_t bkt = (int64_t)(c >> (2 * k - BB));
            if (!place) {
                h[bkt]++;
            } else {
                pos_out[(*cursors)[bkt]++] = (int32_t)p;
            }
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++)
            pool.emplace_back(scan, t, false, nullptr);
        for (auto& th : pool) th.join();
    }
    // global bucket offsets + per-thread cursors
    std::vector<std::vector<int64_t>> cursors(nthreads);
    for (int t = 0; t < nthreads; t++) cursors[t].assign(nb, 0);
    int64_t acc = 0;
    for (int64_t b = 0; b < nb; b++) {
        bucket_off[b] = acc;
        int64_t c0 = acc;
        for (int t = 0; t < nthreads; t++) {
            cursors[t][b] = c0;
            c0 += hist[t][b];
        }
        acc = c0;
    }
    bucket_off[nb] = acc;
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++)
            pool.emplace_back(scan, t, true, &cursors[t]);
        for (auto& th : pool) th.join();
    }
    // pass 3: per-bucket sort by (full code, pos) — positions ascending
    // within equal codes keeps dense-index hit order — then remainders
    int64_t bchunk = (nb + nthreads - 1) / nthreads;
    auto sortb = [&](int t) {
        std::vector<std::pair<uint64_t, int32_t>> tmp;
        int64_t b0 = t * bchunk;
        int64_t b1 = b0 + bchunk < nb ? b0 + bchunk : nb;
        for (int64_t b = b0; b < b1; b++) {
            int64_t lo = bucket_off[b], hi = bucket_off[b + 1];
            if (hi - lo > 1) {
                tmp.clear();
                for (int64_t i = lo; i < hi; i++)
                    tmp.emplace_back(code_at(genome, pos_out[i], k),
                                     pos_out[i]);
                std::sort(tmp.begin(), tmp.end());
                for (int64_t i = lo; i < hi; i++) {
                    pos_out[i] = tmp[i - lo].second;
                    rem_out[i] = rem_sh >= 0
                        ? (uint16_t)((tmp[i - lo].first >> rem_sh)
                                     & 0xFFFF)
                        : (uint16_t)((tmp[i - lo].first
                                      << (-rem_sh)) & 0xFFFF);
                }
            } else if (hi - lo == 1) {
                uint64_t c = code_at(genome, pos_out[lo], k);
                rem_out[lo] = rem_sh >= 0
                    ? (uint16_t)((c >> rem_sh) & 0xFFFF)
                    : (uint16_t)((c << (-rem_sh)) & 0xFFFF);
            }
        }
    };
    {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(sortb, t);
        for (auto& th : pool) th.join();
    }
    return acc;
}

void sparse_seed_vote(const int8_t* fwd, const int8_t* rev, int64_t B,
                      int64_t L, int32_t k,
                      const int8_t* genome, int64_t n,
                      const int32_t* pos, const uint16_t* rem,
                      const int64_t* bucket_off, int32_t BB,
                      int32_t max_hits,
                      int64_t* diag_out, int64_t* votes_out,
                      int64_t* second_out, uint8_t* strand_out,
                      int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    int rem_sh = 2 * k - BB - 16;
    int64_t chunk = (B + nthreads - 1) / nthreads;
    const uint64_t mask = k == 32 ? ~0ULL : ((1ULL << (2 * k)) - 1);
    auto work = [&](int t) {
        std::vector<int64_t> diags;
        diags.reserve(512);
        int64_t b0 = t * chunk;
        int64_t b1 = b0 + chunk < B ? b0 + chunk : B;
        for (int64_t b = b0; b < b1; b++) {
            int64_t best_d[2] = {0, 0}, best_v[2] = {0, 0},
                    best_s[2] = {0, 0};
            for (int s = 0; s < 2; s++) {
                const int8_t* rd = (s == 0 ? fwd : rev) + b * L;
                diags.clear();
                uint64_t code = 0;
                int64_t last_bad = -1;
                for (int64_t p = 0; p < L; p++) {
                    int8_t bb = rd[p];
                    if (bb < 0 || bb >= 4) { last_bad = p; bb = 0; }
                    code = ((code << 2) | (uint64_t)bb) & mask;
                    int64_t rs = p - k + 1;
                    if (rs < 0 || last_bad >= rs) continue;
                    int64_t bkt = (int64_t)(code >> (2 * k - BB));
                    int64_t lo = bucket_off[bkt], hi = bucket_off[bkt + 1];
                    if (lo >= hi) continue;
                    uint16_t r16 = rem_sh >= 0
                        ? (uint16_t)((code >> rem_sh) & 0xFFFF)
                        : (uint16_t)((code << (-rem_sh)) & 0xFFFF);
                    const uint16_t* rlo = std::lower_bound(rem + lo,
                                                           rem + hi, r16);
                    const uint16_t* rhi = std::upper_bound(rlo, rem + hi,
                                                           r16);
                    int taken = 0;
                    for (const uint16_t* it = rlo;
                         it != rhi && taken < max_hits; it++) {
                        int64_t idx = it - rem;
                        int64_t gp = pos[idx];
                        if (gp + k <= n
                            && code_at(genome, gp, k) == code) {
                            diags.push_back(gp - rs);
                            taken++;
                        }
                    }
                }
                int64_t d = 0, v = 0, sec = 0;
                if (!diags.empty()) {
                    std::sort(diags.begin(), diags.end());
                    vote_one(diags.data(), (int)diags.size(), &d, &v,
                             &sec);
                }
                best_d[s] = d;
                best_v[s] = v;
                best_s[s] = sec;
            }
            int use = best_v[0] >= best_v[1] ? 0 : 1;
            int oth = 1 - use;
            diag_out[b] = best_d[use];
            votes_out[b] = best_v[use];
            int64_t sec = best_s[use] > best_v[oth] ? best_s[use]
                                                    : best_v[oth];
            second_out[b] = sec;
            strand_out[b] = use == 0 ? 1 : 0;
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
}

// Vectorized-SNV decision pass of callVariants (the C form of
// cli/call_variants._vector_snv_pass, testVariant.go:307-388 cascade):
// for every candidate site, for every experimental sample and possible
// alt base, run the exclusion cascade + one-sided Fisher tail and flag
// sites where any (sample, alt) passes p < max_p. Passing sites re-run
// the exact scalar caller, so this pass only needs to be no-miss; the
// Fisher initial term uses lgamma (the python path's log-factorial
// cumsum agrees to ~1e-14 and callers apply a 1e-9 margin).
int64_t cv_snv_pass(const void** counts, const int64_t* clo,
                    const int64_t* cspan,
                    const uint8_t* exists, const int32_t* depths,
                    const int32_t* expsum, const int8_t* ref_codes,
                    const int64_t* idx, int64_t C, int64_t L, int64_t lo,
                    int32_t n_samp, int32_t n_exp,
                    double max_p, double min_af, double max_af,
                    double max_sb, int32_t min_coverage,
                    int32_t min_alt_reads, int32_t counts_are_16,
                    uint8_t* site_pass, int32_t nthreads) {
    (void)lo;
    auto cell = [&](int s, int64_t rel, int i) -> int64_t {
        return counts_are_16
            ? (int64_t)((const int16_t*)counts[s])[rel * 26 + i]
            : (int64_t)((const int32_t*)counts[s])[rel * 26 + i];
    };
    if (nthreads < 1) nthreads = 1;
    const double thresh = max_p * (1 + 1e-9);
    int64_t chunk = (C + nthreads - 1) / nthreads;
    auto lf = [](int64_t x) { return lgamma((double)x + 1.0); };
    auto work = [&](int t) {
        int64_t k0 = t * chunk;
        int64_t k1 = k0 + chunk < C ? k0 + chunk : C;
        for (int64_t k = k0; k < k1; k++) {
            int64_t p = idx[k];
            site_pass[k] = 0;
            // per-sample (13,2) gathers, masked by exists
            bool has_norm = false;
            for (int s = n_exp; s < n_samp && !has_norm; s++)
                has_norm = exists[(size_t)s * L + p] != 0;
            int64_t Bc[13][2] = {};
            int64_t dep_b = 0;
            for (int s = has_norm ? n_exp : 0;
                 s < (has_norm ? n_samp : n_exp); s++) {
                if (!exists[(size_t)s * L + p]) continue;
                int64_t rel = p - clo[s];
                if (counts[s] && rel >= 0 && rel < cspan[s]) {
                    for (int c = 0; c < 13; c++) {
                        Bc[c][0] += cell(s, rel, c * 2);
                        Bc[c][1] += cell(s, rel, c * 2 + 1);
                    }
                }
                dep_b += depths[(size_t)s * L + p];
            }
            int rc_code = ref_codes[p];
            if (rc_code < 0) rc_code = 0;
            if (rc_code > 12) rc_code = 12;
            const int32_t* es = expsum + (size_t)p * 13;
            for (int e = 0; e < n_exp && !site_pass[k]; e++) {
                if (!exists[(size_t)e * L + p]) continue;
                int64_t rel = p - clo[e];
                bool in_e = counts[e] && rel >= 0 && rel < cspan[e];
                int64_t dep_e = depths[(size_t)e * L + p];
                for (int alt = 0; alt < 13; alt++) {
                    if (es[alt] <= 0 || alt == rc_code || alt == 10)
                        continue;  // 10 = Gap column
                    int64_t fwd = in_e ? cell(e, rel, alt * 2) : 0;
                    int64_t c = in_e ? cell(e, rel, alt * 2)
                                       + cell(e, rel, alt * 2 + 1)
                                     : 0;
                    int64_t dall = Bc[alt][0] + Bc[alt][1];
                    int64_t a = dep_e - c;
                    int64_t b = dep_b - dall;
                    int64_t d = dall;
                    if (!has_norm) { b -= a; d -= c; }
                    double fsb = (double)fwd / (double)c;
                    if (fsb > max_sb || fsb < 1 - max_sb) continue;
                    if (c < min_alt_reads) continue;
                    if (a == b && c == d) continue;
                    double rc = (double)c / (double)(c + a);
                    double rd = (double)d / (double)(d + b);
                    if (rc < rd) continue;
                    if (a + c < min_coverage) continue;
                    if (rc < min_af || rc > max_af) continue;
                    int64_t n = a + b + c + d;
                    double curr = exp(lf(a + b) + lf(c + d) + lf(a + c)
                                      + lf(b + d) - lf(n) - lf(a) - lf(b)
                                      - lf(c) - lf(d));
                    double total = curr;
                    while (a > 0 && d > 0) {
                        a--; b++; c++; d--;
                        curr *= (double)(a + 1) / (double)c
                                * (double)(d + 1) / (double)b;
                        total += curr;
                    }
                    if (total < thresh) { site_pass[k] = 1; break; }
                }
            }
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    int64_t np = 0;
    for (int64_t k = 0; k < C; k++) np += site_pass[k];
    return np;
}

// Graph-aligner batched seed hits (the host loop of
// gsw.find_seeds_batch, reference genomeGraph/search.go:425-589 +
// index.go:21-98 semantics): for every read row (fwd/rc interleaved),
// roll 2-bit k-mer codes over N-free windows, binary-search the sorted
// (code -> node<<32|pos) table, and for each hit compute the maximal
// exact-match run through the node plus the boundary-crossing flags.
// Emits (row, rs, node, rs0, np0, right_run, cross_right, maybe_left)
// int64 rows in row-major probe order — exactly the emission order of
// the numpy path. Returns total hits (caller re-calls with a bigger
// buffer when it exceeds cap). Threaded over rows, GIL-free.
int64_t graph_hits(const int8_t* seq, int64_t R2, int64_t Lmax,
                   const int32_t* row_len, int32_t k,
                   const uint64_t* codes, int64_t ncodes,
                   const int64_t* packed,
                   const int8_t* concat,
                   const int64_t* noff, const int64_t* nlen,
                   const uint8_t* has_next, const int32_t* prev_cnt,
                   int64_t* out, int64_t cap, int32_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    std::vector<std::vector<int64_t>> bufs(nthreads);
    int64_t rows_per = (R2 + nthreads - 1) / nthreads;
    auto work = [&](int t) {
        std::vector<int64_t>& buf = bufs[t];
        int64_t r0 = t * rows_per;
        int64_t r1 = r0 + rows_per < R2 ? r0 + rows_per : R2;
        const uint64_t mask = k == 32 ? ~0ULL
                                      : ((1ULL << (2 * k)) - 1);
        for (int64_t row = r0; row < r1; row++) {
            const int8_t* s = seq + row * Lmax;
            int64_t L = row_len[row];
            if (L < k) continue;
            uint64_t code = 0;
            int64_t last_bad = -1;
            for (int64_t p = 0; p < L; p++) {
                int8_t b = s[p];
                if (b >= 4 || b < 0) { last_bad = p; b = 0; }
                code = ((code << 2) | (uint64_t)b) & mask;
                int64_t rs = p - k + 1;
                if (rs < 0 || last_bad >= rs) continue;
                const uint64_t* lo = std::lower_bound(codes,
                                                      codes + ncodes, code);
                const uint64_t* hi = std::upper_bound(lo, codes + ncodes,
                                                      code);
                for (const uint64_t* it = lo; it != hi; it++) {
                    int64_t pk = packed[it - codes];
                    int64_t node = pk >> 32;
                    int64_t npos = pk & 0xFFFFFFFF;
                    const int8_t* g = concat + noff[node];
                    // maximal run: left from (npos, rs) inclusive
                    int64_t lt = npos + 1 < rs + 1 ? npos + 1 : rs + 1;
                    int64_t i = 0;
                    while (i < lt && g[npos - i] == s[rs - i]) i++;
                    int64_t rs0 = rs - (i - 1);
                    int64_t np0 = npos - (i - 1);
                    int64_t rt = nlen[node] - np0 < L - rs0
                                     ? nlen[node] - np0 : L - rs0;
                    int64_t j = 0;
                    while (j < rt && g[np0 + j] == s[rs0 + j]) j++;
                    int64_t cross = (rs0 + j < L && np0 + j == nlen[node]
                                     && has_next[node]) ? 1 : 0;
                    int64_t mleft = (row % 2 == 0 && rs0 > 0 && np0 == 0
                                     && prev_cnt[node] > 0) ? 1 : 0;
                    buf.push_back(row);
                    buf.push_back(rs);
                    buf.push_back(node);
                    buf.push_back(rs0);
                    buf.push_back(np0);
                    buf.push_back(j);
                    buf.push_back(cross);
                    buf.push_back(mleft);
                }
            }
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < nthreads; t++) pool.emplace_back(work, t);
        for (auto& th : pool) th.join();
    }
    int64_t total = 0;
    for (auto& b : bufs) total += (int64_t)(b.size() / 8);
    if (total * 8 <= cap * 8 && total <= cap) {
        int64_t off = 0;
        for (auto& b : bufs) {
            if (!b.empty())
                memcpy(out + off, b.data(), b.size() * sizeof(int64_t));
            off += (int64_t)b.size();
        }
    }
    return total;
}

}  // extern "C"
