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

}  // extern "C"
