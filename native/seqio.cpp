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

}  // extern "C"
