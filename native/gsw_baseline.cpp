// Single-threaded seed-and-extend read-aligner baseline, the performance
// class of the reference gsw hot path on a linear genome
// (genomeGraph/search.go, toGiraf.go, index.go): kmer index lookup,
// exact-match seed extension, left/right extension DPs over windows
// sized by the reference's extension rule (perfect/600 + readLen), the
// seedCouldBeBetter break, and a formatted SAM-class output line per
// read. The reference prints reads/s from its own timed run
// (genomeGraph/genomeGraph_test.go:57) but records no number; this
// binary supplies the missing denominator (BASELINE.md measurement plan
// item 2) on this host.
//
// Usage: gsw_baseline <genome_len> <n_reads> <read_len> [seed]
// Prints: reads_per_second checksum

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <atomic>
#include <thread>
#include <unordered_map>
#include <vector>

static const int SEED_LEN = 32;
static const int STEP = 32;
static const int64_t SCORES[5][5] = {
    {90, -330, -236, -356, -208},
    {-330, 100, -318, -236, -196},
    {-236, -318, 100, -330, -196},
    {-356, -236, -330, 90, -208},
    {-208, -196, -196, -208, -202}};
static const int64_t GAP = -600;

struct Aln {
    int64_t score;
    long pos;
    bool fwd;
};

// suffix-anchored local DP (LeftDynamicAln class): full matrix +
// traceback walk into an op buffer, like the reference's route builds
static int64_t left_dp(const int8_t* win, int wn, const int8_t* read,
                       int rn, std::vector<int64_t>& mat,
                       std::vector<uint8_t>& trace, uint8_t* route,
                       int& route_len) {
    int W = rn + 1;
    mat.assign((size_t)(wn + 1) * W, 0);
    trace.assign((size_t)(wn + 1) * W, 0);
    for (int i = 1; i <= wn; i++) {
        int64_t* row = mat.data() + (size_t)i * W;
        int64_t* prev = row - W;
        uint8_t* tr = trace.data() + (size_t)i * W;
        for (int j = 1; j <= rn; j++) {
            int64_t d = prev[j - 1] + SCORES[win[i - 1]][read[j - 1]];
            int64_t u = prev[j] + GAP;
            int64_t l = row[j - 1] + GAP;
            int64_t best = d >= u ? (d >= l ? d : l) : (u >= l ? u : l);
            tr[j] = d >= l && d >= u ? 0 : (l >= u ? 1 : 2);
            row[j] = best > 0 ? best : 0;
        }
    }
    int i = wn, j = rn;
    route_len = 0;
    while (i > 0 && j > 0 && mat[(size_t)i * W + j] > 0) {
        uint8_t op = trace[(size_t)i * W + j];
        route[route_len++] = op;
        if (op == 0) { i--; j--; }
        else if (op == 1) j--;
        else i--;
    }
    return mat[(size_t)wn * W + rn];
}

// prefix-anchored DP with penalized boundaries (RightDynamicAln class):
// full matrix, row-major-first best cell, walk to origin
static int64_t right_dp(const int8_t* win, int wn, const int8_t* read,
                        int rn, std::vector<int64_t>& mat,
                        std::vector<uint8_t>& trace, uint8_t* route,
                        int& route_len) {
    int W = rn + 1;
    mat.assign((size_t)(wn + 1) * W, 0);
    trace.assign((size_t)(wn + 1) * W, 0);
    for (int j = 0; j <= rn; j++) {
        mat[j] = (int64_t)j * GAP;
        trace[j] = 1;
    }
    int64_t best_all = 0;
    int bi = 0, bj = 0;
    for (int i = 1; i <= wn; i++) {
        int64_t* row = mat.data() + (size_t)i * W;
        int64_t* prev = row - W;
        uint8_t* tr = trace.data() + (size_t)i * W;
        row[0] = (int64_t)i * GAP;
        tr[0] = 2;
        for (int j = 1; j <= rn; j++) {
            int64_t d = prev[j - 1] + SCORES[win[i - 1]][read[j - 1]];
            int64_t u = prev[j] + GAP;
            int64_t l = row[j - 1] + GAP;
            int64_t best = d >= u ? (d >= l ? d : l) : (u >= l ? u : l);
            tr[j] = d >= l && d >= u ? 0 : (l >= u ? 1 : 2);
            row[j] = best;
            if (best > best_all) { best_all = best; bi = i; bj = j; }
        }
    }
    int i = bi, j = bj;
    route_len = 0;
    while (i > 0 || j > 0) {
        uint8_t op = trace[(size_t)i * W + j];
        route[route_len++] = op;
        if (op == 0) { i--; j--; }
        else if (op == 1) j--;
        else i--;
    }
    return best_all;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s genome_len n_reads read_len [seed]\n",
                     argv[0]);
        return 1;
    }
    long G = std::atol(argv[1]);
    long n_reads = std::atol(argv[2]);
    int L = std::atoi(argv[3]);
    unsigned seed = argc > 4 ? std::atoi(argv[4]) : 0;
    int T = argc > 5 ? std::atoi(argv[5]) : 1;  // worker-pool threads
                                                // (gsw.go -t, default 4)

    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<int> base(0, 3);
    std::vector<int8_t> genome(G);
    for (long i = 0; i < G; i++) genome[i] = (int8_t)base(rng);

    // kmer index (IndexGenomeIntoMap class): 2-bit 32-mers every STEP
    std::unordered_map<uint64_t, std::vector<uint32_t>> index;
    index.reserve(G / STEP * 2);
    for (long p = 0; p + SEED_LEN <= G; p += STEP) {
        uint64_t code = 0;
        for (int i = 0; i < SEED_LEN; i++)
            code = (code << 2) | (uint64_t)genome[p + i];
        index[code].push_back((uint32_t)p);
    }

    // reads: genome substrings with 3 substitutions, half reverse-comp
    std::uniform_int_distribution<long> startd(0, G - L);
    std::uniform_int_distribution<int> posd(0, L - 1);
    std::vector<int8_t> reads(n_reads * (long)L);
    for (long r = 0; r < n_reads; r++) {
        long s = startd(rng);
        int8_t* rd = reads.data() + r * L;
        std::memcpy(rd, genome.data() + s, L);
        for (int e = 0; e < 3; e++) {
            int p = posd(rng);
            rd[p] = (int8_t)((rd[p] + 1) & 3);
        }
        if (r & 1) {  // reverse complement
            for (int i = 0, j = L - 1; i < j; i++, j--) {
                int8_t a = (int8_t)(3 - rd[i]), b = (int8_t)(3 - rd[j]);
                rd[i] = b;
                rd[j] = a;
            }
            if (L & 1) rd[L / 2] = (int8_t)(3 - rd[L / 2]);
        }
    }

    std::atomic<uint64_t> checksum_g{0};
    auto t0 = std::chrono::steady_clock::now();
    auto worker = [&](long r_lo, long r_hi) {
        uint64_t checksum = 0;
        char line[1024];
        std::vector<int64_t> mat;
        std::vector<uint8_t> trace;
        std::vector<uint8_t> route(4096);
        int route_len = 0;
        std::vector<int8_t> rc(L);
        for (long r = r_lo; r < r_hi; r++) {
        const int8_t* fwd = reads.data() + r * L;
        for (int i = 0; i < L; i++) rc[i] = (int8_t)(3 - fwd[L - 1 - i]);
        int64_t perfect = 0;
        for (int i = 0; i < L; i++) perfect += SCORES[fwd[i]][fwd[i]];
        long extension = perfect / 600 + L;
        Aln best{0, 0, true};
        for (int strand = 0; strand < 2; strand++) {
            const int8_t* rd = strand ? rc.data() : fwd;
            for (int rs = 0; rs + SEED_LEN <= L; rs++) {
                uint64_t code = 0;
                for (int i = 0; i < SEED_LEN; i++)
                    code = (code << 2) | (uint64_t)rd[rs + i];
                auto it = index.find(code);
                if (it == index.end()) continue;
                for (uint32_t hp : it->second) {
                    // exact extension both ways
                    long gl = hp, ql = rs;
                    while (gl > 0 && ql > 0 &&
                           genome[gl - 1] == rd[ql - 1]) {
                        gl--;
                        ql--;
                    }
                    long ge = hp + SEED_LEN, qe = rs + SEED_LEN;
                    while (ge < G && qe < L && genome[ge] == rd[qe]) {
                        ge++;
                        qe++;
                    }
                    long total = qe - ql;
                    // seedCouldBeBetter-class bound: a full-length exact
                    // seed ends the read's search
                    int64_t sc = 0;
                    for (long q = ql; q < qe; q++)
                        sc += SCORES[rd[q]][rd[q]];
                    if (total < L) {
                        long ext = extension - total;
                        long wl = gl > ext ? ext : gl;
                        long wr = (G - ge) > ext ? ext : (G - ge);
                        if (ql > 0) {
                            sc += left_dp(genome.data() + gl - wl,
                                          (int)wl, rd, (int)ql, mat, trace,
                                          route.data(), route_len);
                            checksum += (uint64_t)route_len;
                        }
                        if (qe < L) {
                            sc += right_dp(genome.data() + ge, (int)wr,
                                           rd + qe, (int)(L - qe), mat,
                                           trace, route.data(), route_len);
                            checksum += (uint64_t)route_len;
                        }
                    }
                    if (sc > best.score)
                        best = {sc, gl - ql, strand == 0};
                }
                if (best.score >= perfect - 3 * 446) break;  // class bound
            }
            if (best.score >= perfect - 3 * 446) break;
        }
        // SAM-class output line
        int len = std::snprintf(line, sizeof line,
                                "r%ld\t%d\tchr1\t%ld\t255\t%dM\t*\t0\t0\t"
                                "AS:i:%lld\n",
                                r, best.fwd ? 0 : 16, best.pos + 1, L,
                                (long long)best.score);
        checksum += (uint64_t)(len + best.score);
        }
        checksum_g += checksum;
    };
    if (T <= 1) {
        worker(0, n_reads);
    } else {
        std::vector<std::thread> pool;
        long chunk = (n_reads + T - 1) / T;
        for (int t = 0; t < T; t++) {
            long a = t * chunk, b = a + chunk < n_reads ? a + chunk : n_reads;
            if (a < b) pool.emplace_back(worker, a, b);
        }
        for (auto& th : pool) th.join();
    }
    uint64_t checksum = checksum_g.load();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::printf("%.0f %llu\n", n_reads / secs,
                (unsigned long long)checksum);
    return 0;
}
