// Single-threaded sliding-window divergence baseline, the performance
// class of the reference faFindFast incremental scan
// (cmd/faFindFast/efficient.go:34-269): one pass over the alignment with
// O(1) window-edge updates of the mismatch count. Gap-free inputs so the
// counting semantics reduce to windowed mismatches (what the hot loop
// costs; the gap bookkeeping is a few extra branches per edge).
//
// Usage: fafindfast_baseline <len> <window> <iters> [seed]
// Prints: windows_per_second checksum

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <atomic>
#include <thread>
#include <vector>

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s len window iters [seed]\n", argv[0]);
        return 1;
    }
    long n = std::atol(argv[1]);
    int w = std::atoi(argv[2]);
    int iters = std::atoi(argv[3]);
    unsigned seed = argc > 4 ? std::atoi(argv[4]) : 0;
    int T = argc > 5 ? std::atoi(argv[5]) : 1;  // worker threads: the
        // sequence splits into per-thread position ranges, each scanned
        // with the same O(1) edge updates (a seam re-init per range)

    std::mt19937 rng(seed);
    std::uniform_int_distribution<int> base(0, 3);
    std::uniform_real_distribution<double> u(0, 1);
    std::vector<int8_t> a(n), b(n);
    for (long i = 0; i < n; i++) {
        a[i] = (int8_t)base(rng);
        b[i] = u(rng) < 0.02 ? (int8_t)base(rng) : a[i];
    }

    long n_windows = n - w + 1;
    std::atomic<uint64_t> checksum_g{0};
    auto t0 = std::chrono::steady_clock::now();
    auto worker = [&](long s_lo, long s_hi) {
        uint64_t checksum = 0;
        char line[128];
        for (int it = 0; it < iters; it++) {
            int diff = 0;
            for (int j = 0; j < w; j++)
                diff += a[s_lo + j] != b[s_lo + j];
            checksum += (uint64_t)diff;
            for (long s = s_lo + 1; s < s_hi; s++) {
                diff -= a[s - 1] != b[s - 1];          // leaving edge
                diff += a[s + w - 1] != b[s + w - 1];  // entering edge
                // the real tool formats a bed line per window
                // (faFindFast.go writes chrom\tstart\tend\tname\tmuts)
                int len = std::snprintf(line, sizeof line,
                                        "chr1\t%ld\t%ld\tchr1_%ld\t%d\n",
                                        s, s + w, s, diff);
                checksum += (uint64_t)(diff + len);
            }
        }
        checksum_g += checksum;
    };
    if (T <= 1) {
        worker(0, n_windows);
    } else {
        std::vector<std::thread> pool;
        long chunk = (n_windows + T - 1) / T;
        for (int t = 0; t < T; t++) {
            long lo = t * chunk;
            long hi = lo + chunk < n_windows ? lo + chunk : n_windows;
            if (lo < hi) pool.emplace_back(worker, lo, hi);
        }
        for (auto& th : pool) th.join();
    }
    uint64_t checksum = checksum_g.load();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::printf("%.0f %llu\n", (double)n_windows * iters / secs,
                (unsigned long long)checksum);
    return 0;
}
