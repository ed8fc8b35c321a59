// Single-threaded affine-gap (Gotoh) DP baseline, the performance class of
// the reference Go implementation (align/affineGap.go:151-207). Used by
// bench.py to measure the CPU-baseline GCUPS denominator on this machine,
// since no Go toolchain is available to run the reference itself.
//
// Usage: affine_baseline <n> <m> <iters> [seed]
// Prints: cells_per_second

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <thread>
#include <vector>

static const int64_t NEG = INT64_MIN / 2;

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s n m iters [seed]\n", argv[0]);
        return 1;
    }
    int n = std::atoi(argv[1]);
    int m = std::atoi(argv[2]);
    int iters = std::atoi(argv[3]);
    unsigned seed = argc > 4 ? std::atoi(argv[4]) : 0;
    int T = argc > 5 ? std::atoi(argv[5]) : 1;  // worker threads

    std::mt19937 rng(seed);
    std::uniform_int_distribution<int> base(0, 3);
    std::vector<int8_t> a(n), b(m);
    for (auto& x : a) x = base(rng);
    for (auto& x : b) x = base(rng);

    // humanChimpTwo matrix values (align.go:57-64)
    int64_t S[5][5] = {
        {90, -330, -236, -356, -208},
        {-330, 100, -318, -236, -196},
        {-236, -318, 100, -330, -196},
        {-356, -236, -330, 90, -208},
        {-208, -196, -196, -208, -202},
    };
    int64_t go = -600, ge = -150;

    volatile int64_t sink_g = 0;
    auto t0 = std::chrono::steady_clock::now();
    auto worker = [&](int tid, int my_iters) {
        std::vector<int64_t> Mp(m + 1), Ip(m + 1), Dp(m + 1);
        std::vector<int64_t> Mc(m + 1), Ic(m + 1), Dc(m + 1);
        int64_t sink = 0;
        for (int it = 0; it < my_iters; ++it) {
            Mp[0] = 0; Ip[0] = go; Dp[0] = go;
            for (int j = 1; j <= m; ++j) {
                Mp[j] = NEG; Ip[j] = Ip[j - 1] + ge; Dp[j] = NEG;
            }
            for (int i = 1; i <= n; ++i) {
                Mc[0] = NEG; Ic[0] = NEG; Dc[0] = Dp[0] + ge;
                const int64_t* srow = S[a[i - 1]];
                for (int j = 1; j <= m; ++j) {
                    int64_t s = srow[b[j - 1]];
                    int64_t mm = Mp[j - 1], ii = Ip[j - 1], dd = Dp[j - 1];
                    int64_t best = mm > ii ? mm : ii;
                    if (dd > best) best = dd;
                    Mc[j] = s + best;
                    int64_t o1 = go + ge + Mc[j - 1], o2 = ge + Ic[j - 1],
                            o3 = go + ge + Dc[j - 1];
                    int64_t bi = o1 > o2 ? o1 : o2;
                    if (o3 > bi) bi = o3;
                    Ic[j] = bi;
                    int64_t d1 = go + ge + Mp[j], d2 = go + ge + Ip[j],
                            d3 = ge + Dp[j];
                    int64_t bd = d1 > d2 ? d1 : d2;
                    if (d3 > bd) bd = d3;
                    Dc[j] = bd;
                }
                std::swap(Mp, Mc); std::swap(Ip, Ic); std::swap(Dp, Dc);
            }
            int64_t fin = Mp[m] > Ip[m] ? Mp[m] : Ip[m];
            if (Dp[m] > fin) fin = Dp[m];
            sink += fin;
        }
        sink_g += sink;
    };
    if (T <= 1) {
        worker(0, iters);
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < T; t++)
            pool.emplace_back(worker, t, (iters + T - 1) / T);
        for (auto& th : pool) th.join();
        iters = ((iters + T - 1) / T) * T;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double cells = double(n) * double(m) * double(iters);
    std::printf("%.6e\n", cells / secs);
    (void)sink_g;
    return 0;
}
