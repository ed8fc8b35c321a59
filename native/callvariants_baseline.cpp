// Single-threaded pileup + per-site Fisher-exact baseline, the
// performance class of the reference callVariants hot path: the linked
// pileup walk (sam/pileup.go:221-311) becomes a count scatter over
// (position x base x strand), and each covered site pays sumPiles +
// getPossibleAlts + one 2x2 Fisher exact test per alt
// (cmd/callVariants/testVariant.go:27-388, numbers.FisherExact via
// log-gamma).
//
// Usage: callvariants_baseline <genome_len> <n_reads> <read_len> [seed]
// Prints: sites_per_second n_variants

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <atomic>
#include <thread>
#include <vector>

static double log_hyp(int a, int b, int c, int d) {
    // log P(table | margins) via lgamma, the FisherExact kernel
    return std::lgamma(a + b + 1.0) + std::lgamma(c + d + 1.0) +
           std::lgamma(a + c + 1.0) + std::lgamma(b + d + 1.0) -
           std::lgamma(a + 1.0) - std::lgamma(b + 1.0) -
           std::lgamma(c + 1.0) - std::lgamma(d + 1.0) -
           std::lgamma(a + b + c + d + 1.0);
}

static double fisher_left(int a, int b, int c, int d) {
    // one-sided (less) exact test: sum tables with a' <= a
    double p = 0;
    int lo = std::max(0, a - d);
    for (int x = lo; x <= a; x++)
        p += std::exp(log_hyp(x, a + b - x, a + c - x, d - a + x));
    return p;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s genome_len n_reads read_len [seed]\n",
                     argv[0]);
        return 1;
    }
    long g = std::atol(argv[1]);
    long reads = std::atol(argv[2]);
    int L = std::atoi(argv[3]);
    unsigned seed = argc > 4 ? std::atoi(argv[4]) : 0;
    int T = argc > 5 ? std::atoi(argv[5]) : 1;  // worker threads (the
        // reference fans out per-file pileup goroutines + site workers,
        // callVariants.go:63-66)

    std::mt19937 rng(seed);
    std::uniform_int_distribution<int> base(0, 3);
    std::uniform_real_distribution<double> u(0, 1);
    std::vector<int8_t> ref(g);
    for (long i = 0; i < g; i++) ref[i] = (int8_t)base(rng);

    auto t0 = std::chrono::steady_clock::now();
    // pileup: counts[pos][base][strand] for exp and norm samples;
    // threads scatter into private tensors, merged after (the per-file
    // goroutine shape of the reference)
    std::vector<uint16_t> exp_c(g * 8, 0), norm_c(g * 8, 0);
    std::uniform_int_distribution<long> startd(0, g - L);
    {
        int PT = T <= 1 ? 1 : T;
        std::vector<std::vector<uint16_t>> pe(PT), pn(PT);
        auto pile_worker = [&](int t) {
            std::vector<uint16_t>& ec = PT == 1 ? exp_c : pe[t];
            std::vector<uint16_t>& nc = PT == 1 ? norm_c : pn[t];
            if (PT > 1) {
                ec.assign(g * 8, 0);
                nc.assign(g * 8, 0);
            }
            std::mt19937 trng(seed + 1000003u * t);
            std::uniform_real_distribution<double> tu(0, 1);
            std::uniform_int_distribution<long> tstart(0, g - L);
            long lo_r = t * (reads / PT);
            long hi_r = t == PT - 1 ? reads : (t + 1) * (reads / PT);
            for (long r = lo_r; r < hi_r; r++) {
                long s = tstart(trng);
                int strand = (int)(r & 1);
                bool is_exp = (r & 2) == 0;
                auto& cnt = is_exp ? ec : nc;
                for (int j = 0; j < L; j++) {
                    int bb = ref[s + j];
                    if (tu(trng) < 0.01) bb = (bb + 1) & 3;
                    cnt[(s + j) * 8 + bb * 2 + strand]++;
                }
            }
        };
        if (PT == 1) {
            pile_worker(0);
        } else {
            std::vector<std::thread> pool;
            for (int t = 0; t < PT; t++) pool.emplace_back(pile_worker, t);
            for (auto& th : pool) th.join();
            for (int t = 0; t < PT; t++)
                for (long i = 0; i < g * 8; i++) {
                    exp_c[i] += pe[t][i];
                    norm_c[i] += pn[t][i];
                }
        }
    }
    // per-site: depth, possible alts, Fisher exact exp-vs-norm per alt
    std::atomic<long> sites_g{0}, variants_g{0};
    auto site_worker = [&](long p_lo, long p_hi) {
        long sites = 0, variants = 0;
        for (long p = p_lo; p < p_hi; p++) {
        int de = 0, dn = 0;
        int eb[4], nb[4];
        for (int bbb = 0; bbb < 4; bbb++) {
            eb[bbb] = exp_c[p * 8 + bbb * 2] + exp_c[p * 8 + bbb * 2 + 1];
            nb[bbb] = norm_c[p * 8 + bbb * 2] + norm_c[p * 8 + bbb * 2 + 1];
            de += eb[bbb];
            dn += nb[bbb];
        }
        if (de < 10) continue;
        sites++;
        int rb = ref[p];
        for (int bbb = 0; bbb < 4; bbb++) {
            if (bbb == rb || eb[bbb] == 0) continue;
            double pv = fisher_left(nb[bbb], nb[rb], eb[bbb], eb[rb]);
            if (pv < 0.001) variants++;
        }
    }
        sites_g += sites;
        variants_g += variants;
    };
    if (T <= 1) {
        site_worker(0, g);
    } else {
        std::vector<std::thread> pool;
        long chunk = (g + T - 1) / T;
        for (int t = 0; t < T; t++) {
            long lo = t * chunk, hi = lo + chunk < g ? lo + chunk : g;
            if (lo < hi) pool.emplace_back(site_worker, lo, hi);
        }
        for (auto& th : pool) th.join();
    }
    long sites = sites_g.load(), variants = variants_g.load();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::printf("%.0f %ld\n", sites / secs, variants);
    return 0;
}
