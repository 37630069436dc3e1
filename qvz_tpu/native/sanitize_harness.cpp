// Standalone sanitizer harness for the threaded native runtime paths.
//
// Built by `make tsan` / `make asan` (see the top-level Makefile) as a
// single executable compiling qvz_rt.cpp with -fsanitize=thread or
// -fsanitize=address,undefined — a whole-process build is required for
// TSAN, which cannot instrument a ctypes-dlopen'd .so reliably.
//
// Exercises every concurrency site in the runtime:
//   1. qvz_design_create        — internal parallel_for over clusters/contexts
//   2. qvz_kmeans_iter          — internal row-block threads + integer merge
//   3. qvz_well_jump            — concurrent calls racing on the (call_once)
//                                 four-Russians power table
//   4. qvz_encode_fused_colmajor / qvz_decode_colmajor — one thread per
//                                 shard, as the QVZ2 pipeline drives them
// and asserts shard round-trips reconstruct identical symbols, so the
// harness is also a miniature correctness gate.

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "qvz_rt.h"

static const int A = 72;

int main() {
  const uint64_t n_lines = 6000;
  const uint32_t cols = 40;
  const uint32_t n_clusters = 2;

  // Synthetic Illumina-like data: random walk clipped to [0, 71].
  std::vector<uint8_t> data(n_lines * cols);
  uint64_t s = 0x9E3779B97F4A7C15ull;
  auto rnd = [&]() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  };
  for (uint64_t i = 0; i < n_lines; ++i) {
    int v = 20 + static_cast<int>(rnd() % 25);
    for (uint32_t c = 0; c < cols; ++c) {
      v += static_cast<int>(rnd() % 7) - 3;
      if (v < 0) v = 0;
      if (v > 71) v = 71;
      data[i * cols + c] = static_cast<uint8_t>(v);
    }
  }
  std::vector<uint8_t> clusters(n_lines);
  for (uint64_t i = 0; i < n_lines; ++i)
    clusters[i] = static_cast<uint8_t>(rnd() % n_clusters);

  // 1. Threaded k-means iteration.
  {
    std::vector<int64_t> means(n_clusters * cols);
    for (uint32_t k = 0; k < n_clusters; ++k)
      for (uint32_t c = 0; c < cols; ++c)
        means[k * cols + c] = data[(k * 97) * cols + c];
    std::vector<uint8_t> assign(n_lines);
    std::vector<int64_t> sums(n_clusters * cols), counts(n_clusters);
    for (int it = 0; it < 3; ++it)
      qvz_kmeans_iter(data.data(), n_lines, cols, means.data(), n_clusters,
                      assign.data(), sums.data(), counts.data());
    std::printf("kmeans_iter: ok\n");
  }

  // 2. Concurrent well_jump (races on the power-table build).
  uint32_t base_state[32];
  for (int i = 0; i < 32; ++i) base_state[i] = 0x55555555u;
  {
    std::vector<std::thread> ts;
    std::vector<std::vector<uint32_t>> outs(8);
    for (int t = 0; t < 8; ++t) {
      outs[t].resize(32 * 4);
      ts.emplace_back([&, t] {
        qvz_well_jump(base_state, 4, 1000 + 64ull * t, outs[t].data());
      });
    }
    for (auto& th : ts) th.join();
    std::printf("well_jump x8 concurrent: ok\n");
  }

  // 3. Threaded design (internal parallel_for).
  std::vector<uint64_t> c0(n_clusters * A, 0);
  std::vector<uint64_t> cc(static_cast<size_t>(n_clusters) * (cols - 1) * A *
                               A,
                           0);
  qvz_stats(data.data(), n_lines, cols, clusters.data(), c0.data(), cc.data());
  std::vector<double> dist(A * A);
  for (int x = 0; x < A; ++x)
    for (int y = 0; y < A; ++y)
      dist[x + A * y] = static_cast<double>((x - y) * (x - y));
  void* design = qvz_design_create(c0.data(), cc.data(), n_clusters, cols,
                                   /*MODE_RATIO=*/0, 0.5, dist.data());
  void* tables = qvz_tables_from_design(design);
  std::printf("design (threaded): ok\n");

  // 4. One encode+decode thread per shard (QVZ2 shape).
  {
    const int n_shards = 4;
    uint64_t per = (n_lines + n_shards - 1) / n_shards;
    per = (per + 3) & ~3ull;  // WELL pool-word boundary
    std::vector<uint32_t> states(static_cast<size_t>(n_shards) * 32);
    qvz_well_jump(base_state, n_shards, per * cols / 4, states.data());
    std::vector<std::vector<uint8_t>> payloads(n_shards);
    std::vector<std::vector<uint8_t>> recon(n_shards);
    std::vector<int64_t> plen(n_shards);
    std::vector<std::thread> ts;
    for (int t = 0; t < n_shards; ++t) {
      ts.emplace_back([&, t] {
        uint64_t lo = static_cast<uint64_t>(t) * per;
        uint64_t hi = lo + per;
        if (hi > n_lines) hi = n_lines;
        if (lo >= hi) return;
        uint64_t n = hi - lo;
        // column-major transpose of the shard
        std::vector<uint8_t> dt(cols * n);
        for (uint64_t i = 0; i < n; ++i)
          for (uint32_t c = 0; c < cols; ++c)
            dt[static_cast<size_t>(c) * n + i] = data[(lo + i) * cols + c];
        std::vector<uint8_t> cl(clusters.begin() + lo, clusters.begin() + hi);
        recon[t].resize(cols * n);
        double dsum = 0;
        int64_t cap = static_cast<int64_t>(n) * cols * 2 + 4096;
        payloads[t].resize(cap);
        int64_t r = qvz_encode_fused_colmajor(
            tables, dt.data(), n, cl.data(), &states[32 * t], dist.data(),
            recon[t].data(), &dsum, payloads[t].data(), cap, nullptr,
            nullptr);
        assert(r > 0);
        plen[t] = r;
        // round-trip: decode must reproduce recon (+33) exactly
        std::vector<uint8_t> out(n * (cols + 1));
        int32_t rc = qvz_decode_colmajor(tables, payloads[t].data(), r, n,
                                         &states[32 * t], out.data(),
                                         nullptr, nullptr, nullptr,
                                         nullptr);
        assert(rc == 0);
        for (uint64_t i = 0; i < n; ++i)
          for (uint32_t c = 0; c < cols; ++c)
            assert(out[i * (cols + 1) + c] ==
                   recon[t][static_cast<size_t>(c) * n + i] + 33);
        // cluster prologue (device lane decoder's host stage): must
        // reproduce the encoded cluster ids and a consistent takeover
        // state (l <= t <= u), concurrently across shard threads
        std::vector<uint8_t> pcl(n);
        uint64_t pst[4];
        int32_t pr = qvz_decode_cluster_prologue(
            tables, payloads[t].data(), static_cast<uint64_t>(r), n,
            nullptr, pcl.data(), pst);
        assert(pr == 0);
        for (uint64_t i = 0; i < n; ++i) assert(pcl[i] == cl[i]);
        assert(pst[0] <= pst[2] && pst[2] <= pst[1]);
        assert(pst[3] >= 22);
      });
    }
    for (auto& th : ts) th.join();
    std::printf("sharded encode+decode x%d threads: ok\n", n_shards);
  }

  // 5. Primed shard coding: warmup captures the bank serially, then
  //    all shards read the SHARED snapshot concurrently (the QVZ2
  //    priming flow) — exercises load() from a buffer owned by the
  //    main thread while other threads read it.
  {
    const int n_shards = 3;
    uint64_t w = 512;  // warmup lines (multiple of 4)
    uint64_t per = ((n_lines - w) / n_shards + 3) & ~3ull;
    std::vector<uint32_t> states(static_cast<size_t>(n_shards + 1) * 32);
    qvz_well_jump(base_state, 2, w * cols / 4, states.data());
    qvz_well_jump(states.data() + 32, n_shards, per * cols / 4,
                  states.data() + 32);
    // bank snapshot size: sum of cards + n_models — fetch via encode
    // with out_bank on a probe... simplest: large scratch
    std::vector<uint32_t> bank(1u << 22, 0);
    {
      std::vector<uint8_t> dt(cols * w);
      for (uint64_t i = 0; i < w; ++i)
        for (uint32_t c = 0; c < cols; ++c)
          dt[static_cast<size_t>(c) * w + i] = data[i * cols + c];
      std::vector<uint8_t> cl(clusters.begin(), clusters.begin() + w);
      std::vector<uint8_t> pay(w * cols * 2 + 4096);
      double dsum = 0;
      int64_t r = qvz_encode_fused_colmajor(
          tables, dt.data(), w, cl.data(), states.data(), dist.data(),
          nullptr, &dsum, pay.data(), pay.size(), nullptr, bank.data());
      assert(r > 0);
    }
    std::vector<std::thread> ts;
    for (int t = 0; t < n_shards; ++t) {
      ts.emplace_back([&, t] {
        uint64_t lo = w + static_cast<uint64_t>(t) * per;
        uint64_t hi = std::min<uint64_t>(n_lines, lo + per);
        if (lo >= hi) return;
        uint64_t n = hi - lo;
        std::vector<uint8_t> dt(cols * n);
        for (uint64_t i = 0; i < n; ++i)
          for (uint32_t c = 0; c < cols; ++c)
            dt[static_cast<size_t>(c) * n + i] = data[(lo + i) * cols + c];
        std::vector<uint8_t> cl(clusters.begin() + lo,
                                clusters.begin() + hi);
        std::vector<uint8_t> pay(n * cols * 2 + 4096);
        double dsum = 0;
        int64_t r = qvz_encode_fused_colmajor(
            tables, dt.data(), n, cl.data(), &states[32 * (t + 1)],
            dist.data(), nullptr, &dsum, pay.data(), pay.size(),
            bank.data(), nullptr);
        assert(r > 0);
        std::vector<uint8_t> out(n * (cols + 1));
        int32_t rc = qvz_decode_colmajor(
            tables, pay.data(), r, n, &states[32 * (t + 1)], out.data(),
            bank.data(), nullptr, nullptr, nullptr);
        assert(rc == 0);
      });
    }
    for (auto& th : ts) th.join();
    std::printf("primed shard coding x%d threads: ok\n", n_shards);
  }

  qvz_tables_free(tables);
  qvz_design_free(design);
  std::printf("sanitize harness: ALL OK\n");
  return 0;
}
