// ThreadSanitizer stress driver for the pengnative thread pools
// (round-2 verdict next #9; the reference ships only an ASan build
// type, cmake/FindASan.cmake).
//
// Built by tests/test_tsan.py as
//   g++ -fsanitize=thread -O1 -std=c++17 pengnative.cpp tsan_driver.cpp
// and run with TSAN_OPTIONS=exitcode=66: a data race in any of the
// hand-rolled pools (counting scan, bg k-mer counter, EM batch,
// aggregation, table stats, packing) fails the test via the exit code.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int64_t count_rows_exact(const uint8_t*, int64_t, int64_t, int, int, int,
                         int32_t*);
void bg_count_kmers(const uint8_t*, const int64_t*, int64_t, int, int64_t*);
void em_optimize_batch(float*, const float*, const float*, int, int, float,
                       float, int, int);
void iupac_aggregate_exact(const int32_t*, int, int, int, const int32_t*,
                           const float*, const float*, uint64_t*, float*,
                           float*);
void base_log_pvalues_table(const int32_t*, const float*, int64_t, float*);
void base_stats_table(const int32_t*, const float*, int64_t, int64_t, float*,
                      float*);
void bg_prob_table_native(const float*, const int64_t*, int, int, int,
                          float*);
void pack_codes_native(const uint8_t*, int64_t, int64_t, uint8_t*);
int64_t stream_fixup_native(const uint8_t*, int64_t, const int64_t*,
                            const int64_t*, int64_t, const int64_t*, int64_t,
                            int64_t, int64_t, int64_t, int64_t, int,
                            int64_t*, int32_t*, int64_t, int64_t*);
}

static uint32_t rng_state = 12345;
static uint32_t rnd() {
  rng_state = rng_state * 1664525u + 1013904223u;
  return rng_state >> 16;
}

int main() {
  const int W = 8;
  const int64_t n_tab = (int64_t)1 << (2 * W);
  const int64_t rows = 4000, L = 256;

  std::vector<uint8_t> codes(rows * L);
  for (auto& c : codes) c = (uint8_t)(rnd() % 6 == 0 ? 0 : 1 + rnd() % 4);

  // threaded exact counting scan
  std::vector<int32_t> table(n_tab);
  int64_t ltot = count_rows_exact(codes.data(), rows, L, W, 1, 0,
                                  table.data());

  // threaded background k-mer counting
  std::vector<int64_t> lengths(rows, L);
  std::vector<int64_t> bg_counts(4 + 16 + 64);
  bg_count_kmers(codes.data(), lengths.data(), rows, 2, bg_counts.data());

  // parallel_ranges consumers: packing + per-pattern stat tables
  std::vector<uint8_t> packed(rows * ((L + 3) / 4 + (L + 7) / 8));
  pack_codes_native(codes.data(), rows, L, packed.data());

  std::vector<float> bgp(n_tab), expected(n_tab), z(n_tab), logp(n_tab);
  std::vector<float> v_concat(4 + 16 + 64);
  std::vector<int64_t> v_off = {0, 4, 20};
  for (size_t i = 0; i < v_concat.size(); i++)
    v_concat[i] = 0.25f / (1 + (i % 4));
  bg_prob_table_native(v_concat.data(), v_off.data(), 2, W, 1, bgp.data());
  base_stats_table(table.data(), bgp.data(), n_tab, ltot, expected.data(),
                   z.data());
  base_log_pvalues_table(table.data(), expected.data(), n_tab, logp.data());

  // threaded IUPAC aggregation over candidates
  const int n_cand = 64;
  std::vector<int32_t> digits(n_cand * W);
  for (auto& d : digits) d = (int32_t)(rnd() % 11);
  std::vector<uint64_t> c_out(n_cand);
  std::vector<float> e_out(n_cand), b_out(n_cand);
  iupac_aggregate_exact(digits.data(), n_cand, W, 1, table.data(),
                        expected.data(), bgp.data(), c_out.data(),
                        e_out.data(), b_out.data());

  // threaded EM batch
  const int n_motifs = 24;
  std::vector<float> pwms(n_motifs * W * 4);
  for (auto& p : pwms) p = 0.25f;
  std::vector<float> counts_f(n_tab);
  for (int64_t i = 0; i < n_tab; i++) counts_f[i] = (float)table[i];
  em_optimize_batch(pwms.data(), counts_f.data(), bgp.data(), n_motifs, W,
                    1e4f, 0.08f, 10, 0);

  // threaded stream fix-up: repeat-heavy sequences, every chunk
  // suspicious — per-thread chunk caches + delta maps under load
  {
    const int64_t row = 512, ctx = 2 * (W - 1), core = row - W + 1 - ctx;
    const int64_t n_seq = 200, sl = 600;
    std::vector<int64_t> sstarts(n_seq), slens(n_seq, sl);
    std::vector<uint8_t> stream(n_seq * (sl + W) + W - 1, 0);
    for (int64_t k = 0; k < n_seq; k++) {
      sstarts[k] = k * (sl + W);
      for (int64_t j = 0; j < sl; j++)
        stream[sstarts[k] + j] =
            (uint8_t)(j % 97 < 24 ? 1 + (j % 4) : 1 + rnd() % 4);
    }
    const int64_t n_win = (int64_t)stream.size() - W + 1;
    const int64_t m = (n_win + core - 1) / core;
    std::vector<int64_t> susp(m);
    for (int64_t c = 0; c < m; c++) susp[c] = c;
    std::vector<int64_t> ids(1 << 20);
    std::vector<int32_t> dvs(1 << 20);
    int64_t ltd = 0;
    int64_t nf = stream_fixup_native(
        stream.data(), (int64_t)stream.size(), sstarts.data(), slens.data(),
        n_seq, susp.data(), m, W, row, core, ctx, 1, ids.data(), dvs.data(),
        1 << 20, &ltd);
    printf("fixup n=%lld ltd=%lld\n", (long long)nf, (long long)ltd);
  }

  printf("tsan driver done ltot=%lld bg0=%lld pwm0=%f\n",
         (long long)ltot, (long long)bg_counts[0], (double)pwms[0]);
  return 0;
}
