// Native runtime helpers for peng_motif_tpu.
//
// The TPU compute path is JAX/XLA; this small C++ library covers the
// host-runtime pieces where native behavior or throughput matters:
//
//  * zscore_sort_indices: full descending sort of the 4**W z-score table
//    with the reference's comparator (reference: sort_indices,
//    src/base_pattern.h:166-172 used at src/base_pattern.cpp:458).
//    Reverse-complement pattern pairs have bitwise-identical z-scores,
//    so the selected seed orientation depends on std::sort's
//    (deterministic, implementation-defined) tie placement; calling the
//    same libstdc++ std::sort reproduces the reference binary's choice
//    exactly.
//  * parse_fasta_*: streaming FASTA scanner producing BaMM codes
//    (reference semantics: src/shared/SequenceSet.cpp:285-447), ~10x
//    faster than the Python line loop on multi-hundred-MB inputs.
//
// Built on demand with g++ (see build.py) and loaded via ctypes.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>
#include <cmath>
#include <thread>

extern "C" {

// --------------------------------------------------------------------------
// Seed-sort with reference tie semantics.
// --------------------------------------------------------------------------

void zscore_sort_indices(const float* z, uint64_t n, uint32_t* out) {
  std::iota(out, out + n, 0u);
  std::sort(out, out + n,
            [z](uint32_t i, uint32_t j) { return z[i] > z[j]; });
}

// Ascending std::sort of indices by float key: reproduces the reference's
// motif ordering (reference: sort_IUPAC_patterns,
// src/iupac_pattern.cpp:847-849) including introsort tie placement for
// n > 16, where libstdc++ std::sort is not stable.
void float_sort_indices_asc(const float* v, uint64_t n, uint32_t* out) {
  std::iota(out, out + n, 0u);
  std::sort(out, out + n,
            [v](uint32_t i, uint32_t j) { return v[i] < v[j]; });
}

// --------------------------------------------------------------------------
// FASTA parsing.
//
// Two-call protocol: first call with codes == nullptr to obtain
// n_sequences/total_length, then with buffers allocated by the caller.
// Returns 0 on success, negative error codes mirroring the reference's
// fatal conditions (space in sequence, wrong format, unreadable file).
// --------------------------------------------------------------------------

namespace {

struct ParseResult {
  std::vector<uint8_t> codes;    // concatenated
  std::vector<int64_t> lengths;  // per sequence
  int64_t base_counts[4] = {0, 0, 0, 0};
  int error = 0;
};

int parse_file(const char* path, ParseResult& res) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::string content;
  {
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    content.resize(size);
    if (size > 0 && fread(&content[0], 1, size, f) != (size_t)size) {
      fclose(f);
      return -1;
    }
    fclose(f);
  }

  uint8_t code_of[256];
  memset(code_of, 0, sizeof(code_of));
  const char* bases = "ACGT";
  for (int i = 0; i < 4; i++) {
    code_of[(unsigned char)bases[i]] = i + 1;
    code_of[(unsigned char)tolower(bases[i])] = i + 1;
  }

  // getline(...).good() semantics: a final line without trailing newline
  // is never processed (reference: SequenceSet.cpp:304).
  size_t end = content.size();
  if (end == 0 || content[end - 1] != '\n') {
    size_t last_nl = content.rfind('\n');
    end = (last_nl == std::string::npos) ? 0 : last_nl + 1;
  }

  bool have_header = false;
  bool have_any_header = false;
  std::vector<uint8_t> current;
  size_t pos = 0;
  while (pos < end) {
    size_t nl = content.find('\n', pos);
    if (nl == std::string::npos || nl >= end) nl = end;
    size_t line_len = nl - pos;
    if (line_len > 0 && content[pos + line_len - 1] == '\r') line_len--;
    const char* line = content.data() + pos;
    pos = nl + 1;
    if (line_len == 0) continue;

    if (line[0] == '>') {
      if (have_header) {
        if (!current.empty()) {
          res.lengths.push_back((int64_t)current.size());
          res.codes.insert(res.codes.end(), current.begin(), current.end());
          current.clear();
        }
        // empty entry: warning in reference; silently skipped here
      }
      have_header = true;
      have_any_header = true;
    } else if (have_header) {
      for (size_t i = 0; i < line_len; i++) {
        unsigned char ch = (unsigned char)line[i];
        if (ch == ' ') return -2;  // space in sequence: fatal
        uint8_t c = code_of[ch];
        current.push_back(c);
        if (c) res.base_counts[c - 1]++;
      }
    } else {
      return -3;  // sequence data before any header: wrong format
    }
  }
  if (have_header && !current.empty()) {
    res.lengths.push_back((int64_t)current.size());
    res.codes.insert(res.codes.end(), current.begin(), current.end());
  }
  (void)have_any_header;
  return 0;
}

}  // namespace

int64_t parse_fasta_sizes(const char* path, int64_t* n_sequences,
                          int64_t* total_length) {
  ParseResult res;
  int err = parse_file(path, res);
  if (err) return err;
  *n_sequences = (int64_t)res.lengths.size();
  *total_length = (int64_t)res.codes.size();
  return 0;
}

int64_t parse_fasta_fill(const char* path, uint8_t* codes, int64_t* lengths,
                         int64_t* base_counts) {
  ParseResult res;
  int err = parse_file(path, res);
  if (err) return err;
  memcpy(codes, res.codes.data(), res.codes.size());
  memcpy(lengths, res.lengths.data(), res.lengths.size() * sizeof(int64_t));
  memcpy(base_counts, res.base_counts, 4 * sizeof(int64_t));
  return 0;
}

}  // extern "C"

// --------------------------------------------------------------------------
// Bit-exact EM refinement.
//
// The TPU EM (ops/em.py) reduces responsibilities with XLA tree
// reductions; the reference accumulates sequentially in float32
// (reference: src/peng.cpp:104-144), so results differ in the last
// printed decimal.  EM uses only IEEE +,*,/ (no transcendentals), so
// replaying the reference's operation order here reproduces its PWMs
// bit-for-bit.  Motifs are embarrassingly parallel (threaded by the
// caller via em_optimize_batch).
// --------------------------------------------------------------------------

// --------------------------------------------------------------------------
// Bit-exact IUPAC aggregation.
//
// The TPU aggregation (ops/iupac_sum.py) computes the same sums as tree
// contractions; the reference folds expansion values sequentially in
// float32 — ascending canonical id with consecutive-duplicate skip for
// BOTH_STRANDS (reference: src/iupac_pattern.cpp:331-369, 410-447), DFS
// stack order without dedup for PLUS_STRAND (src/iupac_pattern.cpp:
// 371-408).  Those fold orders are reproduced here exactly so IUPAC
// statistics (and every tie-sensitive decision downstream) match the
// reference binary bit-for-bit.
// --------------------------------------------------------------------------

namespace {

// representative base letters per IUPAC code (src/iupac_alphabet.cpp:138-180)
static const int kRep[11][5] = {
    {1, 0}, {1, 1}, {1, 2}, {1, 3},          // A C G T (count, letters...)
    {2, 1, 2}, {2, 0, 3}, {2, 0, 2}, {2, 1, 3},
    {2, 0, 1}, {2, 2, 3},
    {4, 0, 1, 2, 3},
};

inline int64_t revcomp_id(int64_t id, int w) {
  int64_t out = 0;
  for (int p = 0; p < w; p++) {
    out = out * 4 + (3 - (id & 3));
    id >>= 2;
  }
  return out;
}

// DFS expansion in the reference's stack order.
void expand_iupac(const int32_t* digits, int w, std::vector<int64_t>& out) {
  struct Item { int64_t kmer; int pos; };
  std::vector<Item> stack;
  stack.push_back({0, 0});
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    int64_t kmer = it.kmer;
    int pos = it.pos;
    while (pos < w) {
      const int* rep = kRep[digits[pos]];
      int count = rep[0];
      if (count > 1) {
        for (int i = 2; i <= count; i++) {
          int64_t factor = (int64_t)1 << (2 * pos);
          stack.push_back({kmer + rep[i] * factor, pos + 1});
        }
      }
      kmer += (int64_t)rep[1] << (2 * pos);
      pos++;
    }
    out.push_back(kmer);
  }
}

}  // namespace

// Aggregate counts/expected/bg-prob sums for a batch of IUPAC digit
// vectors.  counts is the mirrored int32 table; expected/bgp are the
// (strand-aggregated) float tables.  Outputs per candidate:
// counts_out (u64), expected_out (f32), bgp_out (f32).
extern "C" void iupac_aggregate_exact(
    const int32_t* digit_batch, int n_candidates, int w, int both_strands,
    const int32_t* counts, const float* expected, const float* bgp,
    uint64_t* counts_out, float* expected_out, float* bgp_out) {
  std::vector<int64_t> ids;
  for (int c = 0; c < n_candidates; c++) {
    const int32_t* digits = digit_batch + (int64_t)c * w;
    ids.clear();
    expand_iupac(digits, w, ids);
    uint64_t sum_counts;
    float sum_expected, sum_bgp;
    if (both_strands) {
      for (auto& id : ids) id = std::min(id, revcomp_id(id, w));
      std::sort(ids.begin(), ids.end());
      int64_t last = ids[0];
      sum_counts = (uint64_t)counts[last];
      sum_expected = expected[last];
      sum_bgp = bgp[last];
      for (size_t i = 1; i < ids.size(); i++) {
        int64_t id = ids[i];
        if (id != last) {
          sum_counts += (uint64_t)counts[id];
          sum_expected += expected[id];
          sum_bgp += bgp[id];
        }
        last = id;
      }
    } else {
      int64_t first = ids[0];
      sum_counts = (uint64_t)counts[first];
      sum_expected = expected[first];
      sum_bgp = bgp[first];
      for (size_t i = 1; i < ids.size(); i++) {
        int64_t id = ids[i];
        sum_counts += (uint64_t)counts[id];
        sum_expected += expected[id];
        sum_bgp += bgp[id];
      }
    }
    counts_out[c] = sum_counts;
    expected_out[c] = sum_expected;
    bgp_out[c] = sum_bgp;
  }
}

namespace {

void em_prob_odds(const float* pwm, const float* bg, int64_t n, int w,
                  float* odds) {
  // odds[id] = prod_p pwm[p][digit_p(id)] / bg[id], with the product
  // accumulated position 0..W-1 (reference: src/peng.cpp:180-197).
  for (int64_t id = 0; id < n; id++) {
    float prob = 1.0f;
    int64_t rest = id;
    for (int p = 0; p < w; p++) {
      prob = prob * pwm[p * 4 + (rest & 3)];
      rest >>= 2;
    }
    odds[id] = prob / bg[id];
  }
}

}  // namespace

extern "C" int em_optimize_single(float* pwm, const float* counts,
                                  const float* bg, int w, float s, float thr,
                                  int max_iter, float* scratch) {
  const int64_t n = (int64_t)1 << (2 * w);
  float old_pwm[64 * 4];
  float new_pwm[64 * 4];
  memcpy(old_pwm, pwm, sizeof(float) * w * 4);

  float change = (float)w;
  int iter = 0;
  float* cur_old = old_pwm;
  float* cur_new = new_pwm;
  while (true) {
    if (change <= thr || iter >= max_iter) break;
    iter++;
    for (int i = 0; i < w * 4; i++) cur_new[i] = 0.0f;
    em_prob_odds(cur_old, bg, n, w, scratch);
    for (int64_t id = 0; id < n; id++) {
      const float r = counts[id] * s / (1.0f + s / scratch[id]);
      int64_t rest = id;
      for (int p = 0; p < w; p++) {
        cur_new[p * 4 + (rest & 3)] += r;
        rest >>= 2;
      }
    }
    // normalize (reference: src/iupac_pattern.cpp:291-303)
    for (int p = 0; p < w; p++) {
      float sum = 0.0f;
      for (int a = 0; a < 4; a++) sum += cur_new[p * 4 + a];
      for (int a = 0; a < 4; a++) cur_new[p * 4 + a] /= sum;
    }
    change = 0.0f;
    for (int i = 0; i < w * 4; i++)
      change += std::fabs(cur_new[i] - cur_old[i]);
    std::swap(cur_old, cur_new);
  }
  memcpy(pwm, cur_old, sizeof(float) * w * 4);
  return iter;
}

extern "C" void em_optimize_batch(float* pwms, const float* counts,
                                  const float* bg, int n_motifs, int w,
                                  float s, float thr, int max_iter,
                                  int n_threads) {
  const int64_t n = (int64_t)1 << (2 * w);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  std::vector<int> next(1, 0);
  auto worker = [&](int tid) {
    std::vector<float> scratch(n);
    for (int m = tid; m < n_motifs; m += n_threads) {
      em_optimize_single(pwms + (int64_t)m * w * 4, counts, bg, w, s, thr,
                         max_iter, scratch.data());
    }
  };
  for (int t = 0; t < n_threads; t++) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
}
