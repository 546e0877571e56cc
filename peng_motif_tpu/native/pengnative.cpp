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
#include <memory>
#include <mutex>
#include <numeric>
#include <string>
#include <unordered_map>
#include <vector>
#include <cmath>
#include <atomic>
#include <thread>

namespace {

// run fn(lo, hi) over [0, n) split across hardware threads
template <typename F>
void parallel_ranges(int64_t n, F fn) {
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n < 1 << 16 || n_threads == 1) {
    fn((int64_t)0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([=]() { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// --------------------------------------------------------------------------
// Seed-sort with reference tie semantics.
// --------------------------------------------------------------------------

void zscore_sort_indices(const float* z, uint64_t n, uint32_t* out) {
  // Sort (key, index) pairs instead of bare indices: every comparison
  // between the elements originally at positions (i, j) returns exactly
  // what the reference's comparator z[i] > z[j] returns, and introsort's
  // control flow depends only on those outcomes, so the resulting
  // permutation is identical — without a random 4-byte gather into the
  // 4^W key table per comparison (~3x faster at W = 10).
  struct ZI {
    float z;
    uint32_t i;
  };
  std::vector<ZI> v(n);
  for (uint64_t i = 0; i < n; i++) v[i] = {z[i], (uint32_t)i};
  std::sort(v.begin(), v.end(),
            [](const ZI& a, const ZI& b) { return a.z > b.z; });
  for (uint64_t i = 0; i < n; i++) out[i] = v[i].i;
}

// Prefix-pruned z-sort.  The seed-selection walk only ever reads the
// order array up to the first below-threshold entry, so subranges of
// the introsort recursion that lie entirely beyond that prefix never
// influence anything observable — but their tie placement would still
// have to match libstdc++'s std::sort if they were sorted.  This
// variant therefore drives the SAME libstdc++ internals
// (std::__unguarded_partition_pivot / __partial_sort /
// __insertion_sort) in std::sort's exact control flow, skipping only
// recursion into subranges [cut, last) with cut >= keep_end:
//   * quicksort subranges are independent once partitioned, so pruning
//     one never changes pivot choices or comparison outcomes elsewhere;
//   * after __introsort_loop every element sits in a partition chunk
//     (<= 16 long) that contains its final position, and the final
//     insertion pass never moves an element across a chunk boundary
//     past an equal one, so an element from a chunk starting at or
//     beyond keep_end can never land inside [0, keep_end);
//   * truncating the final insertion pass at keep_end + 16 (covering
//     the chunk straddling keep_end) therefore leaves [0, keep_end)
//     element-for-element identical to the full std::sort.
// NaN z-scores break strict weak ordering (the full sort's result is
// then control-flow-defined), so any NaN falls back to the full sort.
}  // extern "C" (templates below need C++ linkage)

namespace {

struct ZIPair {
  float z;
  uint32_t i;
};

template <typename It, typename Comp>
void pruned_introsort_loop(It first, It last, It keep_end,
                           int64_t depth_limit, Comp comp) {
  // transcription of std::__introsort_loop (bits/stl_algo.h) with the
  // keep_end prune; _S_threshold = 16
  while (last - first > 16) {
    if (depth_limit == 0) {
      std::__partial_sort(first, last, last, comp);
      return;
    }
    --depth_limit;
    It cut = std::__unguarded_partition_pivot(first, last, comp);
    if (cut < keep_end)
      pruned_introsort_loop(cut, last, keep_end, depth_limit, comp);
    last = cut;
  }
}

}  // namespace

extern "C" {

void zscore_sort_prefix(const float* z, uint64_t n, float thr,
                        uint32_t* out) {
  uint64_t keep = 0;
  bool has_nan = false;
  for (uint64_t i = 0; i < n; i++) {
    if (std::isnan(z[i])) has_nan = true;
    if (!(z[i] < thr)) keep++;
  }
  std::vector<ZIPair> v(n);
  for (uint64_t i = 0; i < n; i++) v[i] = {z[i], (uint32_t)i};
  auto comp = [](const ZIPair& a, const ZIPair& b) { return a.z > b.z; };
  if (has_nan || keep + 32 >= n || n <= 16) {
    std::sort(v.begin(), v.end(), comp);
  } else {
    ZIPair* first = v.data();
    ZIPair* last = first + n;
    // the walk reads indices [0, keep] (entry `keep` is the breaking,
    // first below-threshold one)
    ZIPair* keep_end = first + (keep + 1);
    auto wcomp = __gnu_cxx::__ops::__iter_comp_iter(comp);
    pruned_introsort_loop(first, last, keep_end,
                          std::__lg((int64_t)n) * 2, wcomp);
    ZIPair* fin = std::min(last, keep_end + 16);
    // truncated std::__final_insertion_sort
    if (fin - first > 16) {
      std::__insertion_sort(first, first + 16, wcomp);
      std::__unguarded_insertion_sort(first + 16, fin, wcomp);
    } else {
      std::__insertion_sort(first, fin, wcomp);
    }
  }
  for (uint64_t i = 0; i < n; i++) out[i] = v[i].i;
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
  int64_t n_empty = 0;           // entries without sequence (warned)
  // the reference warns per undefined base only for the entry flushed
  // at EOF (SequenceSet.cpp:395-404); mid-file entries exclude silently
  std::string last_header;
  std::string last_undef;
  // bare-">" headers take the GLOBAL 1-based sequence counter; a
  // segment only knows its local index, so the merge renumbers
  bool last_bare = false;
  int64_t last_bare_local = 0;
  int error = 0;
};

// Parse one segment [pos, end) of the file image.  Segments other than
// the first start exactly at a line-initial '>' so every segment is a
// self-contained sub-FASTA; the caller merges results.  ``first``
// gates the data-before-header error; last_header/last_undef are only
// meaningful for the segment containing the true EOF entry.
int parse_segment(const char* data, size_t pos, size_t end, bool first,
                  ParseResult& res) {
  const std::string_view content(data, end);

  bool have_header = false;
  bool have_any_header = false;
  bool cur_bare = false;
  int64_t cur_bare_local = 0;
  std::string cur_header;
  std::string cur_undef;
  res.codes.reserve(end - pos);    // upper bound: every byte a base
  size_t entry_start = 0;          // offset of current entry in res.codes
  int64_t bc[5] = {0, 0, 0, 0, 0}; // [0] = undefined
  res.last_bare = false;
  while (pos < end) {
    const char* nlp = (const char*)memchr(content.data() + pos, '\n',
                                          end - pos);
    size_t nl = nlp ? (size_t)(nlp - content.data()) : end;
    size_t line_len = nl - pos;
    if (line_len > 0 && content[pos + line_len - 1] == '\r') line_len--;
    const char* line = content.data() + pos;
    pos = nl + 1;
    if (line_len == 0) continue;

    if (line[0] == '>') {
      if (have_header) {
        size_t cur_len = res.codes.size() - entry_start;
        if (cur_len > 0) {
          res.lengths.push_back((int64_t)cur_len);
        } else {
          // reference: SequenceSet.cpp:344-348 warns per empty entry
          res.n_empty++;
        }
      }
      entry_start = res.codes.size();
      cur_undef.clear();
      // bare ">" takes the 1-based sequence counter as header
      // (reference: SequenceSet.cpp:351-356); local index here, the
      // merge adds the preceding segments' sequence count
      cur_bare = (line_len == 1);
      cur_bare_local = (int64_t)res.lengths.size();
      cur_header = cur_bare
          ? std::to_string(res.lengths.size() + 1)
          : std::string(line + 1, line_len - 1);
      have_header = true;
      have_any_header = true;
    } else if (have_header) {
      size_t old = res.codes.size();
      res.codes.resize(old + line_len);
      uint8_t* dst = res.codes.data() + old;
      // vectorizable fast pass: four equality compares map A/C/G/T
      // (either case) to codes 1-4; everything else (incl. undefined
      // bases and the fatal space) lands on 0 and is re-examined by
      // the scalar bookkeeping pass only when present (rare).
      size_t na = 0, nc = 0, ng = 0, nt = 0;
      for (size_t i = 0; i < line_len; i++) {
        unsigned char up = (unsigned char)line[i] & (unsigned char)~0x20;
        const bool ia = up == 'A', ic = up == 'C', ig = up == 'G',
                   it = up == 'T';
        dst[i] = (uint8_t)(ia * 1 + ic * 2 + ig * 3 + it * 4);
        na += ia; nc += ic; ng += ig; nt += it;
      }
      bc[1] += na; bc[2] += nc; bc[3] += ng; bc[4] += nt;
      const size_t n_zero = line_len - (na + nc + ng + nt);
      bc[0] += n_zero;
      if (n_zero) {
        for (size_t i = 0; i < line_len; i++) {
          if (dst[i]) continue;
          const unsigned char ch = (unsigned char)line[i];
          if (ch == ' ') return -2;  // space in sequence: fatal
          cur_undef.push_back((char)ch);
        }
      }
    } else {
      return -3;  // sequence data before any header: wrong format
    }
  }
  if (have_header) {
    size_t cur_len = res.codes.size() - entry_start;
    if (cur_len > 0) {
      res.lengths.push_back((int64_t)cur_len);
      res.last_header = cur_header;
      res.last_undef = cur_undef;
      res.last_bare = cur_bare;
      res.last_bare_local = cur_bare_local;
    } else {
      res.n_empty++;  // trailing empty entry also warns (EOF branch)
    }
  }
  for (int j = 0; j < 4; j++) res.base_counts[j] = bc[j + 1];
  (void)have_any_header;
  return 0;
}

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

  // getline(...).good() semantics: a final line without trailing newline
  // is never processed (reference: SequenceSet.cpp:304).
  size_t end = content.size();
  if (end == 0 || content[end - 1] != '\n') {
    size_t last_nl = content.rfind('\n');
    end = (last_nl == std::string::npos) ? 0 : last_nl + 1;
  }

  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 16) n_threads = 16;
  if (end < (size_t)(4 << 20) || n_threads == 1) {
    return parse_segment(content.data(), 0, end, true, res);
  }

  // segment split points: the line-initial '>' at or after each even
  // slice boundary, so every segment is a self-contained sub-FASTA
  std::vector<size_t> splits{0};
  for (int t = 1; t < n_threads; t++) {
    size_t target = end * (size_t)t / (size_t)n_threads;
    if (target <= splits.back()) continue;
    const char* hit = (const char*)memmem(content.data() + target,
                                          end - target, "\n>", 2);
    if (!hit) break;
    size_t sp = (size_t)(hit - content.data()) + 1;  // at the '>'
    if (sp > splits.back() && sp < end) splits.push_back(sp);
  }
  splits.push_back(end);
  const int n_seg = (int)splits.size() - 1;
  if (n_seg <= 1) return parse_segment(content.data(), 0, end, true, res);

  std::vector<ParseResult> parts(n_seg);
  std::vector<int> rcs(n_seg, 0);
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_seg; t++) {
      pool.emplace_back([&, t]() {
        rcs[t] = parse_segment(content.data(), splits[t], splits[t + 1],
                               t == 0, parts[t]);
      });
    }
    for (auto& th : pool) th.join();
  }
  for (int t = 0; t < n_seg; t++) {
    if (rcs[t] != 0) return rcs[t];
  }

  size_t total_codes = 0;
  int64_t total_seqs = 0;
  for (auto& pr : parts) {
    total_codes += pr.codes.size();
    total_seqs += (int64_t)pr.lengths.size();
  }
  res.codes.resize(total_codes);
  res.lengths.reserve(total_seqs);
  size_t off = 0;
  int64_t seqs_before_last = 0;
  for (int t = 0; t < n_seg; t++) {
    ParseResult& pr = parts[t];
    memcpy(res.codes.data() + off, pr.codes.data(), pr.codes.size());
    off += pr.codes.size();
    res.lengths.insert(res.lengths.end(), pr.lengths.begin(),
                       pr.lengths.end());
    for (int j = 0; j < 4; j++) res.base_counts[j] += pr.base_counts[j];
    res.n_empty += pr.n_empty;
    if (t < n_seg - 1) seqs_before_last += (int64_t)pr.lengths.size();
  }
  ParseResult& last = parts[n_seg - 1];
  res.last_undef = last.last_undef;
  res.last_header = last.last_bare
      ? std::to_string(seqs_before_last + last.last_bare_local + 1)
      : last.last_header;
  return 0;
}

// handle registry: parse once, hand the arrays out, free on take
std::mutex g_fasta_mu;
std::unordered_map<int64_t, std::unique_ptr<ParseResult>> g_fasta_handles;
int64_t g_fasta_next = 1;

}  // namespace

int64_t parse_fasta_sizes(const char* path, int64_t* n_sequences,
                          int64_t* total_length, int64_t* n_empty,
                          char* last_header, int64_t header_cap,
                          char* last_undef, int64_t undef_cap,
                          int64_t* n_undef) {
  ParseResult res;
  int err = parse_file(path, res);
  if (err) return err;
  *n_sequences = (int64_t)res.lengths.size();
  *total_length = (int64_t)res.codes.size();
  *n_empty = res.n_empty;
  snprintf(last_header, (size_t)header_cap, "%s", res.last_header.c_str());
  snprintf(last_undef, (size_t)undef_cap, "%s", res.last_undef.c_str());
  *n_undef = (int64_t)res.last_undef.size();
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

// Parse-once handle API: fasta_open parses and reports sizes; fasta_take
// copies the arrays out and frees the handle.  Halves the work of the
// legacy sizes+fill pair (which parses the file twice).
int64_t fasta_open(const char* path, int64_t* n_sequences,
                   int64_t* total_length, int64_t* n_empty,
                   char* last_header, int64_t header_cap,
                   char* last_undef, int64_t undef_cap, int64_t* n_undef) {
  auto res = std::make_unique<ParseResult>();
  int err = parse_file(path, *res);
  if (err) return err;
  *n_sequences = (int64_t)res->lengths.size();
  *total_length = (int64_t)res->codes.size();
  *n_empty = res->n_empty;
  snprintf(last_header, (size_t)header_cap, "%s", res->last_header.c_str());
  snprintf(last_undef, (size_t)undef_cap, "%s", res->last_undef.c_str());
  *n_undef = (int64_t)res->last_undef.size();
  std::lock_guard<std::mutex> lk(g_fasta_mu);
  int64_t h = g_fasta_next++;
  g_fasta_handles[h] = std::move(res);
  return h;
}

int64_t fasta_take(int64_t handle, uint8_t* codes, int64_t* lengths,
                   int64_t* base_counts) {
  std::unique_ptr<ParseResult> res;
  {
    std::lock_guard<std::mutex> lk(g_fasta_mu);
    auto it = g_fasta_handles.find(handle);
    if (it == g_fasta_handles.end()) return -1;
    res = std::move(it->second);
    g_fasta_handles.erase(it);
  }
  memcpy(codes, res->codes.data(), res->codes.size());
  memcpy(lengths, res->lengths.data(),
         res->lengths.size() * sizeof(int64_t));
  memcpy(base_counts, res->base_counts, 4 * sizeof(int64_t));
  return 0;
}

void fasta_close(int64_t handle) {
  std::lock_guard<std::mutex> lk(g_fasta_mu);
  g_fasta_handles.erase(handle);
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

// rc of an 8-digit (16-bit) chunk, table-driven — the reference's
// half-pattern reverse-complement LUT idea (src/base_pattern.cpp:81-97).
inline const uint32_t* rc8_lut() {
  static const std::vector<uint32_t> lut = [] {
    std::vector<uint32_t> t(1 << 16);
    for (uint32_t x = 0; x < (uint32_t)(1 << 16); x++) {
      uint32_t r = 0, v = x;
      for (int p = 0; p < 8; p++) {
        r = (r << 2) | (3 - (v & 3));
        v >>= 2;
      }
      t[x] = r;
    }
    return t;
  }();
  return lut.data();
}

// LUT revcomp: valid for w <= 16 (ids < 4^16)
inline int64_t revcomp_id_fast(int64_t id, int w, const uint32_t* lut) {
  if (w <= 8) return (int64_t)(lut[id] >> (2 * (8 - w)));
  const int64_t lo = id & 0xFFFF;
  const int64_t hi = id >> 16;
  return (int64_t)(lut[hi] >> (2 * (16 - w)))
         | ((int64_t)lut[lo] << (2 * (w - 8)));
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

// Ascending sort of pattern ids (non-negative, < 4^W).  LSD radix: the
// output sequence of *values* is identical to std::sort's (duplicates
// are indistinguishable), so the downstream fold order is unchanged;
// ~5x faster than comparison sort on the 4^degeneracy expansions of
// late hill-climb steps.
void sort_ids(std::vector<int64_t>& ids, std::vector<int64_t>& tmp,
              int total_bits) {
  const size_t n = ids.size();
  if (n < 2048) {
    std::sort(ids.begin(), ids.end());
    return;
  }
  constexpr int kBits = 11;
  constexpr int kBuckets = 1 << kBits;
  tmp.resize(n);
  int64_t* src = ids.data();
  int64_t* dst = tmp.data();
  size_t hist[kBuckets];
  for (int shift = 0; shift < total_bits; shift += kBits) {
    memset(hist, 0, sizeof(hist));
    for (size_t i = 0; i < n; i++) hist[(src[i] >> shift) & (kBuckets - 1)]++;
    size_t sum = 0;
    for (int b = 0; b < kBuckets; b++) {
      size_t c = hist[b];
      hist[b] = sum;
      sum += c;
    }
    for (size_t i = 0; i < n; i++)
      dst[hist[(src[i] >> shift) & (kBuckets - 1)]++] = src[i];
    std::swap(src, dst);
  }
  if (src != ids.data())
    memcpy(ids.data(), src, n * sizeof(int64_t));
}

}  // namespace

// Aggregate counts/expected/bg-prob sums for a batch of IUPAC digit
// vectors.  counts is the mirrored int32 table; expected/bgp are the
// (strand-aggregated) float tables.  Outputs per candidate:
// counts_out (u64), expected_out (f32), bgp_out (f32).
namespace {

// Ascending enumerator over the product set of per-position value
// lists: id = sum_p vals[p][idx[p]] << 2p.  Lexicographic order over
// (digit_{W-1}, ..., digit_0) with ascending per-position values is
// ascending numeric order, so incrementing position 0 fastest streams
// the expansion in sorted order with O(1) work per element.
struct AscendingExpansion {
  int w;
  int nvals[16];
  int vals[16][4];
  int idx[16];
  int64_t id;
  bool done;

  void init_from(const int32_t* digits, int w_, bool complement) {
    w = w_;
    id = 0;
    done = false;
    for (int p = 0; p < w; p++) {
      // complement stream: position p takes the complemented letters of
      // source position w-1-p (rc of the IUPAC pattern)
      const int* rep = kRep[digits[complement ? (w - 1 - p) : p]];
      int n = rep[0];
      nvals[p] = n;
      for (int i = 0; i < n; i++) {
        vals[p][i] = complement ? 3 - rep[n - i] : rep[1 + i];
      }
      idx[p] = 0;
      id += (int64_t)vals[p][0] << (2 * p);
    }
  }

  void advance() {
    for (int p = 0; p < w; p++) {
      int i = idx[p];
      if (i + 1 < nvals[p]) {
        id += (int64_t)(vals[p][i + 1] - vals[p][i]) << (2 * p);
        idx[p] = i + 1;
        return;
      }
      id -= (int64_t)(vals[p][i] - vals[p][0]) << (2 * p);
      idx[p] = 0;
    }
    done = true;
  }
};

// one candidate's aggregation; ids is a reusable scratch buffer
void aggregate_one(
    const int32_t* digit_batch, int c, int w, int both_strands,
    const int32_t* counts, const float* expected, const float* bgp,
    uint64_t* counts_out, float* expected_out, float* bgp_out,
    std::vector<int64_t>& ids, std::vector<int64_t>& tmp) {
  {
    const int32_t* digits = digit_batch + (int64_t)c * w;
    uint64_t sum_counts;
    float sum_expected, sum_bgp;
    if (both_strands) {
      // The reference folds the distinct canonical ids in ascending
      // order (sort + consecutive-duplicate skip,
      // src/iupac_pattern.cpp:331-369).  That set equals
      //   {x in S : x <= rc(x)}  union  {x in rc(S) : x < rc(x)}
      // where S is the expansion; both S and rc(S) (the expansion of
      // the complemented-reversed pattern) stream in ascending order
      // from odometers, so a sorted merge reproduces the exact fold
      // order with no sort and O(1) work per expansion element.
      const uint32_t* lut = rc8_lut();
      AscendingExpansion fs, rs;
      fs.init_from(digits, w, false);
      rs.init_from(digits, w, true);
      // starting the float folds at +0.0f is exact: the table values
      // are non-negative and +0.0f + v == v bit-for-bit
      sum_counts = 0;
      sum_expected = 0.0f;
      sum_bgp = 0.0f;
      while (!fs.done || !rs.done) {
        int64_t x;
        bool from_s;
        if (rs.done || (!fs.done && fs.id <= rs.id)) {
          x = fs.id;
          from_s = true;
          if (!rs.done && rs.id == x) rs.advance();
          fs.advance();
        } else {
          x = rs.id;
          from_s = false;
          rs.advance();
        }
        int64_t rcx = revcomp_id_fast(x, w, lut);
        if (from_s ? (x <= rcx) : (x < rcx)) {
          sum_counts += (uint64_t)counts[x];
          sum_expected += expected[x];
          sum_bgp += bgp[x];
        }
      }
    } else {
      ids.clear();
      expand_iupac(digits, w, ids);
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

}  // namespace

extern "C" void iupac_aggregate_exact(
    const int32_t* digit_batch, int n_candidates, int w, int both_strands,
    const int32_t* counts, const float* expected, const float* bgp,
    uint64_t* counts_out, float* expected_out, float* bgp_out) {
  // candidates are independent; thread over them (each candidate's own
  // fold order is unchanged, so results stay bit-exact)
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n_candidates) n_threads = n_candidates;
  if (n_threads <= 1 || n_candidates < 4) {
    std::vector<int64_t> ids, tmp;
    for (int c = 0; c < n_candidates; c++) {
      aggregate_one(digit_batch, c, w, both_strands, counts, expected, bgp,
                    counts_out, expected_out, bgp_out, ids, tmp);
    }
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int> next(0);
  for (int t = 0; t < n_threads; t++) {
    pool.emplace_back([&]() {
      std::vector<int64_t> ids, tmp;
      int c;
      while ((c = next.fetch_add(1)) < n_candidates) {
        aggregate_one(digit_batch, c, w, both_strands, counts, expected,
                      bgp, counts_out, expected_out, bgp_out, ids, tmp);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// --------------------------------------------------------------------------
// Background (k+1)-mer counting (reference: BackgroundModel.cpp:59-84
// via Sequence::kmer_, Sequence.cpp:28-33): for every k = 0..order and
// every in-sequence position i >= k, count the value
// v = sum_j (c[i-j] - 1) * 4^j (N contributes 0), unless a position in
// the trailing 9-window i-8..i is an N and v != 0 (the reference's
// kmer_[i] < 0 sentinel skips those, with the v == 0 quirk preserved).
// out packs the count vectors back to back: 4 + 16 + ... + 4^(order+1).
// --------------------------------------------------------------------------

extern "C" void bg_count_kmers(const uint8_t* codes, const int64_t* lengths,
                               int64_t n_seq, int order, int64_t* out) {
  int64_t total_out = 0;
  for (int k = 0; k <= order; k++) total_out += (int64_t)1 << (2 * (k + 1));
  memset(out, 0, total_out * sizeof(int64_t));
  std::vector<int64_t> offs(order + 1);
  {
    int64_t acc = 0;
    for (int k = 0; k <= order; k++) { offs[k] = acc; acc += (int64_t)1 << (2 * (k + 1)); }
  }
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_seq < 64) n_threads = 1;
  std::vector<std::vector<int64_t>> partial(
      n_threads, std::vector<int64_t>(total_out, 0));
  std::vector<int64_t> starts(n_seq);
  {
    int64_t acc = 0;
    for (int64_t s = 0; s < n_seq; s++) { starts[s] = acc; acc += lengths[s]; }
  }
  std::atomic<int64_t> next(0);
  // v_k(i) = sum_{j<=k} 4^j * base(i-j) is the low 2(k+1) bits of one
  // rolling register r(i) = (r(i-1) << 2) | base(i) (older bases at
  // higher powers), so the per-position work is one shift + masked
  // increments — no v_k recurrence buffers
  int64_t mask[16];
  for (int k = 0; k <= order; k++)
    mask[k] = ((int64_t)1 << (2 * (k + 1))) - 1;
  auto worker = [&](int tid) {
    int64_t* cnt = partial[tid].data();
    int64_t s;
    while ((s = next.fetch_add(1)) < n_seq) {
      const uint8_t* seq = codes + starts[s];
      const int64_t L = lengths[s];
      int n_in_window = 0;  // count of Ns among positions i-8..i
      int64_t r = 0;
      for (int64_t i = 0; i < L; i++) {
        if (seq[i] == 0) n_in_window++;
        if (i >= 9 && seq[i - 9] == 0) n_in_window--;
        const int64_t base = seq[i] > 0 ? seq[i] - 1 : 0;
        r = (r << 2) | base;
        const int kmax = (int)(order <= i ? order : i);
        if (n_in_window == 0) {
          for (int k = 0; k <= kmax; k++) cnt[offs[k] + (r & mask[k])]++;
        } else {
          // N in the lookback: only the reference's signed-modulo
          // all-A rescue (v == 0) still counts
          for (int k = 0; k <= kmax; k++)
            if ((r & mask[k]) == 0) cnt[offs[k]]++;
        }
      }
    }
  };
  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(worker, t);
    for (auto& th : pool) th.join();
  }
  for (int t = 0; t < n_threads; t++)
    for (int64_t i = 0; i < total_out; i++) out[i] += partial[t][i];
}

// --------------------------------------------------------------------------
// Transfer packing: BaMM codes [B, L] -> one [B, ceil(L/4) + ceil(L/8)]
// buffer holding 2-bit base codes (4 per byte, little-endian within the
// byte) followed by a 1-bit N mask.  2.67x fewer bytes over the
// host->device link than raw uint8 codes; one buffer = one transfer.
// --------------------------------------------------------------------------


// Pack one row of BaMM codes into 2-bit values + N bitmask.  Grouped by
// output byte (no read-modify-write carried across iterations) so the
// compiler vectorizes; the scalar tail handles row lengths not a
// multiple of 8.
static inline void pack_row_fast(const uint8_t* row, int64_t row_len,
                                 uint8_t* base2, uint8_t* nbits) {
  const int64_t full8 = row_len / 8;
  for (int64_t k = 0; k < full8; k++) {
    const uint8_t* p = row + k * 8;
    base2[k * 2] = (uint8_t)(((p[0] - 1) & 3) | (((p[1] - 1) & 3) << 2) |
                             (((p[2] - 1) & 3) << 4) |
                             (((p[3] - 1) & 3) << 6));
    base2[k * 2 + 1] = (uint8_t)(((p[4] - 1) & 3) | (((p[5] - 1) & 3) << 2) |
                                 (((p[6] - 1) & 3) << 4) |
                                 (((p[7] - 1) & 3) << 6));
    nbits[k] = (uint8_t)((p[0] == 0) | ((p[1] == 0) << 1) |
                         ((p[2] == 0) << 2) | ((p[3] == 0) << 3) |
                         ((p[4] == 0) << 4) | ((p[5] == 0) << 5) |
                         ((p[6] == 0) << 6) | ((p[7] == 0) << 7));
  }
  for (int64_t j = full8 * 8; j < row_len; j++) {
    const uint8_t c = row[j];
    base2[j >> 2] |= (uint8_t)(((c - 1) & 3) << ((j & 3) * 2));
    if (c == 0) nbits[j >> 3] |= (uint8_t)(1 << (j & 7));
  }
}

extern "C" void pack_codes_native(const uint8_t* codes, int64_t n_rows,
                                  int64_t row_len, uint8_t* out) {
  const int64_t c4 = (row_len + 3) / 4;
  const int64_t c8 = (row_len + 7) / 8;
  const int64_t out_stride = c4 + c8;
  parallel_ranges(n_rows, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; r++) {
      const uint8_t* row = codes + r * row_len;
      uint8_t* base2 = out + r * out_stride;
      uint8_t* nbits = base2 + c4;
      memset(base2, 0, out_stride);
      pack_row_fast(row, row_len, base2, nbits);
    }
  });
}

// --------------------------------------------------------------------------
// Count-table reconstruction from the canonical-id compaction.
//
// In BOTH_STRANDS mode every window scatters to min(id, revcomp(id)), so
// the device table is nonzero only at canonical ids; the host fetches
// just those (4^W + 4^(W/2))/2 entries and mirrors them here
// (reference mirror step: src/base_pattern.cpp:386-392).  vals holds
// the canonical entries in ascending-id order.
// --------------------------------------------------------------------------

extern "C" void mirror_canonical_u16(const uint16_t* vals, int w,
                                     int32_t* out) {
  const int64_t n = (int64_t)1 << (2 * w);
  const uint32_t* lut = rc8_lut();
  int64_t pos = 0;
  for (int64_t id = 0; id < n; id++) {
    int64_t rc = revcomp_id_fast(id, w, lut);
    if (id <= rc) {
      int32_t v = (int32_t)vals[pos++];
      out[id] = v;
      out[rc] = v;
    }
  }
}

extern "C" void mirror_canonical_i32(const int32_t* vals, int w,
                                     int32_t* out) {
  const int64_t n = (int64_t)1 << (2 * w);
  const uint32_t* lut = rc8_lut();
  int64_t pos = 0;
  for (int64_t id = 0; id < n; id++) {
    int64_t rc = revcomp_id_fast(id, w, lut);
    if (id <= rc) {
      int32_t v = vals[pos++];
      out[id] = v;
      out[rc] = v;
    }
  }
}

// --------------------------------------------------------------------------
// Exact dedup fix-up for suspicious rows (same-pattern occurrence chains
// with gaps < W).  For each row: recompute the exact greedy non-overlap
// acceptance (reference: src/base_pattern.cpp:362-366) and the naive
// vectorized acceptance the device used, and emit the sparse count
// delta.  Deltas from all rows are accumulated into (ids, dv) pairs;
// returns the number of pairs (<= capacity R * (L - W + 1)).
// --------------------------------------------------------------------------

extern "C" int64_t dedup_fixup_rows(const uint8_t* codes, int64_t n_rows,
                                    int64_t row_len, int w, int both_strands,
                                    int64_t* out_ids, int32_t* out_dv) {
  const int64_t n_win = row_len - w + 1;
  int64_t n_out = 0;
  if (n_win <= 0) return 0;
  std::vector<int64_t> cid(n_win);
  std::vector<uint8_t> naive(n_win), exact(n_win);
  std::vector<int64_t> last_pos;
  for (int64_t r = 0; r < n_rows; r++) {
    const uint8_t* row = codes + r * row_len;
    // window ids (little-endian digits, reference: src/base_pattern.h:20-29)
    for (int64_t j = 0; j < n_win; j++) {
      int64_t fwd = 0, rc = 0;
      bool valid = true;
      for (int p = 0; p < w; p++) {
        int c = row[j + p];
        if (c == 0) { valid = false; break; }
        fwd += (int64_t)(c - 1) << (2 * p);
        rc += (int64_t)(4 - c) << (2 * (w - 1 - p));
      }
      cid[j] = valid ? (both_strands ? std::min(fwd, rc) : fwd) : -1;
    }
    // post-N skip (reference scan quirk, see ops/counting.py
    // scan_skip_mask): skip(s) = isN(s-1) & clean(s-d) & !skip(s-d),
    // d = w + 1; skipped windows are neither counted nor eligible
    {
      const int64_t d = w + 1;
      // clean(s) = window s has no N (cid >= 0 equals clean here since
      // skip hasn't been applied to cid yet)
      std::vector<uint8_t> skip(n_win, 0);
      for (int64_t s = d; s < n_win; s++) {
        skip[s] = (row[s - 1] == 0) && (cid[s - d] >= 0) && !skip[s - d];
      }
      for (int64_t s = 0; s < n_win; s++) {
        if (skip[s]) cid[s] = -1;
      }
    }
    // naive: blocked if any same-id window in the previous W-1 positions
    for (int64_t j = 0; j < n_win; j++) {
      bool blocked = false;
      if (cid[j] >= 0) {
        for (int64_t d = 1; d <= std::min((int64_t)w - 1, j); d++) {
          if (cid[j - d] == cid[j]) { blocked = true; break; }
        }
      }
      naive[j] = (cid[j] >= 0) && !blocked;
    }
    // exact: greedy last-accepted-position rule
    std::fill(exact.begin(), exact.end(), 0);
    // hash-free: last acceptance map via sorted probing would be slow;
    // use an open-address map sized to the row (few hundred windows)
    struct Slot { int64_t id; int64_t pos; };
    size_t cap = 1;
    while (cap < (size_t)n_win * 2) cap <<= 1;
    std::vector<Slot> map(cap, {-1, -1});
    for (int64_t j = 0; j < n_win; j++) {
      int64_t id = cid[j];
      if (id < 0) continue;
      size_t h = ((uint64_t)id * 0x9E3779B97F4A7C15ull) & (cap - 1);
      while (map[h].id != -1 && map[h].id != id) h = (h + 1) & (cap - 1);
      if (map[h].id == -1 || j - map[h].pos >= w) {
        exact[j] = 1;
        map[h].id = id;
        map[h].pos = j;
      }
    }
    for (int64_t j = 0; j < n_win; j++) {
      if (naive[j] != exact[j]) {
        out_ids[n_out] = cid[j];
        out_dv[n_out] = exact[j] ? 1 : -1;
        n_out++;
      }
    }
  }
  return n_out;
}

// --------------------------------------------------------------------------
// Full host-native counting path (adaptive dispatch).
//
// The device program (ops/counting.py) wins on large corpora and on
// device meshes, but a tunneled accelerator pays tens of ms of
// dispatch + transfer latency that dominates small inputs; this
// threaded host scan produces the identical table and ltot.  Semantics
// match the device path exactly: window validity (no N), the reference
// scan's post-N skip recurrence (skip(s) = isN(s-1) & clean(s-d) &
// !skip(s-d), d = w+1), greedy non-overlap acceptance on canonical ids
// (reference: src/base_pattern.cpp:362-366), ltot over processed
// windows including rejected ones (src/base_pattern.cpp:367), and
// revcomp mirroring for BOTH_STRANDS (src/base_pattern.cpp:386-392).
// --------------------------------------------------------------------------

namespace {

void count_rows_range(const uint8_t* codes, int64_t row_lo, int64_t row_hi,
                      int64_t row_len, int w, int both_strands,
                      int32_t* table, int64_t* ltot_acc) {
  const int64_t n_win = row_len - w + 1;
  if (n_win <= 0) return;
  const int64_t mask = ((int64_t)1 << (2 * w)) - 1;
  const int shift_hi = 2 * (w - 1);
  const int64_t d = w + 1;
  int64_t ltot = 0;
  // rings for the post-N skip recurrence (indexed by s % d)
  std::vector<uint8_t> clean_ring(d), skip_ring(d);
  // open-address map id -> last accepted window start, rebuilt per row
  struct Slot { int64_t id; int64_t pos; };
  size_t cap = 1;
  while (cap < (size_t)n_win * 2) cap <<= 1;
  std::vector<Slot> map(cap);
  for (int64_t r = row_lo; r < row_hi; r++) {
    const uint8_t* row = codes + r * row_len;
    for (size_t i = 0; i < cap; i++) map[i] = {-1, -1};
    int64_t fwd = 0, rc = 0;
    int64_t last_n = -1;  // most recent N position seen so far
    // prime the first w-1 bases
    for (int64_t t = 0; t < w - 1; t++) {
      const int c = row[t];
      if (c == 0) last_n = t;
      // N (c == 0) gets a masked dummy digit: windows containing it
      // are invalid anyway, and an unmasked value would carry into
      // neighboring digits of later, valid windows
      fwd = (fwd >> 2) + ((int64_t)((c - 1) & 3) << shift_hi);
      rc = ((rc << 2) & mask) + ((4 - c) & 3);
    }
    for (int64_t s = 0; s < n_win; s++) {
      const int c = row[s + w - 1];
      if (c == 0) last_n = s + w - 1;
      // N (c == 0) gets a masked dummy digit: windows containing it
      // are invalid anyway, and an unmasked value would carry into
      // neighboring digits of later, valid windows
      fwd = (fwd >> 2) + ((int64_t)((c - 1) & 3) << shift_hi);
      rc = ((rc << 2) & mask) + ((4 - c) & 3);
      const bool clean = last_n < s;
      bool skip = false;
      if (s >= d) {
        skip = (row[s - 1] == 0) && clean_ring[s % d] && !skip_ring[s % d];
      }
      clean_ring[s % d] = clean;
      skip_ring[s % d] = skip;
      if (!clean || skip) continue;
      ltot++;
      const int64_t id = both_strands ? std::min(fwd, rc) : fwd;
      size_t h = ((uint64_t)id * 0x9E3779B97F4A7C15ull) & (cap - 1);
      while (map[h].id != -1 && map[h].id != id) h = (h + 1) & (cap - 1);
      if (map[h].id == -1 || s - map[h].pos >= w) {
        table[id]++;
        map[h].id = id;
        map[h].pos = s;
      }
    }
  }
  *ltot_acc += ltot;
}

}  // namespace

extern "C" int64_t count_rows_exact(const uint8_t* codes, int64_t n_rows,
                                    int64_t row_len, int w, int both_strands,
                                    int n_threads, int32_t* table_out) {
  const int64_t n = (int64_t)1 << (2 * w);
  memset(table_out, 0, sizeof(int32_t) * n);
  if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  // per-thread tables; cap the replication for very wide W
  const int64_t max_extra = ((int64_t)512 << 20) / (int64_t)(sizeof(int32_t) * n);
  if (n_threads > max_extra) n_threads = (int)std::max<int64_t>(1, max_extra);
  if (n_threads > n_rows) n_threads = (int)std::max<int64_t>(1, n_rows);
  int64_t ltot = 0;
  if (n_threads == 1) {
    count_rows_range(codes, 0, n_rows, row_len, w, both_strands, table_out,
                     &ltot);
  } else {
    std::vector<std::vector<int32_t>> tables(n_threads - 1);
    std::vector<int64_t> ltots(n_threads, 0);
    std::vector<std::thread> pool;
    const int64_t chunk = (n_rows + n_threads - 1) / n_threads;
    for (int t = 1; t < n_threads; t++) {
      tables[t - 1].assign(n, 0);
      const int64_t lo = t * chunk;
      const int64_t hi = std::min(n_rows, lo + chunk);
      pool.emplace_back([=, &tables, &ltots]() {
        if (lo < hi)
          count_rows_range(codes, lo, hi, row_len, w, both_strands,
                           tables[t - 1].data(), &ltots[t]);
      });
    }
    count_rows_range(codes, 0, std::min(n_rows, chunk), row_len, w,
                     both_strands, table_out, &ltots[0]);
    for (auto& th : pool) th.join();
    for (int t = 1; t < n_threads; t++) {
      const int32_t* src = tables[t - 1].data();
      parallel_ranges(n, [=](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) table_out[i] += src[i];
      });
    }
    for (int t = 0; t < n_threads; t++) ltot += ltots[t];
  }
  if (both_strands) {
    // mirror canonical counts to reverse-complement ids
    const uint32_t* lut = rc8_lut();
    for (int64_t id = 0; id < n; id++) {
      const int64_t rcid = revcomp_id_fast(id, w, lut);
      if (id < rcid) table_out[rcid] = table_out[id];
    }
  }
  return ltot;
}

// --------------------------------------------------------------------------
// Optimization scores with exact reference float semantics.
// (reference: src/utils.h:10-37, src/iupac_pattern.cpp:446-469,648-689)
// --------------------------------------------------------------------------

namespace {

inline float entropy_f(float p) {
  return -p * log(p) - (1 - p) * log(1 - p);  // double math, float return
}

inline float mi_fast(float obs, float expd, unsigned n, float q) {
  float p_obs = 1 - exp(-(obs / (float)n));
  float p_exp = 1 - exp(-(expd / (float)n));
  float p = p_obs * q + p_exp * (1 - q);
  return -q * entropy_f(p_obs) - (1 - q) * entropy_f(p_exp) + entropy_f(p);
}

inline float mi_score(float obs, float expd, unsigned n_sequences) {
  if (obs < expd) return 0;
  float score = 0;
  for (float q : {0.5, 0.1, 0.01}) {
    score += mi_fast(obs, expd, n_sequences, q) / entropy_f(q);
  }
  return -score;
}

// log(8) etc. per IUPAC letter (reference: src/iupac_pattern.cpp:199-210)
inline const float* log_bonferroni_table() {
  static float t[11];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 4; i++) t[i] = log(8);
    for (int i = 4; i < 8; i++) t[i] = log(16);
    t[8] = t[9] = log(24);
    t[10] = log(6);
    init = true;
  }
  return t;
}

inline float iupac_logpval(uint64_t n_sites, float mu, float zscore,
                           const int32_t* digits, int w) {
  if (n_sites == 0) return INFINITY;
  float frac = 1 - mu / (float)(n_sites + 1);
  float log_pvalue = 0;
  if ((float)n_sites > mu && n_sites > 5 && zscore > 2) {
    log_pvalue = (double)n_sites * log(mu / (float)n_sites) + (double)n_sites
                 - mu - 0.5 * log(6.283 * (double)n_sites * frac * frac);
  }
  const float* lb = log_bonferroni_table();
  for (int p = 0; p < w; p++) log_pvalue += lb[digits[p]];
  return log_pvalue;
}

}  // namespace

// Seed (base-pattern) optimization score with the reference binary's
// exact float semantics (reference: src/base_pattern.cpp:184-224).
// score_type 1 = ENRICHMENT/ExpCounts, 2 = MUTUAL_INFO (LOGPVAL reads
// the precomputed table host-side).
extern "C" float base_opt_score(int score_type, uint32_t observed,
                                float expected, uint64_t pseudo,
                                uint32_t n_sequences) {
  if (score_type == 1) {
    return (expected + (float)pseudo) / (float)observed;
  }
  return mi_score((float)observed, expected, n_sequences);
}

// Aggregation + statistics + optimization score in one pass.
// score_type: 0 = LOGPVAL, 1 = ENRICHMENT/ExpCounts, 2 = MUTUAL_INFO.
extern "C" void iupac_aggregate_score(
    const int32_t* digit_batch, int n_candidates, int w, int both_strands,
    const int32_t* counts, const float* expected, const float* bgp,
    int score_type, uint64_t pseudo_expected, uint32_t n_sequences,
    uint64_t* counts_out, float* expected_out, float* bgp_out,
    float* zscore_out, float* logp_out, float* score_out) {
  iupac_aggregate_exact(digit_batch, n_candidates, w, both_strands, counts,
                        expected, bgp, counts_out, expected_out, bgp_out);
  for (int c = 0; c < n_candidates; c++) {
    uint64_t n_sites = counts_out[c];
    float mu = expected_out[c];
    // (counts - mu) is float arithmetic; sqrt(float) promotes to the
    // global double sqrt in the reference, so the division is double
    // (reference: src/iupac_pattern.cpp:446)
    float z = (float)(((float)n_sites - mu) / sqrt((double)mu));
    zscore_out[c] = z;
    float lp = iupac_logpval(n_sites, mu, z, digit_batch + (int64_t)c * w, w);
    logp_out[c] = lp;
    if (score_type == 0) {
      score_out[c] = lp;
    } else if (score_type == 1) {
      score_out[c] = (mu + (float)pseudo_expected) / (float)n_sites;
    } else {
      score_out[c] = mi_score((float)n_sites, mu, n_sequences);
    }
  }
}

// --------------------------------------------------------------------------
// PWM similarity / merge search with exact reference float semantics
// (reference: src/iupac_pattern.cpp:539-615).  PWMs are [L, 4] row-major.
// --------------------------------------------------------------------------

namespace {

inline float calc_d(const float* p1, const float* p2, int off1, int off2,
                    int l, float eps) {
  float d = 0;
  for (int i = 0; i < l; i++) {
    for (int a = 0; a < 4; a++) {
      float x1 = p1[(off1 + i) * 4 + a];
      float x2 = p2[(off2 + i) * 4 + a];
      float mean = (x1 + x2 + 2 * eps) / 2;
      d += (x1 + eps) * log2(x1 + eps) + (x2 + eps) * log2(x2 + eps)
           - 2 * mean * log2(mean);
    }
  }
  return d;
}

inline float calc_d_bg(const float* p, const float* bg, int l, int off,
                       float eps) {
  float d = 0;
  for (int i = 0; i < l; i++) {
    for (int a = 0; a < 4; a++) {
      float x = p[(off + i) * 4 + a];
      float mean = (x + bg[a] + 2 * eps) / 2;
      d += (x + eps) * log2(x + eps) + (bg[a] + eps) * log2(bg[a] + eps)
           - 2 * mean * log2(mean);
    }
  }
  return d;
}

inline float calc_s(const float* p1, const float* p2, const float* bg,
                    int off1, int off2, int l) {
  const float eps = 1E-4;
  return 0.5f * (calc_d_bg(p1, bg, l, off1, eps)
                 + calc_d_bg(p2, bg, l, off2, eps))
         - calc_d(p1, p2, off1, off2, l, eps);
}

}  // namespace

extern "C" float calculate_s_single(const float* p1, const float* p2,
                                    const float* bg, int off1, int off2,
                                    int l) {
  return calc_s(p1, p2, bg, off1, off2, l);
}

extern "C" float calculate_d_bg_single(const float* p, const float* bg,
                                       int l, int off) {
  return calc_d_bg(p, bg, l, off, 1E-4);
}

// Per-pattern log p-values over the whole table with exact reference
// float/double semantics incl. glibc log
// (reference: src/base_pattern.cpp:231-250).
extern "C" void base_log_pvalues_table(const int32_t* counts,
                                       const float* expected, int64_t n,
                                       float* out) {
  parallel_ranges(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      size_t counter = (size_t)counts[i];
      if (counter == 0) {
        out[i] = INFINITY;
        continue;
      }
      float mu = expected[i];
      float frac = 1.0 - mu / (counter + 1);
      if (counter > mu && counter > 5) {
        out[i] = counter * log(mu / counter) + counter - mu
                 - 0.5 * log(6.283 * counter * frac * frac);
      } else {
        out[i] = 0;
      }
    }
  });
}

// Expected counts + z-scores over the whole table in one threaded pass
// with the reference's exact float/double promotion points
// (reference: src/base_pattern.cpp:252-265): expected = bg_prob * (float)ltot
// in float32; the z numerator subtracts size_t - float in float32, the
// unqualified sqrt is the double overload so the division runs in double
// before rounding back to float.
extern "C" void base_stats_table(const int32_t* counts, const float* bgp,
                                 int64_t n, int64_t ltot,
                                 float* expected_out, float* zscores_out) {
  const float ltot_f = (float)ltot;
  parallel_ranges(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      float e = bgp[i] * ltot_f;
      expected_out[i] = e;
      float num = (float)((size_t)counts[i] - e);
      zscores_out[i] = (float)((double)num / sqrt((double)e));
    }
  });
}

// Seed-selection threshold walk over the z-sorted pattern order
// (reference: select_base_patterns, src/base_pattern.cpp:443-515):
// stop at the first pattern below the z threshold, skip low-count
// patterns, skip patterns whose (reverse-complement) id was already
// seen, and optionally mask all Hamming-1 neighbors of each selection.
// `out` must hold at least as many slots as patterns at or above the
// threshold (including NaN z-scores, which never break the walk).
extern "C" int64_t select_patterns_walk(
    const uint32_t* order, const float* z, const int32_t* counts,
    int64_t n, int w, float z_thr, int32_t count_thr,
    int single_stranded, int filter_neighbors, uint32_t* out) {
  std::vector<uint8_t> seen(n, 0);
  const uint32_t* lut = rc8_lut();
  int64_t n_sel = 0;
  for (int64_t idx = 0; idx < n; idx++) {
    const uint32_t pat = order[idx];
    if (z[pat] < z_thr) break;
    if (counts[pat] < count_thr) continue;
    bool ok;
    if (single_stranded) {
      ok = !seen[pat];
    } else {
      int64_t rc = revcomp_id_fast((int64_t)pat, w, lut);
      ok = !seen[pat] && !seen[rc];
    }
    if (!ok) continue;
    out[n_sel++] = pat;
    seen[pat] = 1;
    if (filter_neighbors) {
      int64_t p4 = 1;
      for (int p = 0; p < w; p++) {
        const int64_t c = ((int64_t)pat >> (2 * p)) & 3;
        const int64_t masked = (int64_t)pat - c * p4;
        for (int64_t letter = 0; letter < 4; letter++)
          seen[masked + letter * p4] = 1;
        p4 <<= 2;
      }
    }
  }
  return n_sel;
}

// Background probability tables with the reference's exact left-to-right
// float32 multiply order (reference: src/base_pattern.cpp:285-325), plus
// optional double-strand aggregation (src/base_pattern.cpp:268-283).
// v_concat packs v[0]..v[order] back to back; v_off[k] is v[k]'s offset.
extern "C" void bg_prob_table_native(const float* v_concat,
                                     const int64_t* v_off, int order, int w,
                                     int both_strands, float* out) {
  const int64_t n = (int64_t)1 << (2 * w);
  // rev[k][x]: base4-reverse of the (k+1)-digit sub-word (pattern ids
  // are little-endian, BaMM kmer ids big-endian)
  std::vector<std::vector<int32_t>> rev(order + 1);
  for (int k = 0; k <= order; k++) {
    int n_digits = k + 1;
    rev[k].resize((size_t)1 << (2 * n_digits));
    for (int64_t x = 0; x < (int64_t)rev[k].size(); x++) {
      int32_t r = 0;
      for (int j = 0; j < n_digits; j++)
        r |= ((x >> (2 * j)) & 3) << (2 * (n_digits - 1 - j));
      rev[k][x] = r;
    }
  }
  std::vector<float> base(both_strands ? (size_t)n : 0);
  float* dst = both_strands ? base.data() : out;
  const std::vector<std::vector<int32_t>>& revr = rev;
  parallel_ranges(n, [&, dst](int64_t lo, int64_t hi) {
    for (int64_t id = lo; id < hi; id++) {
      float p = 1.0f;
      for (int pos = 0; pos < w; pos++) {
        int k_eff = pos < order ? pos : order;
        int64_t sub = (id >> (2 * (pos - k_eff)))
                      & (((int64_t)1 << (2 * (k_eff + 1))) - 1);
        p = p * v_concat[v_off[k_eff] + revr[k_eff][sub]];
      }
      dst[id] = p;
    }
  });
  if (both_strands) {
    const float* src = base.data();
    const uint32_t* lut = rc8_lut();
    parallel_ranges(n, [=](int64_t lo, int64_t hi) {
      for (int64_t id = lo; id < hi; id++) {
        int64_t rc = revcomp_id_fast(id, w, lut);
        out[id] = (id == rc) ? src[id] : src[id] + src[rc];
      }
    });
  }
}

// Best (s, shift, comp) over all overlaps >= min_overlap for one motif
// pair (reference: calculate_S, src/iupac_pattern.cpp:568-615).
extern "C" void calculate_best_overlap_native(
    const float* pwm1, const float* comp1, int len1, uint64_t sites1,
    const float* pwm2, const float* comp2, int len2, uint64_t sites2,
    int both_strands, const float* bg, int min_overlap,
    float* out_s, int* out_shift, int* out_comp) {
  const float* pl = pwm1;
  const float* pl_comp = comp1;
  const float* ps = pwm2;
  const float* ps_comp = comp2;
  int ll = len1, ls = len2;
  uint64_t sl = sites1, ss = sites2;
  if (len1 < len2) {
    pl = pwm2; pl_comp = comp2; ll = len2; sl = sites2;
    ps = pwm1; ps_comp = comp1; ls = len1; ss = sites1;
  }
  float max_s = -INFINITY;
  int max_shift = -255;
  int max_comp = 0;
  int n_comp = both_strands ? 2 : 1;
  for (int comp = 0; comp < n_comp; comp++) {
    for (int shift = min_overlap - ls; shift <= ll - min_overlap; shift++) {
      int off_s = -std::min(shift, 0);
      int off_l = std::max(shift, 0);
      int overlap = std::min(ll - off_l, ls - off_s);
      float s;
      if (!comp) {
        s = calc_s(pl, ps, bg, off_l, off_s, overlap);
      } else if (sl < ss) {
        s = calc_s(pl_comp, ps, bg, off_l, off_s, overlap);
      } else {
        s = calc_s(pl, ps_comp, bg, off_l, off_s, overlap);
      }
      if (s > max_s) {
        max_s = s;
        max_shift = shift;
        max_comp = comp;
      }
    }
  }
  *out_s = max_s;
  *out_shift = max_shift;
  *out_comp = max_comp;
}

namespace {

void em_prob_products(const float* pwm, int64_t n, int w, float* out) {
  // out[id] = prod_p pwm[p][digit_p(id)].  The reference recursion
  // (src/peng.cpp:180-197) extends a shared prefix product one position
  // at a time, so the prefix DP below performs the exact same
  // float32-rounded multiply chains with ~(4/3)*4^W multiplies instead
  // of W*4^W.  (The /bg[id] step is fused into the responsibility pass.)
  // level 0: 1.0f * pwm[0][a] == pwm[0][a] exactly
  for (int a = 0; a < 4; a++) out[a] = pwm[a];
  int64_t level_n = 4;
  for (int p = 1; p < w; p++) {
    const float v0 = pwm[p * 4 + 0];
    const float v1 = pwm[p * 4 + 1];
    const float v2 = pwm[p * 4 + 2];
    const float v3 = pwm[p * 4 + 3];
    for (int64_t idlow = 0; idlow < level_n; idlow++) {
      const float prefix = out[idlow];
      out[idlow] = prefix * v0;  // a = 0 lands on the slot just read
      out[idlow + level_n] = prefix * v1;
      out[idlow + 2 * level_n] = prefix * v2;
      out[idlow + 3 * level_n] = prefix * v3;
    }
    level_n <<= 2;
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
    em_prob_products(cur_old, n, w, scratch);
    // fused odds + responsibility, elementwise (vectorizable; each
    // element's op order matches the reference exactly: /bg, then
    // count*s/(1+s/odds), src/peng.cpp:118-127)
    for (int64_t id = 0; id < n; id++) {
      float odds = scratch[id] / bg[id];
      scratch[id] = counts[id] * s / (1.0f + s / odds);
    }
    // The reference interleaves cell updates over one ascending-id walk
    // (src/peng.cpp:120-127); each cell (p,a) only ever accumulates its
    // own r values in ascending id order.  One blocked ascending pass
    // with per-cell accumulators reproduces every cell's fold bit-exactly
    // while touching scratch once (vs once per position): positions 0-1
    // unroll over the 16-block, positions >= 2 see a constant digit per
    // block so their 16 adds chain directly on one accumulator.
    {
      float acc[64 * 4];
      for (int i = 0; i < w * 4; i++) acc[i] = 0.0f;
      for (int64_t blk = 0; blk < n; blk += 16) {
        const float* r = scratch + blk;
        acc[0] += r[0];  acc[1] += r[1];  acc[2] += r[2];  acc[3] += r[3];
        acc[0] += r[4];  acc[1] += r[5];  acc[2] += r[6];  acc[3] += r[7];
        acc[0] += r[8];  acc[1] += r[9];  acc[2] += r[10]; acc[3] += r[11];
        acc[0] += r[12]; acc[1] += r[13]; acc[2] += r[14]; acc[3] += r[15];
        acc[4] += r[0];  acc[4] += r[1];  acc[4] += r[2];  acc[4] += r[3];
        acc[5] += r[4];  acc[5] += r[5];  acc[5] += r[6];  acc[5] += r[7];
        acc[6] += r[8];  acc[6] += r[9];  acc[6] += r[10]; acc[6] += r[11];
        acc[7] += r[12]; acc[7] += r[13]; acc[7] += r[14]; acc[7] += r[15];
        int64_t x = blk >> 4;
        for (int p = 2; p < w; p++) {
          float* c = &acc[p * 4 + (x & 3)];
          float t = *c;
          for (int i = 0; i < 16; i++) t += r[i];
          *c = t;
          x >>= 2;
        }
      }
      for (int i = 0; i < w * 4; i++) cur_new[i] = acc[i];
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

// --------------------------------------------------------------------------
// Stream fix-up (ops/stream_count.py stream_fixup_delta, native twin).
//
// For every sequence touched by a suspicious chunk, replay the chunked
// device decisions (zero-padded skip-chain heads + in-chunk W-1-shift
// blocking + core mask) and the exact greedy scan (reference automaton,
// src/base_pattern.cpp:331-393), and emit the sparse count delta plus
// the processed-window (ltot) correction.  The Python twin walks every
// window of every affected sequence in interpreter loops (~10 ms per
// suspicious chunk); repeats in real genomes make suspicion common, so
// this path must be cheap.
// --------------------------------------------------------------------------

namespace {

struct StreamChunkDec {
  std::vector<int64_t> cid;    // per window; -1 = unprocessed
  std::vector<uint8_t> counted;
};

void stream_chunk_decisions(const uint8_t* stream, int64_t stream_len,
                            int64_t c, int64_t w, int64_t row, int64_t core,
                            int64_t ctx, int both, StreamChunkDec& out) {
  const int64_t n_win = row - w + 1;
  std::vector<uint8_t> buf(row, 0);
  const int64_t lo = c * core - ctx;
  const int64_t s0 = std::max<int64_t>(lo, 0);
  const int64_t s1 = std::min<int64_t>(lo + row, stream_len);
  if (s1 > s0) memcpy(buf.data() + (s0 - lo), stream + s0, (size_t)(s1 - s0));
  out.cid.assign(n_win, -1);
  out.counted.assign(n_win, 0);
  std::vector<uint8_t> validv(n_win, 0);
  for (int64_t j = 0; j < n_win; j++) {
    int64_t fwd = 0, rc = 0;
    bool valid = true;
    for (int64_t p = 0; p < w; p++) {
      const int cc = buf[j + p];
      if (cc == 0) { valid = false; break; }
      fwd += (int64_t)(cc - 1) << (2 * p);
      rc += (int64_t)(4 - cc) << (2 * (w - 1 - p));
    }
    validv[j] = valid;
    out.cid[j] = valid ? (both ? std::min(fwd, rc) : fwd) : -1;
  }
  // zero-padded skip-chain heads: exactly the device's chunked
  // recurrence (skip[s] = 0 for s < d), NOT the true stream history —
  // that difference is what the seam-ambiguity flag certifies
  const int64_t d = w + 1;
  std::vector<uint8_t> skip(n_win, 0);
  for (int64_t s = d; s < n_win; s++) {
    const bool a = (buf[s - 1] == 0) && validv[s - d];
    skip[s] = a && !skip[s - d];
  }
  for (int64_t s = 0; s < n_win; s++)
    if (skip[s]) out.cid[s] = -1;
  for (int64_t j = 0; j < n_win; j++) {
    if (out.cid[j] < 0 || j < ctx) continue;
    bool blocked = false;
    const int64_t dmax = std::min(w - 1, j);
    for (int64_t dd = 1; dd <= dmax; dd++)
      if (out.cid[j - dd] == out.cid[j]) { blocked = true; break; }
    out.counted[j] = !blocked;
  }
}

}  // namespace

// Returns the number of (id, dv) pairs written, or -1 if cap_out would
// be exceeded (caller falls back to the Python twin).
extern "C" int64_t stream_fixup_native(
    const uint8_t* stream, int64_t stream_len,
    const int64_t* seq_starts, const int64_t* seq_lens, int64_t n_seq,
    const int64_t* susp_chunks, int64_t n_susp,
    int64_t w, int64_t row, int64_t core, int64_t ctx, int both,
    int64_t* out_ids, int32_t* out_dv, int64_t cap_out,
    int64_t* ltot_delta_out) {
  *ltot_delta_out = 0;
  if (n_susp == 0 || n_seq == 0) return 0;
  std::vector<int64_t> seq_ends(n_seq);
  for (int64_t k = 0; k < n_seq; k++) seq_ends[k] = seq_starts[k] + seq_lens[k];

  // sequences overlapping a suspicious chunk's influence region
  std::vector<int64_t> affected;
  for (int64_t i = 0; i < n_susp; i++) {
    const int64_t c = susp_chunks[i];
    const int64_t lo = c * core - ctx;
    const int64_t hi = c * core + core + w - 1;
    const int64_t i0 =
        std::upper_bound(seq_ends.begin(), seq_ends.end(), lo) -
        seq_ends.begin();
    const int64_t i1 =
        std::lower_bound(seq_starts, seq_starts + n_seq, hi) - seq_starts;
    for (int64_t k = i0; k < i1; k++) affected.push_back(k);
  }
  std::sort(affected.begin(), affected.end());
  affected.erase(std::unique(affected.begin(), affected.end()),
                 affected.end());

  // threaded over affected sequences: per-thread chunk caches (shared
  // chunks at shard boundaries recompute — cheap vs synchronization)
  // and per-thread delta maps, merged afterwards; deltas are additive
  // so the merge order cannot change the result
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)affected.size() < 8) n_threads = 1;
  if (n_threads > (int)affected.size()) n_threads = (int)affected.size();
  if (n_threads < 1) n_threads = 1;
  std::vector<std::unordered_map<int64_t, int64_t>> deltas(n_threads);
  std::vector<int64_t> ltot_deltas(n_threads, 0);

  auto worker = [&](int tid) {
  std::unordered_map<int64_t, StreamChunkDec> chunk_cache;
  std::unordered_map<int64_t, int64_t>& delta = deltas[tid];
  int64_t& ltot_delta = ltot_deltas[tid];
  std::vector<int64_t> cid;
  std::vector<uint8_t> exact;
  for (size_t ai = tid; ai < affected.size(); ai += n_threads) {
    const int64_t k = affected[ai];
    const int64_t st = seq_starts[k];
    const int64_t ln = seq_lens[k];
    if (ln < w) continue;
    const uint8_t* seq = stream + st;
    const int64_t n_win = ln - w + 1;
    // exact scan of the fresh sequence (reference automaton)
    cid.assign(n_win, -1);
    std::vector<uint8_t> validv(n_win, 0);
    for (int64_t j = 0; j < n_win; j++) {
      int64_t fwd = 0, rc = 0;
      bool valid = true;
      for (int64_t p = 0; p < w; p++) {
        const int cc = seq[j + p];
        if (cc == 0) { valid = false; break; }
        fwd += (int64_t)(cc - 1) << (2 * p);
        rc += (int64_t)(4 - cc) << (2 * (w - 1 - p));
      }
      validv[j] = valid;
      cid[j] = valid ? (both ? std::min(fwd, rc) : fwd) : -1;
    }
    {
      const int64_t d = w + 1;
      std::vector<uint8_t> skip(n_win, 0);
      for (int64_t s = d; s < n_win; s++) {
        skip[s] = (seq[s - 1] == 0) && validv[s - d] && !skip[s - d];
      }
      for (int64_t s = 0; s < n_win; s++)
        if (skip[s]) cid[s] = -1;
    }
    exact.assign(n_win, 0);
    {
      struct Slot { int64_t id; int64_t pos; };
      size_t cap = 1;
      while (cap < (size_t)n_win * 2) cap <<= 1;
      std::vector<Slot> map(cap, {-1, -1});
      for (int64_t j = 0; j < n_win; j++) {
        const int64_t id = cid[j];
        if (id < 0) continue;
        size_t h = ((uint64_t)id * 0x9E3779B97F4A7C15ull) & (cap - 1);
        while (map[h].id != -1 && map[h].id != id) h = (h + 1) & (cap - 1);
        if (map[h].id == -1 || j - map[h].pos >= w) {
          exact[j] = 1;
          map[h].id = id;
          map[h].pos = j;
        }
      }
    }
    // compare against the device's chunked decisions
    for (int64_t j = 0; j < n_win; j++) {
      const int64_t s = st + j;
      const int64_t c = s / core;
      const int64_t local = s - c * core + ctx;
      auto it = chunk_cache.find(c);
      if (it == chunk_cache.end()) {
        it = chunk_cache.emplace(c, StreamChunkDec{}).first;
        stream_chunk_decisions(stream, stream_len, c, w, row, core, ctx,
                               both, it->second);
      }
      const StreamChunkDec& dec = it->second;
      const int dv = (int)exact[j] - (int)dec.counted[local];
      if (dv != 0) {
        const int64_t id = cid[j] >= 0 ? cid[j] : dec.cid[local];
        delta[id] += dv;
      }
      ltot_delta += (int64_t)(cid[j] >= 0) - (int64_t)(dec.cid[local] >= 0);
    }
  }
  };  // worker

  if (n_threads <= 1) {
    if (!affected.empty()) worker(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(worker, t);
    for (auto& th : pool) th.join();
  }
  std::unordered_map<int64_t, int64_t> delta;
  int64_t ltot_delta = 0;
  for (int t = 0; t < n_threads; t++) {
    ltot_delta += ltot_deltas[t];
    for (const auto& kv : deltas[t]) delta[kv.first] += kv.second;
  }
  *ltot_delta_out = ltot_delta;
  int64_t n_out = 0;
  for (const auto& kv : delta) {
    if (kv.second == 0) continue;
    if (n_out >= cap_out) return -1;
    out_ids[n_out] = kv.first;
    out_dv[n_out] = (int32_t)kv.second;
    n_out++;
  }
  return n_out;
}

// --------------------------------------------------------------------------
// Stream build + chunk + pack, fused (ops/stream_count.py layout).
//
// The Python path materializes three 50 MB+ intermediates per corpus
// (gap-padded stream, strided [m_pad, row] chunk matrix, packed
// buffer); the numpy fancy-index fill alone costs seconds at 50 Mbases.
// One threaded pass builds the gap-packed stream, and a second
// produces the packed 2-bit+Nmask chunk buffer directly from it.
// --------------------------------------------------------------------------

extern "C" void build_stream_native(
    const uint8_t* flat, const int64_t* lengths, int64_t n_seq,
    int64_t w, uint8_t* stream /* [sum(lengths) + w*(n_seq-1)] zeroed */) {
  std::vector<int64_t> seq_starts(n_seq), offs(n_seq);
  int64_t off = 0, st = 0;
  for (int64_t k = 0; k < n_seq; k++) {
    seq_starts[k] = st;
    offs[k] = off;
    off += lengths[k];
    st += lengths[k] + w;
  }
  parallel_ranges(n_seq, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; k++)
      memcpy(stream + seq_starts[k], flat + offs[k], (size_t)lengths[k]);
  });
}

// pack chunk rows [row_lo, row_lo + n_rows) — the slab-pipelined count
// path packs one slab while the device scans the previous one
extern "C" void chunk_pack_range_native(
    const uint8_t* stream, int64_t stream_len,
    int64_t row_lo, int64_t n_rows, int64_t row, int64_t core, int64_t ctx,
    uint8_t* out /* [n_rows * (ceil(row/4)+ceil(row/8))] */) {
  const int64_t c4 = (row + 3) / 4;
  const int64_t c8 = (row + 7) / 8;
  const int64_t stride = c4 + c8;
  parallel_ranges(n_rows, [&](int64_t lo_r, int64_t hi_r) {
    std::vector<uint8_t> buf(row);
    for (int64_t r = lo_r; r < hi_r; r++) {
      const int64_t c = row_lo + r;
      const int64_t lo = c * core - ctx;
      const int64_t s0 = std::max<int64_t>(lo, 0);
      const int64_t s1 = std::min<int64_t>(lo + row, stream_len);
      memset(buf.data(), 0, (size_t)row);
      if (s1 > s0) memcpy(buf.data() + (s0 - lo), stream + s0,
                          (size_t)(s1 - s0));
      uint8_t* base2 = out + r * stride;
      uint8_t* nbits = base2 + c4;
      memset(base2, 0, (size_t)stride);
      pack_row_fast(buf.data(), row, base2, nbits);
    }
  });
}

// 2-bit-only wire variant (no N-mask bytes): used when the corpus has
// no undefined bases and uniform sequence lengths — the device then
// reconstructs gap/tail/padding validity arithmetically from
// (seq_len, stream_len), so the mask third of the wire bytes never
// ships.  The host->device link is the large-corpus bottleneck
// (~15-20 MB/s through the tunnel relay), so -33%% wire is -33%% wall
// on the count fetch.
extern "C" void chunk_pack2_native(
    const uint8_t* stream, int64_t stream_len,
    int64_t m_pad, int64_t row, int64_t core, int64_t ctx,
    uint8_t* out /* [m_pad * ceil(row/4)] */) {
  const int64_t c4 = (row + 3) / 4;
  parallel_ranges(m_pad, [=](int64_t lo_r, int64_t hi_r) {
    std::vector<uint8_t> buf(row);
    for (int64_t c = lo_r; c < hi_r; c++) {
      const int64_t lo = c * core - ctx;
      const int64_t s0 = std::max<int64_t>(lo, 0);
      const int64_t s1 = std::min<int64_t>(lo + row, stream_len);
      memset(buf.data(), 0, (size_t)row);
      if (s1 > s0) memcpy(buf.data() + (s0 - lo), stream + s0,
                          (size_t)(s1 - s0));
      uint8_t* base2 = out + c * c4;
      memset(base2, 0, (size_t)c4);
      const int64_t full8 = row / 8;
      const uint8_t* p = buf.data();
      for (int64_t k = 0; k < full8; k++, p += 8) {
        base2[k * 2] = (uint8_t)(((p[0] - 1) & 3) | (((p[1] - 1) & 3) << 2) |
                                 (((p[2] - 1) & 3) << 4) |
                                 (((p[3] - 1) & 3) << 6));
        base2[k * 2 + 1] =
            (uint8_t)(((p[4] - 1) & 3) | (((p[5] - 1) & 3) << 2) |
                      (((p[6] - 1) & 3) << 4) | (((p[7] - 1) & 3) << 6));
      }
      for (int64_t j = full8 * 8; j < row; j++)
        base2[j >> 2] |= (uint8_t)(((buf[j] - 1) & 3) << ((j & 3) * 2));
    }
  });
}

extern "C" void chunk_pack_native(
    const uint8_t* stream, int64_t stream_len,
    int64_t m_pad, int64_t row, int64_t core, int64_t ctx,
    uint8_t* out /* [m_pad * (ceil(row/4)+ceil(row/8))] */) {
  const int64_t c4 = (row + 3) / 4;
  const int64_t c8 = (row + 7) / 8;
  const int64_t stride = c4 + c8;
  parallel_ranges(m_pad, [&](int64_t lo_r, int64_t hi_r) {
    std::vector<uint8_t> buf(row);
    for (int64_t c = lo_r; c < hi_r; c++) {
      const int64_t lo = c * core - ctx;
      const int64_t s0 = std::max<int64_t>(lo, 0);
      const int64_t s1 = std::min<int64_t>(lo + row, stream_len);
      memset(buf.data(), 0, (size_t)row);
      if (s1 > s0) memcpy(buf.data() + (s0 - lo), stream + s0,
                          (size_t)(s1 - s0));
      uint8_t* base2 = out + c * stride;
      uint8_t* nbits = base2 + c4;
      memset(base2, 0, (size_t)stride);
      pack_row_fast(buf.data(), row, base2, nbits);
    }
  });
}
