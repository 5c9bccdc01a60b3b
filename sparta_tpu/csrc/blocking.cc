// Native greedy blocking engine.
//
// C-ABI library (loaded via ctypes) implementing the same clustering
// semantics as sparta_tpu/reorder/algos.py — which is itself bit-parity
// tested against the compiled reference (see tests/test_reference_parity.py).
// Design differs from the reference's pointer-chasing merge scans
// (blocking.cpp:859-994): row column-block signatures are packed uint64
// bitsets, a pattern-vs-row distance is a popcount loop over words, and the
// pattern keeps both its element list (for the reference's lossy merge
// semantics, utilities.cpp:145-173) and its derived block bitset.
//
// Build: g++ -O3 -march=native -shared -fPIC blocking.cc -o libsparta_blocking.so

#include <chrono>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

using std::vector;

struct Bitset {
  vector<uint64_t> w;
  explicit Bitset(size_t words) : w(words, 0) {}
  inline void set(int64_t bit) { w[bit >> 6] |= (uint64_t(1) << (bit & 63)); }
  inline void clear() { std::fill(w.begin(), w.end(), 0); }
  inline int64_t popcount() const {
    int64_t c = 0;
    for (uint64_t x : w) c += __builtin_popcountll(x);
    return c;
  }
};

inline int64_t inter_count(const uint64_t* a, const uint64_t* b, size_t words) {
  int64_t c = 0;
  for (size_t i = 0; i < words; i++) c += __builtin_popcountll(a[i] & b[i]);
  return c;
}

// measure codes match SimMeasure: 0 hamming, 1 jaccard, 2 hamming_alt, 3 jaccard_alt
inline float distance(int measure, int64_t inter, int64_t pop_a, int64_t pop_b,
                      int64_t ga, int64_t gb, int64_t elems_a, int64_t elems_b) {
  if (pop_a == 0 && pop_b == 0) return 0.0f;
  const bool hamming = (measure == 0 || measure == 2);
  if (pop_a == 0 || pop_b == 0) {
    if (hamming) {
      // element counts, not block counts (reference blocking.cpp:865)
      double m = std::max(double(elems_a) * ga, double(elems_b) * gb);
      return float(m);
    }
    return 1.0f;
  }
  int64_t aonly = pop_a - inter, bonly = pop_b - inter;
  int64_t count = (measure <= 1) ? (aonly * gb + bonly * ga)
                                 : (aonly * ga + bonly * gb);
  if (hamming) return float(count);
  double denom = double(pop_a) * ga + double(pop_b) * gb + double(count);
  return float(2.0 * count / denom);
}

// reference merge_rows semantics incl. the tail-dropping quirk
// (utilities.cpp:145-173): pattern elements greater than the largest row
// element <= max(pattern) are dropped; merging an empty row empties pattern.
void merge_rows_lossy(vector<int32_t>& pat, const int32_t* row, int64_t n) {
  if (n == 0) { pat.clear(); return; }
  if (pat.empty()) { pat.assign(row, row + n); return; }
  int32_t max_a = pat.back();
  // k = first index with row[k] > max_a
  int64_t k = std::upper_bound(row, row + n, max_a) - row;
  if (k == 0) { pat.assign(row, row + n); return; }
  int32_t cutoff = row[k - 1];
  size_t keep = std::upper_bound(pat.begin(), pat.end(), cutoff) - pat.begin();
  vector<int32_t> out;
  out.reserve(keep + n);
  std::set_union(pat.begin(), pat.begin() + keep, row, row + n,
                 std::back_inserter(out));
  pat.swap(out);
}

}  // namespace

extern "C" {

// Returns 0 on success. grouping_out[rows]; counters_out[2] =
// {comparisons, merges}; stats_out[4] = {total_merge_tau, total_row_distance,
// compare_seconds, merge_seconds}.  The merge phase (lossy merge + bitset
// rebuild) is timed per event; compare time = sweep total minus merge time
// (per-comparison clocks would dominate the ~100ns inner loop — the split
// itself mirrors the reference's CLOCKED phase timers, blocking.cpp:156-243).
int sparta_greedy_blocking(
    const int64_t* indptr, const int32_t* indices,
    int64_t rows, int64_t cols,
    int32_t col_block_size, float tau, int32_t measure,
    int32_t use_groups, int32_t use_pattern,
    int32_t strict_less, int32_t prune,
    int32_t max_size, int32_t keeper,
    int64_t* grouping_out, int64_t* counters_out, double* stats_out) {
  const int64_t nbc = (cols + col_block_size - 1) / col_block_size;
  const size_t words = size_t((nbc + 63) >> 6) > 0 ? size_t((nbc + 63) >> 6) : 1;

  // packed per-row block signatures + per-row block counts
  vector<uint64_t> sigs(size_t(rows) * words, 0);
  vector<int64_t> pop(rows), elems(rows);
  for (int64_t r = 0; r < rows; r++) {
    uint64_t* s = &sigs[size_t(r) * words];
    for (int64_t p = indptr[r]; p < indptr[r + 1]; p++) {
      int64_t blk = indices[p] / col_block_size;
      s[blk >> 6] |= (uint64_t(1) << (blk & 63));
    }
    int64_t c = 0;
    for (size_t i = 0; i < words; i++) c += __builtin_popcountll(s[i]);
    pop[r] = c;
    elems[r] = indptr[r + 1] - indptr[r];
  }

  vector<int64_t> grouping(rows, -1);
  // replicate C++ reference `float distances[rows] = {-1}`: [0]=-1, rest 0
  vector<float> distances(rows, 0.0f);
  if (rows) distances[0] = -1.0f;

  const bool use_size = use_groups != 0;
  int64_t comparisons = 0, merges = 0;
  double total_tau = 0.0, total_rowdist = 0.0;
  double merge_seconds = 0.0;
  const auto t_sweep0 = std::chrono::steady_clock::now();

  vector<int32_t> pattern;          // element list
  Bitset pat_bits(words);
  vector<std::pair<float, int64_t>> best;  // keeper near-miss (dist, row)

  for (int64_t i = 0; i < rows; i++) {
    if (grouping[i] != -1) continue;
    const int64_t group_id = (max_size > 0) ? i + rows : i;
    grouping[i] = group_id;
    vector<int64_t> merged{i};

    pattern.assign(indices + indptr[i], indices + indptr[i + 1]);
    std::memcpy(pat_bits.w.data(), &sigs[size_t(i) * words], words * 8);
    int64_t pat_pop = pop[i], pat_elems = elems[i], gsize = 1;
    best.clear();
    bool full = (max_size > 0) && int64_t(merged.size()) >= max_size;

    const float d_i = distances[i];
    for (int64_t j = i + 1; j < rows && !full; j++) {
      if (grouping[j] != -1) continue;
      if (prune && d_i != -1.0f && distances[j] != -1.0f &&
          std::fabs(d_i - distances[j]) > tau) {
        distances[j] = -1.0f;
        continue;
      }
      comparisons++;
      int64_t inter = inter_count(pat_bits.w.data(), &sigs[size_t(j) * words], words);
      float d = distance(measure, inter, pat_pop, pop[j], gsize, 1,
                         pat_elems, elems[j]);
      distances[j] = d;
      bool accept = strict_less ? (d < tau) : (d <= tau);
      if (accept) {
        grouping[j] = group_id;
        merged.push_back(j);
        merges++;
        total_tau += d;
        total_rowdist += double(j - i);
        if (use_pattern) {
          const auto t0 = std::chrono::steady_clock::now();
          merge_rows_lossy(pattern, indices + indptr[j], elems[j]);
          pat_bits.clear();
          for (int32_t e : pattern) pat_bits.set(e / col_block_size);
          pat_pop = pat_bits.popcount();
          pat_elems = int64_t(pattern.size());
          merge_seconds += std::chrono::duration<double>(
              std::chrono::steady_clock::now() - t0).count();
        }
        if (use_size || max_size > 0) gsize++;
        if (max_size > 0 && int64_t(merged.size()) >= max_size) full = true;
      } else if (keeper) {
        // keep the best (max_size - merged) near misses (documented intent
        // of the reference's UB trim, blocking.cpp:503-525)
        size_t cap = size_t(max_size - int64_t(merged.size()));
        auto pr = std::make_pair(d, j);
        auto it = std::lower_bound(best.begin(), best.end(), pr);
        best.insert(it, pr);
        if (best.size() > cap) best.resize(cap);
      }
    }

    if (keeper && !full) {
      for (auto& pr : best) {
        if (int64_t(merged.size()) >= max_size) break;
        if (grouping[pr.second] != -1) continue;
        grouping[pr.second] = group_id;
        merged.push_back(pr.second);
      }
      full = int64_t(merged.size()) >= max_size;
    }
    if (max_size > 0 && full) {
      for (int64_t r : merged) grouping[r] -= rows;
    }
  }

  std::memcpy(grouping_out, grouping.data(), size_t(rows) * 8);
  counters_out[0] = comparisons;
  counters_out[1] = merges;
  stats_out[0] = total_tau;
  stats_out[1] = total_rowdist;
  const double sweep_seconds = std::chrono::duration<double>(
      std::chrono::steady_clock::now() - t_sweep0).count();
  stats_out[2] = std::max(sweep_seconds - merge_seconds, 0.0);
  stats_out[3] = merge_seconds;
  return 0;
}

int sparta_abi_version() { return 2; }

}  // extern "C"
