// Native BLEU over token-id sequences — C++ twin of
// lrp_imagecaptioning_tpu/metrics/bleu.py::corpus_bleu, which itself is the
// behavior-compatible re-implementation of the reference's vendored
// pycocoevalcap/bleu/bleu_scorer.py.  Completes SURVEY.md §2's "native
// n-gram scorers" (CIDEr: cider_scorer.cpp; PTB tokenizer:
// ptb_tokenizer.cpp).  Consumed by the SCST reward's bleu_reward_weight
// path (engine/scst.py, reference get_self_critical_reward
// modelutils.py:200-238) — token ids straight in, no string round trip.
//
// Semantics replicated exactly (equality-tested vs the Python scorer in
// tests/test_native_cider.py):
//   - clipped n-gram precision against the per-ngram MAX reference count
//   - effective reference length options: closest (ties break toward the
//     SHORTER length — the (abs(l-t), l) min-tuple quirk), shortest, average
//   - tiny=1e-15 numerator / small=1e-9 denominator smoothing
//   - per-sentence scores from each sentence's own counts, brevity penalty
//     exp(1 - 1/ratio) applied when ratio < 1 (per sentence AND corpus)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kSmall = 1e-9;
constexpr double kTiny = 1e-15;

// Exact n-gram key: the raw bytes of the id run (length disambiguates).
using NgramCounts = std::unordered_map<std::string, int64_t>;

static void count_ngrams(const int32_t* ids, int64_t len, int n,
                         NgramCounts& out) {
  for (int k = 1; k <= n; ++k)
    for (int64_t i = 0; i + k <= len; ++i) {
      std::string key(reinterpret_cast<const char*>(ids + i),
                      static_cast<size_t>(k) * sizeof(int32_t));
      ++out[key];
    }
}

static int ngram_order(const std::string& key) {
  return static_cast<int>(key.size() / sizeof(int32_t));
}

}  // namespace

extern "C" {

// hyp_flat/hyp_off: n_hyp concatenated hypothesis id sequences
//   (hyp i = hyp_flat[hyp_off[i] .. hyp_off[i+1]))
// ref_flat/ref_off/ref_group: n_ref concatenated reference sequences, each
//   tagged with the hypothesis index it belongs to
// n_order: max n-gram order (4)
// option: 0 = closest, 1 = shortest, 2 = average
// per_out: n_hyp * n_order row-major per-sentence scores
// corpus_out: n_order corpus scores
void bleu_score_ids(const int32_t* hyp_flat, const int64_t* hyp_off,
                    int64_t n_hyp, const int32_t* ref_flat,
                    const int64_t* ref_off, const int64_t* ref_group,
                    int64_t n_ref, int32_t n_order, int32_t option,
                    double* per_out, double* corpus_out) {
  const int n = n_order;
  std::vector<std::vector<int64_t>> refs_of(static_cast<size_t>(n_hyp));
  for (int64_t r = 0; r < n_ref; ++r)
    refs_of[static_cast<size_t>(ref_group[r])].push_back(r);

  std::vector<int64_t> total_guess(static_cast<size_t>(n), 0);
  std::vector<int64_t> total_correct(static_cast<size_t>(n), 0);
  int64_t total_testlen = 0;
  double total_reflen = 0.0;

  for (int64_t i = 0; i < n_hyp; ++i) {
    const int32_t* hyp = hyp_flat + hyp_off[i];
    const int64_t testlen = hyp_off[i + 1] - hyp_off[i];

    // effective reference length
    double reflen;
    {
      const auto& rs = refs_of[static_cast<size_t>(i)];
      if (option == 2) {  // average
        double s = 0.0;
        for (int64_t r : rs) s += static_cast<double>(ref_off[r + 1] - ref_off[r]);
        reflen = s / static_cast<double>(rs.size());
      } else {
        int64_t best = ref_off[rs[0] + 1] - ref_off[rs[0]];
        for (int64_t r : rs) {
          int64_t l = ref_off[r + 1] - ref_off[r];
          if (option == 1) {  // shortest
            best = std::min(best, l);
          } else {  // closest: min over (abs(l-testlen), l) tuples
            if (std::llabs(l - testlen) < std::llabs(best - testlen) ||
                (std::llabs(l - testlen) == std::llabs(best - testlen) &&
                 l < best))
              best = l;
          }
        }
        reflen = static_cast<double>(best);
      }
    }

    // clipped counts against max reference n-gram counts
    NgramCounts maxcounts;
    for (int64_t r : refs_of[static_cast<size_t>(i)]) {
      NgramCounts rc;
      count_ngrams(ref_flat + ref_off[r], ref_off[r + 1] - ref_off[r], n, rc);
      for (const auto& kv : rc) {
        auto it = maxcounts.find(kv.first);
        if (it == maxcounts.end()) maxcounts.emplace(kv.first, kv.second);
        else it->second = std::max(it->second, kv.second);
      }
    }
    NgramCounts counts;
    count_ngrams(hyp, testlen, n, counts);

    std::vector<int64_t> guess(static_cast<size_t>(n));
    std::vector<int64_t> correct(static_cast<size_t>(n), 0);
    for (int k = 0; k < n; ++k) guess[static_cast<size_t>(k)] = std::max<int64_t>(0, testlen - k);
    for (const auto& kv : counts) {
      auto it = maxcounts.find(kv.first);
      if (it != maxcounts.end())
        correct[static_cast<size_t>(ngram_order(kv.first) - 1)] +=
            std::min(it->second, kv.second);
    }

    total_testlen += testlen;
    total_reflen += reflen;
    for (int k = 0; k < n; ++k) {
      total_guess[static_cast<size_t>(k)] += guess[static_cast<size_t>(k)];
      total_correct[static_cast<size_t>(k)] += correct[static_cast<size_t>(k)];
    }

    // per-sentence score with the same smoothing
    double b = 1.0;
    const double ratio = (static_cast<double>(testlen) + kTiny) / (reflen + kSmall);
    for (int k = 0; k < n; ++k) {
      b *= (static_cast<double>(correct[static_cast<size_t>(k)]) + kTiny) /
           (static_cast<double>(guess[static_cast<size_t>(k)]) + kSmall);
      double s = std::pow(b, 1.0 / (k + 1));
      if (ratio < 1.0) s *= std::exp(1.0 - 1.0 / ratio);
      per_out[i * n + k] = s;
    }
  }

  double b = 1.0;
  const double ratio = (static_cast<double>(total_testlen) + kTiny) /
                       (total_reflen + kSmall);
  for (int k = 0; k < n; ++k) {
    b *= (static_cast<double>(total_correct[static_cast<size_t>(k)]) + kTiny) /
         (static_cast<double>(total_guess[static_cast<size_t>(k)]) + kSmall);
    double s = std::pow(b, 1.0 / (k + 1));
    if (ratio < 1.0) s *= std::exp(1.0 - 1.0 / ratio);
    corpus_out[k] = s;
  }
}

}  // extern "C"
