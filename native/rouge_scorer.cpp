// Native ROUGE-L over token-id sequences — C++ twin of
// lrp_imagecaptioning_tpu/metrics/rouge.py (itself behavior-compatible with
// the reference's vendored pycocoevalcap/rouge/rouge.py).  Rounds out the
// native scorer suite (cider_scorer.cpp, bleu_scorer.cpp,
// ptb_tokenizer.cpp): per-item max precision/recall over references from
// LCS length, combined with beta = 1.2.  Equality-tested vs the Python
// scorer in tests/test_native_cider.py.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

static int64_t lcs_len(const int32_t* a, int64_t na, const int32_t* b,
                       int64_t nb) {
  if (na < nb) { std::swap(a, b); std::swap(na, nb); }
  if (nb == 0) return 0;
  std::vector<int64_t> prev(static_cast<size_t>(nb) + 1, 0);
  std::vector<int64_t> cur(static_cast<size_t>(nb) + 1, 0);
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = 0;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j)
      cur[static_cast<size_t>(j)] =
          ai == b[j - 1] ? prev[static_cast<size_t>(j - 1)] + 1
                         : std::max(prev[static_cast<size_t>(j)],
                                    cur[static_cast<size_t>(j - 1)]);
    std::swap(prev, cur);
  }
  return prev[static_cast<size_t>(nb)];
}

}  // namespace

extern "C" {

// Layout mirrors bleu_score_ids: flattened hyp/ref id sequences with offsets
// and per-reference hypothesis-group tags.  Writes one ROUGE-L per
// hypothesis into out[n_hyp].
void rouge_score_ids(const int32_t* hyp_flat, const int64_t* hyp_off,
                     int64_t n_hyp, const int32_t* ref_flat,
                     const int64_t* ref_off, const int64_t* ref_group,
                     int64_t n_ref, double beta, double* out) {
  std::vector<std::vector<int64_t>> refs_of(static_cast<size_t>(n_hyp));
  for (int64_t r = 0; r < n_ref; ++r)
    refs_of[static_cast<size_t>(ref_group[r])].push_back(r);

  const double b2 = beta * beta;
  for (int64_t i = 0; i < n_hyp; ++i) {
    const int32_t* hyp = hyp_flat + hyp_off[i];
    const int64_t hl = hyp_off[i + 1] - hyp_off[i];
    double pmax = 0.0, rmax = 0.0;
    for (int64_t r : refs_of[static_cast<size_t>(i)]) {
      const int32_t* ref = ref_flat + ref_off[r];
      const int64_t rl = ref_off[r + 1] - ref_off[r];
      const double lcs = static_cast<double>(lcs_len(ref, rl, hyp, hl));
      pmax = std::max(pmax, hl ? lcs / static_cast<double>(hl) : 0.0);
      rmax = std::max(rmax, rl ? lcs / static_cast<double>(rl) : 0.0);
    }
    out[i] = (pmax != 0.0 && rmax != 0.0)
                 ? ((1.0 + b2) * pmax * rmax) / (rmax + b2 * pmax)
                 : 0.0;
  }
}

}  // extern "C"
