// Native greedy matchers for the NOCS mAP harness.
//
// The reference evaluation spends a significant fraction of wall time in
// single-threaded numpy loops matching predictions to ground truths per
// (image, class, threshold) cell (evaluation/eval_utils_v1.py:297-327, 402-427).
// These are the same computations as hspose_tpu/evaluation/metrics.py's
// greedy_iou_matches / greedy_pose_matches, in portable C++ (ctypes ABI).
//
// Semantics notes (mirroring the reference exactly):
//  * IoU matcher: preds already sorted by descending score; each takes the
//    highest-overlap unmatched gt whose IoU is strictly greater than the
//    threshold.
//  * Pose matcher: preds in given order; candidate gts sorted by ascending
//    degree+cm sum (NaN last); a gt is eligible unless either error exceeds the
//    threshold — NaN errors never exceed (NaN comparisons are false), as in
//    numpy.
//
// Build: g++ -O3 -shared -fPIC -o libmatcher.so matcher.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// index sort where NaN keys sort last (numpy argsort behaviour)
std::vector<int> argsort_asc(const double* vals, int n) {
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int a, int b) {
    const double va = vals[a], vb = vals[b];
    const bool na = std::isnan(va), nb = std::isnan(vb);
    if (na || nb) return !na && nb;  // non-NaN before NaN
    return va < vb;
  });
  return idx;
}

std::vector<int> argsort_desc(const double* vals, int n) {
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int a, int b) {
    const double va = vals[a], vb = vals[b];
    const bool na = std::isnan(va), nb = std::isnan(vb);
    if (na || nb) return !na && nb;
    return va > vb;
  });
  return idx;
}

}  // namespace

extern "C" {

// overlaps: (P, G) row-major; thr: (T,);
// gt_m: (T, G), pred_m: (T, P), both filled with -1/match-index as doubles.
void greedy_iou_matches(const double* overlaps, int P, int G, const double* thr,
                        int T, double* gt_m, double* pred_m) {
  std::fill(gt_m, gt_m + (size_t)T * G, -1.0);
  std::fill(pred_m, pred_m + (size_t)T * P, -1.0);
  if (P == 0 || G == 0) return;

  std::vector<uint8_t> pred_done(T);
  for (int i = 0; i < P; ++i) {
    auto order = argsort_desc(overlaps + (size_t)i * G, G);
    std::fill(pred_done.begin(), pred_done.end(), 0);
    int remaining = T;
    for (int jj = 0; jj < G && remaining > 0; ++jj) {
      const int j = order[jj];
      const double iou = overlaps[(size_t)i * G + j];
      for (int t = 0; t < T; ++t) {
        if (pred_done[t]) continue;
        if (!(iou > thr[t])) continue;          // strict >, NaN never matches
        if (gt_m[(size_t)t * G + j] != -1.0) continue;
        gt_m[(size_t)t * G + j] = i;
        pred_m[(size_t)t * P + i] = j;
        pred_done[t] = 1;
        --remaining;
      }
    }
  }
}

// errors: (P, G, 2) row-major [deg, cm]; deg:(D,), cm:(S,);
// gt_m: (D, S, G), pred_m: (D, S, P).
void greedy_pose_matches(const double* errors, int P, int G, const double* deg,
                         int D, const double* cm, int S, double* gt_m,
                         double* pred_m) {
  std::fill(gt_m, gt_m + (size_t)D * S * G, -1.0);
  std::fill(pred_m, pred_m + (size_t)D * S * P, -1.0);
  if (P == 0 || G == 0) return;

  std::vector<double> sum_err(G);
  std::vector<uint8_t> pred_done((size_t)D * S);
  for (int i = 0; i < P; ++i) {
    for (int j = 0; j < G; ++j) {
      const double e0 = errors[((size_t)i * G + j) * 2];
      const double e1 = errors[((size_t)i * G + j) * 2 + 1];
      sum_err[j] = e0 + e1;
    }
    auto order = argsort_asc(sum_err.data(), G);
    std::fill(pred_done.begin(), pred_done.end(), 0);
    size_t remaining = (size_t)D * S;
    for (int jj = 0; jj < G && remaining > 0; ++jj) {
      const int j = order[jj];
      const double e_deg = errors[((size_t)i * G + j) * 2];
      const double e_cm = errors[((size_t)i * G + j) * 2 + 1];
      for (int d = 0; d < D; ++d) {
        // NaN comparisons are false: a NaN error never 'exceeds' the threshold
        if (e_deg > deg[d]) continue;
        for (int s = 0; s < S; ++s) {
          const size_t cell = (size_t)d * S + s;
          if (pred_done[cell]) continue;
          if (e_cm > cm[s]) continue;
          if (gt_m[cell * G + j] != -1.0) continue;
          gt_m[cell * G + j] = i;
          pred_m[cell * P + i] = j;
          pred_done[cell] = 1;
          --remaining;
        }
      }
    }
  }
}

}  // extern "C"
