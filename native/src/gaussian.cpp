// CDT discrete Gaussian sampler.
//
// Table construction is the double-precision operation sequence shared with
// the Python host sampler (lambda_snark_tpu/ops/gaussian.py build_cdf):
// cutoff ceil(12 sigma) (floor 8), doubled +/-k weights, ordered summation,
// u64 scaling, saturated last entry — bit-identical tables across languages.
// Reference semantics: cpp-core/src/utils.cpp:18-150 (which used x86 long
// double and std::random_device; we add the seeded ChaCha20 variant for
// deterministic artifacts).
#include "lambda_snark/utils.h"

#include <cmath>
#include <cstdint>
#include <limits>
#include <random>
#include <vector>

#include "chacha.h"

namespace {

constexpr double kTailCutoff = 12.0;

std::vector<uint64_t> build_cdf(double sigma) {
  std::vector<uint64_t> cdf;
  if (!(sigma > 0.0) || !std::isfinite(sigma)) return cdf;
  double bound_d = std::ceil(kTailCutoff * sigma);
  long bound = static_cast<long>(bound_d);
  if (bound < 8) bound = 8;
  std::vector<double> weights(bound + 1);
  double total = 0.0;
  for (long k = 0; k <= bound; ++k) {
    double w = std::exp(-(static_cast<double>(k) * static_cast<double>(k)) /
                        (2.0 * sigma * sigma));
    if (k > 0) w *= 2.0;
    weights[k] = w;
    total += w;
  }
  cdf.resize(bound + 1, 0);
  const double u64_max = static_cast<double>(UINT64_MAX);
  if (total == 0.0) {
    cdf.back() = UINT64_MAX;
    return cdf;
  }
  double scale = u64_max / total;
  double cumulative = 0.0;
  for (long k = 0; k <= bound; ++k) {
    cumulative += weights[k];
    double value = cumulative * scale;
    if (value >= u64_max) {
      cdf[k] = UINT64_MAX;
    } else if (value <= 0.0) {
      cdf[k] = 0;
    } else {
      cdf[k] = static_cast<uint64_t>(value);
    }
  }
  cdf.back() = UINT64_MAX;
  return cdf;
}

// Constant-time full-table scan: first index with cdf[k] >= u.
int64_t sample_single(const std::vector<uint64_t>& cdf, uint64_t u,
                      uint64_t sign_bit) {
  uint32_t chosen = static_cast<uint32_t>(cdf.size() - 1);
  uint64_t found = 0;
  for (size_t k = 0; k < cdf.size(); ++k) {
    const uint64_t ge_mask = static_cast<uint64_t>(cdf[k] >= u);
    const uint64_t select = ge_mask & (1ULL ^ found);
    const uint32_t mask32 = static_cast<uint32_t>(-static_cast<int32_t>(select));
    chosen = (chosen & ~mask32) | (static_cast<uint32_t>(k) & mask32);
    found |= select;
  }
  const uint64_t nonzero = static_cast<uint64_t>(chosen != 0);
  const uint64_t do_neg = (sign_bit & 1ULL) & nonzero;
  const int64_t magnitude = static_cast<int64_t>(chosen);
  const int64_t mask = -static_cast<int64_t>(do_neg);
  return (magnitude & ~mask) | ((-magnitude) & mask);
}

uint64_t random_u64(std::random_device& rd) {
  uint64_t hi = rd();
  uint64_t lo = rd();
  return (hi << 32) | (lo & 0xFFFFFFFFULL);
}

}  // namespace

extern "C" {

int sample_gaussian(uint64_t* output, size_t len, double sigma) {
  if (!output || len == 0 || !(sigma > 0.0) || !std::isfinite(sigma)) return -1;
  const std::vector<uint64_t> cdf = build_cdf(sigma);
  if (cdf.empty()) return -1;
  std::random_device rd;
  for (size_t i = 0; i < len; ++i) {
    uint64_t u = random_u64(rd);
    uint64_t sign = random_u64(rd);
    output[i] = static_cast<uint64_t>(sample_single(cdf, u, sign));
  }
  return 0;
}

int sample_gaussian_seeded(uint64_t* output, size_t len, double sigma,
                           const uint8_t key[32]) {
  if (!output || len == 0 || !key || !(sigma > 0.0) || !std::isfinite(sigma))
    return -1;
  const std::vector<uint64_t> cdf = build_cdf(sigma);
  if (cdf.empty()) return -1;
  ls::ChaCha20Rng rng(key);
  for (size_t i = 0; i < len; ++i) {
    uint64_t u = rng.next_u64();
    uint64_t sign = rng.next_u64();
    output[i] = static_cast<uint64_t>(sample_single(cdf, u, sign));
  }
  return 0;
}

int gaussian_cdt_table(double sigma, uint64_t* out, size_t out_len) {
  const std::vector<uint64_t> cdf = build_cdf(sigma);
  if (cdf.empty()) return -1;
  if (out) {
    size_t n = cdf.size() < out_len ? cdf.size() : out_len;
    for (size_t i = 0; i < n; ++i) out[i] = cdf[i];
  }
  return static_cast<int>(cdf.size());
}

}  // extern "C"
