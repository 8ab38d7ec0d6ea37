// Deterministic Module-LWE commitments over the Goldilocks ring.
// Bit-parity with the Python host path (lambda_snark_tpu/commit/lwe.py):
// same SHAKE256 A-expansion stream, same SHA3-256 -> ChaCha20 randomness
// derivation, same CDT sampler draw order, same negacyclic convolution.
#include "lambda_snark/commitment.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <new>
#include <vector>

#include "chacha.h"
#include "keccak.h"
#include "lambda_snark/ntt.h"
#include "lambda_snark/utils.h"
#include "modarith.h"

namespace {

constexpr uint64_t kRingModulus = 18446744069414584321ULL;  // Goldilocks
constexpr uint64_t kPrimitiveRoot = 1753635133440165772ULL;  // order 2^32
constexpr char kDomainA[] = "LSNARK-TPU/A/v1";
constexpr char kDomainRand[] = "LSNARK-TPU/rand/v1";

using ls::add_mod;
using ls::mod_inverse;
using ls::mod_pow;
using ls::mul_mod;
using ls::sub_mod;

void le64(uint64_t v, uint8_t out[8]) {
  for (int i = 0; i < 8; ++i) out[i] = static_cast<uint8_t>(v >> (8 * i));
}

}  // namespace

struct LweContext {
  uint64_t n;
  uint64_t k;
  uint64_t q_field;
  double sigma;
  uint64_t context_seed;
  uint64_t psi, psi_inv, omega, omega_inv, n_inv;
  std::vector<uint32_t> rev;
  std::vector<uint64_t> psi_pows, psi_inv_pows;
  std::vector<std::vector<uint64_t>> a_hat;  // k rows, NTT (negacyclic) domain
  std::vector<uint64_t> cdf;
};

namespace {

void gl_transform(const LweContext* ctx, uint64_t* data, uint64_t omega) {
  const uint64_t n = ctx->n;
  const uint64_t q = kRingModulus;
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t j = ctx->rev[i];
    if (i < j) std::swap(data[i], data[j]);
  }
  for (uint64_t m = 2; m <= n; m <<= 1) {
    uint64_t half = m >> 1;
    uint64_t wm = mod_pow(omega, n / m, q);
    for (uint64_t base = 0; base < n; base += m) {
      uint64_t w = 1;
      for (uint64_t j = 0; j < half; ++j) {
        uint64_t t = mul_mod(data[base + j + half], w, q);
        uint64_t u = data[base + j];
        data[base + j] = add_mod(u, t, q);
        data[base + j + half] = sub_mod(u, t, q);
        w = mul_mod(w, wm, q);
      }
    }
  }
}

void forward_negacyclic(const LweContext* ctx, uint64_t* data) {
  for (uint64_t i = 0; i < ctx->n; ++i)
    data[i] = mul_mod(data[i], ctx->psi_pows[i], kRingModulus);
  gl_transform(ctx, data, ctx->omega);
}

void inverse_negacyclic(const LweContext* ctx, uint64_t* data) {
  gl_transform(ctx, data, ctx->omega_inv);
  for (uint64_t i = 0; i < ctx->n; ++i) {
    uint64_t v = mul_mod(data[i], ctx->n_inv, kRingModulus);
    data[i] = mul_mod(v, ctx->psi_inv_pows[i], kRingModulus);
  }
}

// SHAKE256 uniform words mod p (single stream, reject w >= p) — identical
// to Python _shake_words_mod_p.
std::vector<uint64_t> shake_words_mod_p(const char* tag, uint64_t context_seed,
                                        uint64_t j, size_t count) {
  ls::Shake256 xof;
  xof.absorb(reinterpret_cast<const uint8_t*>(tag), std::strlen(tag));
  uint8_t b[8];
  le64(context_seed, b);
  xof.absorb(b, 8);
  le64(j, b);
  xof.absorb(b, 8);
  xof.finalize();
  std::vector<uint64_t> out;
  out.reserve(count);
  while (out.size() < count) {
    uint64_t w = xof.read_u64_le();
    if (w < kRingModulus) out.push_back(w);
  }
  return out;
}

// key = SHA3-256(domain || LE64(context_seed) || LE64(seed))
void randomness_key(uint64_t context_seed, uint64_t seed, uint8_t key[32]) {
  std::vector<uint8_t> buf;
  buf.insert(buf.end(), kDomainRand, kDomainRand + std::strlen(kDomainRand));
  uint8_t b[8];
  le64(context_seed, b);
  buf.insert(buf.end(), b, b + 8);
  le64(seed, b);
  buf.insert(buf.end(), b, b + 8);
  ls::sha3_256(buf.data(), buf.size(), key);
}

// vectorized-order draws: fill 2*count u64s, then u = draws[0::2],
// sign = draws[1::2] (matches Python sample_signed_vectorized)
void sample_gaussian_stream(ls::ChaCha20Rng& rng,
                            const std::vector<uint64_t>& cdf, size_t count,
                            std::vector<int64_t>& out) {
  std::vector<uint64_t> draws(2 * count);
  for (size_t i = 0; i < 2 * count; ++i) draws[i] = rng.next_u64();
  out.resize(count);
  for (size_t i = 0; i < count; ++i) {
    uint64_t u = draws[2 * i];
    uint64_t sign = draws[2 * i + 1] & 1ULL;
    int64_t mag = 0;
    for (size_t t = 0; t < cdf.size(); ++t) mag += (cdf[t] < u) ? 1 : 0;
    if (sign && mag != 0) mag = -mag;
    out[i] = mag;
  }
}

uint64_t signed_to_ring(int64_t v) {
  return v >= 0 ? static_cast<uint64_t>(v)
                : kRingModulus - static_cast<uint64_t>(-v);
}

void derive_randomness(const LweContext* ctx, uint64_t seed,
                       std::vector<std::vector<int64_t>>& s,
                       std::vector<int64_t>& e) {
  uint8_t key[32];
  randomness_key(ctx->context_seed, seed, key);
  ls::ChaCha20Rng rng(key);
  s.resize(ctx->k);
  for (uint64_t j = 0; j < ctx->k; ++j)
    sample_gaussian_stream(rng, ctx->cdf, ctx->n, s[j]);
  sample_gaussian_stream(rng, ctx->cdf, ctx->n, e);
}

LweCommitment* alloc_commitment(size_t n) {
  auto* c = new (std::nothrow) LweCommitment();
  if (!c) return nullptr;
  c->data = new (std::nothrow) uint64_t[n]();
  if (!c->data) {
    delete c;
    return nullptr;
  }
  c->len = n;
  return c;
}

void compute_commitment(const LweContext* ctx, const uint64_t* msg,
                        size_t msg_len, uint64_t seed, uint64_t* out) {
  const uint64_t n = ctx->n;
  std::vector<std::vector<int64_t>> s;
  std::vector<int64_t> e;
  derive_randomness(ctx, seed, s, e);
  std::vector<uint64_t> acc(n, 0);
  std::vector<uint64_t> tmp(n);
  for (uint64_t j = 0; j < ctx->k; ++j) {
    for (uint64_t i = 0; i < n; ++i) tmp[i] = signed_to_ring(s[j][i]);
    forward_negacyclic(ctx, tmp.data());
    for (uint64_t i = 0; i < n; ++i) {
      uint64_t prod = mul_mod(ctx->a_hat[j][i], tmp[i], kRingModulus);
      acc[i] = add_mod(acc[i], prod, kRingModulus);
    }
  }
  inverse_negacyclic(ctx, acc.data());
  for (uint64_t i = 0; i < n; ++i)
    acc[i] = add_mod(acc[i], signed_to_ring(e[i]), kRingModulus);
  for (size_t i = 0; i < msg_len && i < n; ++i)
    acc[i] = add_mod(acc[i], msg[i] % ctx->q_field, kRingModulus);
  std::memcpy(out, acc.data(), n * sizeof(uint64_t));
}

}  // namespace

extern "C" {

LweContext* lwe_context_create(const PublicParams* params) {
  if (!params) return nullptr;
  if (params->profile != LS_PROFILE_RING_B) {
    std::fprintf(stderr, "lwe_context_create: RingB profile required\n");
    return nullptr;
  }
  uint64_t n = params->ring_degree;
  if (n < 2 || (n & (n - 1)) != 0 || n > (1ULL << 31)) return nullptr;
  if (params->module_rank == 0 || params->modulus <= (1ULL << 24)) return nullptr;
  if (!(params->sigma >= 3.0)) {
    std::fprintf(stderr, "lwe_context_create: sigma below 3.0\n");
    return nullptr;
  }
  auto* ctx = new (std::nothrow) LweContext();
  if (!ctx) return nullptr;
  ctx->n = n;
  ctx->k = params->module_rank;
  ctx->q_field = params->modulus;
  ctx->sigma = params->sigma;
  ctx->context_seed = params->context_seed;
  ctx->psi = mod_pow(kPrimitiveRoot, (1ULL << 32) / (2 * n), kRingModulus);
  ctx->psi_inv = mod_inverse(ctx->psi, kRingModulus);
  ctx->omega = mul_mod(ctx->psi, ctx->psi, kRingModulus);
  ctx->omega_inv = mod_inverse(ctx->omega, kRingModulus);
  ctx->n_inv = mod_inverse(n, kRingModulus);
  uint32_t bits = 0;
  while ((1u << bits) < n) ++bits;
  ctx->rev.resize(n);
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t r = 0, x = static_cast<uint32_t>(i);
    for (uint32_t b = 0; b < bits; ++b) {
      r = (r << 1) | (x & 1);
      x >>= 1;
    }
    ctx->rev[i] = r;
  }
  ctx->psi_pows.resize(n);
  ctx->psi_inv_pows.resize(n);
  uint64_t acc = 1, acc_i = 1;
  for (uint64_t i = 0; i < n; ++i) {
    ctx->psi_pows[i] = acc;
    ctx->psi_inv_pows[i] = acc_i;
    acc = mul_mod(acc, ctx->psi, kRingModulus);
    acc_i = mul_mod(acc_i, ctx->psi_inv, kRingModulus);
  }
  int table_len = gaussian_cdt_table(ctx->sigma, nullptr, 0);
  if (table_len <= 0) {
    delete ctx;
    return nullptr;
  }
  ctx->cdf.resize(table_len);
  gaussian_cdt_table(ctx->sigma, ctx->cdf.data(), ctx->cdf.size());
  ctx->a_hat.resize(ctx->k);
  for (uint64_t j = 0; j < ctx->k; ++j) {
    ctx->a_hat[j] = shake_words_mod_p(kDomainA, ctx->context_seed, j, n);
    forward_negacyclic(ctx, ctx->a_hat[j].data());
  }
  return ctx;
}

void lwe_context_free(LweContext* ctx) { delete ctx; }

uint64_t lwe_context_ring_modulus(void) { return kRingModulus; }

int lwe_context_matrix_row(const LweContext* ctx, uint64_t j, uint64_t* out,
                           size_t len) {
  if (!ctx || !out) return LAMBDA_SNARK_ERR_NULL_POINTER;
  if (j >= ctx->k || len < ctx->n) return LAMBDA_SNARK_ERR_INVALID_ARGUMENT;
  std::memcpy(out, ctx->a_hat[j].data(), ctx->n * sizeof(uint64_t));
  return LAMBDA_SNARK_OK;
}

LweCommitment* lwe_commit(const LweContext* ctx, const uint64_t* msg,
                          size_t len, uint64_t seed) {
  if (!ctx || (!msg && len > 0)) return nullptr;
  if (len > ctx->n) {
    std::fprintf(stderr, "lwe_commit: message longer than ring degree\n");
    return nullptr;
  }
  LweCommitment* c = alloc_commitment(ctx->n);
  if (!c) return nullptr;
  compute_commitment(ctx, msg, len, seed, c->data);
  return c;
}

int lwe_verify_opening(const LweContext* ctx, const LweCommitment* comm,
                       const uint64_t* msg, size_t msg_len,
                       const LweOpening* opening) {
  if (!ctx || !comm || (!msg && msg_len > 0) || !opening ||
      !opening->randomness || opening->rand_len < 1)
    return LAMBDA_SNARK_ERR_NULL_POINTER;
  if (comm->len != ctx->n || msg_len > ctx->n)
    return LAMBDA_SNARK_ERR_INVALID_ARGUMENT;
  std::vector<uint64_t> expect(ctx->n);
  compute_commitment(ctx, msg, msg_len, opening->randomness[0], expect.data());
  uint64_t diff = 0;  // constant-time compare
  for (uint64_t i = 0; i < ctx->n; ++i) diff |= expect[i] ^ comm->data[i];
  return diff == 0 ? 1 : 0;
}

LweCommitment* lwe_linear_combine(const LweContext* ctx,
                                  const LweCommitment* const* comms,
                                  const uint64_t* coeffs, size_t count) {
  if (!ctx || !comms || !coeffs || count == 0) return nullptr;
  LweCommitment* out = alloc_commitment(ctx->n);
  if (!out) return nullptr;
  for (size_t idx = 0; idx < count; ++idx) {
    const LweCommitment* c = comms[idx];
    if (!c || c->len != ctx->n) {
      lwe_commitment_free(out);
      return nullptr;
    }
    uint64_t g = coeffs[idx] % kRingModulus;
    for (uint64_t i = 0; i < ctx->n; ++i) {
      uint64_t term = mul_mod(c->data[i], g, kRingModulus);
      out->data[i] = add_mod(out->data[i], term, kRingModulus);
    }
  }
  return out;
}

LweCommitment* lwe_commitment_clone(const LweCommitment* comm) {
  if (!comm) return nullptr;
  LweCommitment* c = alloc_commitment(comm->len);
  if (!c) return nullptr;
  std::memcpy(c->data, comm->data, comm->len * sizeof(uint64_t));
  return c;
}

void lwe_commitment_free(LweCommitment* comm) {
  if (!comm) return;
  delete[] comm->data;
  delete comm;
}

}  // extern "C"
