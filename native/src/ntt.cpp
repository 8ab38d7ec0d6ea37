// Negacyclic + cyclic NTT (radix-2 DIT, psi-twist). Own implementation;
// matches the golden host NTT (reference semantics ntt.rs:117-201 /
// ntt.cpp:76-119) bit-for-bit.
#include "lambda_snark/ntt.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "modarith.h"

namespace {

using ls::add_mod;
using ls::mod_inverse;
using ls::mod_pow;
using ls::mul_mod;
using ls::sub_mod;

bool is_pow2(uint64_t x) { return x && !(x & (x - 1)); }

}  // namespace

struct NttContext {
  uint64_t n;
  uint64_t q;
  uint64_t psi;       // primitive 2n-th root
  uint64_t psi_inv;
  uint64_t omega;     // psi^2, primitive n-th root
  uint64_t omega_inv;
  uint64_t n_inv;
  std::vector<uint32_t> rev;
  std::vector<uint64_t> psi_pows;      // psi^i
  std::vector<uint64_t> psi_inv_pows;  // psi^-i (no n^-1 folded)
};

extern "C" {

NttContext* ntt_context_create(uint64_t n, uint64_t modulus) {
  if (!is_pow2(n) || n < 2 || modulus < 3) return nullptr;
  if ((modulus - 1) % (2 * n) != 0) {
    std::fprintf(stderr, "ntt_context_create: q-1 not divisible by 2n\n");
    return nullptr;
  }
  // deterministic psi derivation: smallest g with g^((q-1)/2n) of order 2n
  uint64_t psi = 0;
  uint64_t exp = (modulus - 1) / (2 * n);
  for (uint64_t g = 2; g < 1000; ++g) {
    uint64_t cand = mod_pow(g, exp, modulus);
    if (cand == 0 || cand == 1) continue;
    if (mod_pow(cand, n, modulus) == modulus - 1) {
      psi = cand;
      break;
    }
  }
  if (psi == 0) {
    std::fprintf(stderr, "ntt_context_create: no 2n-th root found\n");
    return nullptr;
  }
  auto* ctx = new (std::nothrow) NttContext();
  if (!ctx) return nullptr;
  ctx->n = n;
  ctx->q = modulus;
  ctx->psi = psi;
  ctx->psi_inv = mod_inverse(psi, modulus);
  ctx->omega = mul_mod(psi, psi, modulus);
  ctx->omega_inv = mod_inverse(ctx->omega, modulus);
  ctx->n_inv = mod_inverse(n, modulus);
  if (!ctx->psi_inv || !ctx->omega_inv || !ctx->n_inv) {
    delete ctx;
    return nullptr;
  }
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
    acc = mul_mod(acc, psi, modulus);
    acc_i = mul_mod(acc_i, ctx->psi_inv, modulus);
  }
  return ctx;
}

void ntt_context_free(NttContext* ctx) { delete ctx; }

uint64_t ntt_context_psi(const NttContext* ctx) { return ctx ? ctx->psi : 0; }
uint64_t ntt_context_omega(const NttContext* ctx) {
  return ctx ? ctx->omega : 0;
}

}  // extern "C"

namespace {

void transform(const NttContext* ctx, uint64_t* data, uint64_t omega) {
  const uint64_t n = ctx->n;
  const uint64_t q = ctx->q;
  // bit-reverse permutation
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t j = ctx->rev[i];
    if (i < j) {
      uint64_t t = data[i];
      data[i] = data[j];
      data[j] = t;
    }
  }
  for (uint64_t m = 2; m <= n; m <<= 1) {
    uint64_t half = m >> 1;
    uint64_t wm = mod_pow(omega, n / m, q);
    for (uint64_t k = 0; k < n; k += m) {
      uint64_t w = 1;
      for (uint64_t j = 0; j < half; ++j) {
        uint64_t t = mul_mod(data[k + j + half], w, q);
        uint64_t u = data[k + j];
        data[k + j] = add_mod(u, t, q);
        data[k + j + half] = sub_mod(u, t, q);
        w = mul_mod(w, wm, q);
      }
    }
  }
}

}  // namespace

extern "C" {

int ntt_forward_cyclic(const NttContext* ctx, uint64_t* data) {
  if (!ctx || !data) return LAMBDA_SNARK_ERR_NULL_POINTER;
  transform(ctx, data, ctx->omega);
  return LAMBDA_SNARK_OK;
}

int ntt_inverse_cyclic(const NttContext* ctx, uint64_t* data) {
  if (!ctx || !data) return LAMBDA_SNARK_ERR_NULL_POINTER;
  transform(ctx, data, ctx->omega_inv);
  for (uint64_t i = 0; i < ctx->n; ++i)
    data[i] = mul_mod(data[i], ctx->n_inv, ctx->q);
  return LAMBDA_SNARK_OK;
}

int ntt_forward(const NttContext* ctx, uint64_t* data) {
  if (!ctx || !data) return LAMBDA_SNARK_ERR_NULL_POINTER;
  for (uint64_t i = 0; i < ctx->n; ++i)
    data[i] = mul_mod(data[i] % ctx->q, ctx->psi_pows[i], ctx->q);
  transform(ctx, data, ctx->omega);
  return LAMBDA_SNARK_OK;
}

int ntt_inverse(const NttContext* ctx, uint64_t* data) {
  if (!ctx || !data) return LAMBDA_SNARK_ERR_NULL_POINTER;
  transform(ctx, data, ctx->omega_inv);
  for (uint64_t i = 0; i < ctx->n; ++i) {
    uint64_t v = mul_mod(data[i], ctx->n_inv, ctx->q);
    data[i] = mul_mod(v, ctx->psi_inv_pows[i], ctx->q);
  }
  return LAMBDA_SNARK_OK;
}

int ntt_mul_pointwise(const NttContext* ctx, const uint64_t* a,
                      const uint64_t* b, uint64_t* out) {
  if (!ctx || !a || !b || !out) return LAMBDA_SNARK_ERR_NULL_POINTER;
  for (uint64_t i = 0; i < ctx->n; ++i)
    out[i] = mul_mod(a[i] % ctx->q, b[i] % ctx->q, ctx->q);
  return LAMBDA_SNARK_OK;
}

}  // extern "C"
