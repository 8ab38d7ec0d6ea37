// Native FRI verifier field math: DEEP virtual-oracle evaluation and the
// fold-consistency walk (proof/fri.py::fri_verify's per-query arithmetic).
//
// Semantic contract is the Python golden path in proof/fri.py /
// proof/succinct.py (itself mirroring the reference's verifier equations,
// lib.rs:1016-1082, extended with FRI binding): exact u64 modular
// arithmetic via __uint128, no floats, no data-dependent early exits beyond
// the boolean result. Pinned against the Python path in tests/test_native.py
// and tests/test_succinct.py.
#include <cstddef>
#include <cstdint>

#include "modarith.h"

extern "C" {

// Evaluate the batched DEEP quotient oracle at the pair positions of every
// query:
//
//   g(x) = sum_k wa[k] * (f_k(x) - ea[k]) / (x - alpha[k])
//        + sum_k wb[k] * (f_k(x) - eb[k]) / (x - beta[k])
//
// where f_k(x) are the authenticated input-oracle values. Covers the kind-7
// (single statement: alpha[k] identical) and kind-8 (per-statement points)
// verifiers.
//
//   indices: [n_q] query positions i0 (pair = (i0, i0 + n0/2))
//   in_lo/in_hi: [n_q * n_in] opened values, query-major
//   wa/wb/ea/eb/alphas/betas: [n_in]
//   g_lo/g_hi: [n_q] out
//
// Returns 0 on success, -1 if a denominator vanishes (challenge point on
// the evaluation domain — verifier must reject).
int ls_fri_deep_g_eval(uint64_t q, uint64_t offset, uint64_t omega,
                       uint64_t n0, const uint64_t* indices, size_t n_q,
                       const uint64_t* in_lo, const uint64_t* in_hi,
                       size_t n_in, const uint64_t* wa, const uint64_t* wb,
                       const uint64_t* ea, const uint64_t* eb,
                       const uint64_t* alphas, const uint64_t* betas,
                       uint64_t* g_lo, uint64_t* g_hi) {
  uint64_t half = n0 / 2;
  uint64_t om_half = ls::mod_pow(omega, half, q);
  for (size_t qi = 0; qi < n_q; ++qi) {
    uint64_t x_lo = ls::mul_mod(offset, ls::mod_pow(omega, indices[qi], q), q);
    uint64_t x_hi = ls::mul_mod(x_lo, om_half, q);
    const uint64_t* row_lo = in_lo + qi * n_in;
    const uint64_t* row_hi = in_hi + qi * n_in;
    uint64_t acc_lo = 0, acc_hi = 0;
    for (size_t k = 0; k < n_in; ++k) {
      uint64_t da_lo = ls::sub_mod(x_lo, alphas[k], q);
      uint64_t db_lo = ls::sub_mod(x_lo, betas[k], q);
      uint64_t da_hi = ls::sub_mod(x_hi, alphas[k], q);
      uint64_t db_hi = ls::sub_mod(x_hi, betas[k], q);
      // one Fermat inverse for all four denominators of this (query, k)
      uint64_t prod = ls::mul_mod(ls::mul_mod(da_lo, db_lo, q),
                                  ls::mul_mod(da_hi, db_hi, q), q);
      if (prod == 0) return -1;
      uint64_t inv = ls::mod_inverse(prod, q);
      uint64_t inv_ab_lo = ls::mul_mod(inv, ls::mul_mod(da_hi, db_hi, q), q);
      uint64_t inv_ab_hi = ls::mul_mod(inv, ls::mul_mod(da_lo, db_lo, q), q);
      uint64_t ia_lo = ls::mul_mod(inv_ab_lo, db_lo, q);
      uint64_t ib_lo = ls::mul_mod(inv_ab_lo, da_lo, q);
      uint64_t ia_hi = ls::mul_mod(inv_ab_hi, db_hi, q);
      uint64_t ib_hi = ls::mul_mod(inv_ab_hi, da_hi, q);
      acc_lo = ls::add_mod(
          acc_lo,
          ls::add_mod(
              ls::mul_mod(wa[k],
                          ls::mul_mod(ls::sub_mod(row_lo[k], ea[k], q), ia_lo, q),
                          q),
              ls::mul_mod(wb[k],
                          ls::mul_mod(ls::sub_mod(row_lo[k], eb[k], q), ib_lo, q),
                          q),
              q),
          q);
      acc_hi = ls::add_mod(
          acc_hi,
          ls::add_mod(
              ls::mul_mod(wa[k],
                          ls::mul_mod(ls::sub_mod(row_hi[k], ea[k], q), ia_hi, q),
                          q),
              ls::mul_mod(wb[k],
                          ls::mul_mod(ls::sub_mod(row_hi[k], eb[k], q), ib_hi, q),
                          q),
              q),
          q);
    }
    g_lo[qi] = acc_lo;
    g_hi[qi] = acc_hi;
  }
  return 0;
}

// Fold-consistency walk for every query (value checks only; Merkle
// authentication is ls_merkle_verify_batch's job).
//
//   fold_challenges: [n_folds] (n_folds = n_layers + 1)
//   lay_lo/lay_hi:   [n_q * n_layers] opened fold-layer values, query-major
//   final_coeffs:    [n_final] the sent final polynomial
//
// Returns 1 if every query folds consistently into the final polynomial,
// 0 on any mismatch, negative on malformed arguments.
int ls_fri_fold_walk(uint64_t q, uint64_t offset, uint64_t omega, uint64_t n0,
                     const uint64_t* fold_challenges, size_t n_folds,
                     const uint64_t* indices, size_t n_q,
                     const uint64_t* g_lo, const uint64_t* g_hi,
                     const uint64_t* lay_lo, const uint64_t* lay_hi,
                     const uint64_t* final_coeffs, size_t n_final) {
  if (n_folds == 0) return -1;
  size_t n_layers = n_folds - 1;
  uint64_t inv2 = ls::mod_inverse(2, q);
  uint64_t inv_offset = ls::mod_inverse(offset, q);
  uint64_t inv_omega = ls::mod_inverse(omega, q);
  if (inv2 == 0 || inv_offset == 0 || inv_omega == 0) return -2;
  for (size_t qi = 0; qi < n_q; ++qi) {
    uint64_t pos = indices[qi];
    uint64_t size = n0;
    uint64_t off = offset, om = omega;
    uint64_t v_lo = g_lo[qi], v_hi = g_hi[qi];
    uint64_t x_inv =
        ls::mul_mod(inv_offset, ls::mod_pow(inv_omega, pos, q), q);
    for (size_t k = 0; k < n_folds; ++k) {
      uint64_t c = fold_challenges[k];
      // folded = ((lo + hi) + c * (lo - hi) / x) / 2
      uint64_t t = ls::mul_mod(ls::mul_mod(c, ls::sub_mod(v_lo, v_hi, q), q),
                               x_inv, q);
      uint64_t folded =
          ls::mul_mod(ls::add_mod(ls::add_mod(v_lo, v_hi, q), t, q), inv2, q);
      x_inv = ls::mul_mod(x_inv, x_inv, q);
      size /= 2;
      off = ls::mul_mod(off, off, q);
      om = ls::mul_mod(om, om, q);
      if (k < n_layers) {
        uint64_t half = size / 2;
        uint64_t p = pos % half;
        if (pos >= half) x_inv = ls::sub_mod(0, x_inv, q);
        uint64_t e_lo = lay_lo[qi * n_layers + k];
        uint64_t e_hi = lay_hi[qi * n_layers + k];
        uint64_t expect = pos < half ? e_lo : e_hi;
        if (folded != expect) return 0;
        v_lo = e_lo;
        v_hi = e_hi;
        pos = p;
      } else {
        uint64_t x_fin = ls::mul_mod(off, ls::mod_pow(om, pos, q), q);
        uint64_t fin = 0;
        for (size_t ci = n_final; ci-- > 0;)
          fin = ls::add_mod(ls::mul_mod(fin, x_fin, q), final_coeffs[ci] % q,
                            q);
        if (folded != fin) return 0;
      }
    }
  }
  return 1;
}

}  // extern "C"
