// R1CS validation over F_q (COO sparse, __uint128_t arithmetic).
// Semantics: reference cpp-core/src/r1cs.cpp:50-180 (NTL ZZ_p with *signed*
// entry conversion) without NTL.
#include "lambda_snark/r1cs.h"

#include <cstdio>
#include <new>
#include <vector>

#include "modarith.h"

namespace {

using ls::add_mod;
using ls::mul_mod;

uint64_t signed_reduce(uint64_t value, uint64_t q) {
  // static_cast<long> semantics: interpret as two's-complement int64
  int64_t sv = static_cast<int64_t>(value);
  if (sv >= 0) return static_cast<uint64_t>(sv) % q;
  uint64_t mag = static_cast<uint64_t>(-sv) % q;
  return mag == 0 ? 0 : q - mag;
}

}  // namespace

struct LambdaSnarkR1cs {
  uint32_t m;
  uint32_t n;
  uint64_t q;
  std::vector<SparseEntry> a, b, c;
};

namespace {

void sparse_mv(const std::vector<SparseEntry>& entries, const uint64_t* vec,
               uint64_t q, uint64_t* out, uint32_t m) {
  for (uint32_t i = 0; i < m; ++i) out[i] = 0;
  for (const SparseEntry& e : entries) {
    uint64_t val = signed_reduce(e.value, q);
    uint64_t term = mul_mod(val, vec[e.col] % q, q);
    out[e.row] = add_mod(out[e.row], term, q);
  }
}

bool entries_ok(const std::vector<SparseEntry>& entries, uint32_t m,
                uint32_t n) {
  for (const SparseEntry& e : entries)
    if (e.row >= m || e.col >= n) return false;
  return true;
}

}  // namespace

extern "C" {

LambdaSnarkR1cs* lambda_snark_r1cs_create(
    uint32_t num_constraints, uint32_t num_variables, uint64_t modulus,
    const SparseEntry* a, size_t a_len, const SparseEntry* b, size_t b_len,
    const SparseEntry* c, size_t c_len) {
  if (num_constraints == 0 || num_variables == 0 || modulus < 3) return nullptr;
  if ((a_len && !a) || (b_len && !b) || (c_len && !c)) return nullptr;
  auto* r = new (std::nothrow) LambdaSnarkR1cs();
  if (!r) return nullptr;
  r->m = num_constraints;
  r->n = num_variables;
  r->q = modulus;
  r->a.assign(a, a + a_len);
  r->b.assign(b, b + b_len);
  r->c.assign(c, c + c_len);
  if (!entries_ok(r->a, r->m, r->n) || !entries_ok(r->b, r->m, r->n) ||
      !entries_ok(r->c, r->m, r->n)) {
    delete r;
    std::fprintf(stderr, "lambda_snark_r1cs_create: entry out of bounds\n");
    return nullptr;
  }
  return r;
}

void lambda_snark_r1cs_free(LambdaSnarkR1cs* r1cs) { delete r1cs; }

uint32_t lambda_snark_r1cs_num_constraints(const LambdaSnarkR1cs* r1cs) {
  return r1cs ? r1cs->m : 0;
}

uint32_t lambda_snark_r1cs_num_variables(const LambdaSnarkR1cs* r1cs) {
  return r1cs ? r1cs->n : 0;
}

int lambda_snark_r1cs_validate_witness(const LambdaSnarkR1cs* r1cs,
                                       const uint64_t* witness, size_t len) {
  if (!r1cs || !witness) return LAMBDA_SNARK_ERR_NULL_POINTER;
  if (len != r1cs->n) return LAMBDA_SNARK_ERR_INVALID_ARGUMENT;
  if (witness[0] % r1cs->q != 1) return 0;  // z[0] == 1 convention
  std::vector<uint64_t> az(r1cs->m), bz(r1cs->m), cz(r1cs->m);
  sparse_mv(r1cs->a, witness, r1cs->q, az.data(), r1cs->m);
  sparse_mv(r1cs->b, witness, r1cs->q, bz.data(), r1cs->m);
  sparse_mv(r1cs->c, witness, r1cs->q, cz.data(), r1cs->m);
  for (uint32_t i = 0; i < r1cs->m; ++i)
    if (mul_mod(az[i], bz[i], r1cs->q) != cz[i] % r1cs->q) return 0;
  return 1;
}

int lambda_snark_r1cs_sparse_mv(const LambdaSnarkR1cs* r1cs, int which,
                                const uint64_t* vec, size_t len,
                                uint64_t* out) {
  if (!r1cs || !vec || !out) return LAMBDA_SNARK_ERR_NULL_POINTER;
  if (len != r1cs->n || which < 0 || which > 2)
    return LAMBDA_SNARK_ERR_INVALID_ARGUMENT;
  const std::vector<SparseEntry>& mat =
      which == 0 ? r1cs->a : (which == 1 ? r1cs->b : r1cs->c);
  sparse_mv(mat, vec, r1cs->q, out, r1cs->m);
  return LAMBDA_SNARK_OK;
}

}  // extern "C"
