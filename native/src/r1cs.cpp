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

// --- Lean export (declared in lambda_snark/lean_export.h) -------------------
// Emits the exact term shapes of the Python layer (lean/export.py) and the
// reference lean_ffi.cpp: SparseMatrix.mk terms in row-major order with
// duplicate entries accumulated mod q and values signed-reduced.

#include <algorithm>
#include <cstring>
#include <map>
#include <sstream>
#include <string>

#include "lambda_snark/lean_export.h"

namespace {

std::string matrix_term(const std::vector<SparseEntry>& entries, uint32_t m,
                        uint32_t n, uint64_t q) {
  std::map<std::pair<uint32_t, uint32_t>, uint64_t> acc;
  for (const SparseEntry& e : entries) {
    uint64_t v = signed_reduce(e.value, q);
    auto key = std::make_pair(e.row, e.col);
    auto it = acc.find(key);
    if (it == acc.end()) {
      if (v) acc[key] = v;
    } else {
      it->second = add_mod(it->second, v, q);
      if (it->second == 0) acc.erase(it);
    }
  }
  std::ostringstream os;
  os << "SparseMatrix.mk " << m << " " << n << " [";
  bool first = true;
  for (const auto& kv : acc) {
    if (!first) os << ", ";
    os << "(" << kv.first.first << ", " << kv.first.second << ", "
       << kv.second << ")";
    first = false;
  }
  os << "]";
  return os.str();
}

char* dup_string(const std::string& s) {
  char* out = static_cast<char*>(std::malloc(s.size() + 1));
  if (out) std::memcpy(out, s.c_str(), s.size() + 1);
  return out;
}

}  // namespace

extern "C" {

char* export_vk_to_lean(const LambdaSnarkR1cs* r1cs, uint32_t num_public) {
  if (!r1cs) return nullptr;
  std::ostringstream os;
  os << "⟨" << r1cs->m << ", " << r1cs->n << ", " << num_public << ", "
     << r1cs->q << ",\n  "
     << matrix_term(r1cs->a, r1cs->m, r1cs->n, r1cs->q) << ",\n  "
     << matrix_term(r1cs->b, r1cs->m, r1cs->n, r1cs->q) << ",\n  "
     << matrix_term(r1cs->c, r1cs->m, r1cs->n, r1cs->q) << "⟩";
  return dup_string(os.str());
}

char* export_params_to_lean(const PublicParams* params) {
  if (!params) return nullptr;
  std::ostringstream os;
  os << "{ n := " << params->ring_degree << ", k := " << params->module_rank
     << ", q := " << params->modulus << ", σ := " << params->sigma
     << ", λ := " << params->security << " }";
  return dup_string(os.str());
}

void lambda_snark_string_free(char* s) { std::free(s); }

}  // extern "C"
