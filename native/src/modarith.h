// Exact u64 modular arithmetic via __uint128_t (semantic contract:
// reference rust-api/lambda-snark/src/arith.rs:7-106 and the Python golden
// path lambda_snark_tpu/core/field.py).
#ifndef LS_MODARITH_H
#define LS_MODARITH_H

#include <cstdint>

namespace ls {

inline uint64_t mul_mod(uint64_t a, uint64_t b, uint64_t q) {
  if (q <= 1) return 0;
  return static_cast<uint64_t>((static_cast<__uint128_t>(a) * b) % q);
}

inline uint64_t add_mod(uint64_t a, uint64_t b, uint64_t q) {
  if (q <= 1) return 0;
  __uint128_t s = static_cast<__uint128_t>(a) + b;
  if (s >= q) s -= q;
  return static_cast<uint64_t>(s);
}

inline uint64_t sub_mod(uint64_t a, uint64_t b, uint64_t q) {
  if (q <= 1) return 0;
  __uint128_t d = static_cast<__uint128_t>(a) + q - b;
  if (d >= q) d -= q;
  return static_cast<uint64_t>(d);
}

inline uint64_t mod_pow(uint64_t base, uint64_t exp, uint64_t q) {
  if (q <= 1) return 0;
  uint64_t result = 1 % q;
  base %= q;
  while (exp > 0) {
    if (exp & 1) result = mul_mod(result, base, q);
    base = mul_mod(base, base, q);
    exp >>= 1;
  }
  return result;
}

// Fermat inverse (odd prime q assumed by callers that require success);
// returns 0 when not invertible.
inline uint64_t mod_inverse(uint64_t value, uint64_t q) {
  if (value == 0 || q <= 1) return 0;
  uint64_t reduced = value % q;
  if (reduced == 0) return 0;
  if (q & 1) {
    uint64_t cand = mod_pow(reduced, q - 2, q);
    if (mul_mod(cand, reduced, q) == 1 % q) return cand;
  }
  // extended Euclid fallback
  __int128 t = 0, new_t = 1;
  __int128 r = q, new_r = reduced;
  while (new_r != 0) {
    __int128 quotient = r / new_r;
    __int128 tmp = t - quotient * new_t;
    t = new_t; new_t = tmp;
    tmp = r - quotient * new_r;
    r = new_r; new_r = tmp;
  }
  if (r != 1) return 0;
  if (t < 0) t += q;
  return static_cast<uint64_t>(t);
}

}  // namespace ls

#endif  // LS_MODARITH_H
