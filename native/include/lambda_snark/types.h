/* Common types and error codes for the lambda_snark_tpu native host library.
 *
 * API-shape parity with the reference C++ kernel surface
 * (reference cpp-core/include/lambda_snark/types.h:71-79 error codes,
 * PublicParams layout per rust-api/lambda-snark/src/context.rs:17-42),
 * implemented from scratch: no SEAL/NTL — __uint128_t modular arithmetic,
 * built-in Keccak/ChaCha20, Goldilocks commitment ring.
 */
#ifndef LAMBDA_SNARK_TYPES_H
#define LAMBDA_SNARK_TYPES_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum LambdaSnarkError {
  LAMBDA_SNARK_OK = 0,
  LAMBDA_SNARK_ERR_NULL_POINTER = -1,
  LAMBDA_SNARK_ERR_INVALID_ARGUMENT = -2,
  LAMBDA_SNARK_ERR_ALLOCATION = -3,
  LAMBDA_SNARK_ERR_UNSUPPORTED = -4,
  LAMBDA_SNARK_ERR_INTERNAL = -5
} LambdaSnarkError;

typedef enum LsProfile {
  LS_PROFILE_SCALAR_A = 0,
  LS_PROFILE_RING_B = 1
} LsProfile;

typedef struct PublicParams {
  uint32_t profile;       /* LsProfile */
  uint32_t security;      /* 128 / 192 / 256 */
  uint64_t modulus;       /* field modulus q (message space) */
  uint64_t ring_degree;   /* n (power of two) */
  uint64_t module_rank;   /* k */
  double sigma;           /* Gaussian width */
  uint64_t context_seed;  /* deterministic matrix-expansion seed */
} PublicParams;

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_TYPES_H */
