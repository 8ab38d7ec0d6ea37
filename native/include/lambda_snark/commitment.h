/* Deterministic seeded Module-LWE commitments over the Goldilocks ring.
 *
 * API parity with reference cpp-core/include/lambda_snark/commitment.h:30-122
 * (lwe_context_create/free, lwe_commit, lwe_verify_opening,
 * lwe_linear_combine, lwe_commitment_clone/free), redesigned semantics:
 * commitments are c = sum_j A_j s_j + e + m in Z_p[X]/(X^n + 1),
 * p = 2^64 - 2^32 + 1, deterministic in (context_seed, message, seed) and
 * publicly verifiable — no secret key, no encryption (the reference's seed
 * parameter was ignored and verification decrypted with the secret key;
 * commitment.cpp:142,200-232).
 *
 * Bit-parity contract: identical commitment words to the Python host path
 * (lambda_snark_tpu/commit/lwe.py) for equal inputs — same SHAKE256 matrix
 * expansion, same SHA3/ChaCha20 randomness derivation, same CDT sampler.
 */
#ifndef LAMBDA_SNARK_COMMITMENT_H
#define LAMBDA_SNARK_COMMITMENT_H

#include "lambda_snark/types.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct LweContext LweContext;

typedef struct LweCommitment {
  uint64_t* data; /* n canonical coefficients of c */
  size_t len;
} LweCommitment;

/* Opening witness: rand_len == 1 and randomness[0] == commit seed (the
 * compact seeded opening; randomness re-derives (s, e)). Mirrors the shape
 * of the reference LweOpening. */
typedef struct LweOpening {
  uint64_t* randomness;
  size_t rand_len;
} LweOpening;

LweContext* lwe_context_create(const PublicParams* params);
void lwe_context_free(LweContext* ctx);

/* Commit to msg[0..len) (reduced mod params->modulus, embedded mod p). */
LweCommitment* lwe_commit(const LweContext* ctx, const uint64_t* msg,
                          size_t len, uint64_t seed);

/* Verify a seeded opening: recompute c from (msg, opening->randomness[0])
 * and constant-time compare. Returns 1 valid, 0 invalid, <0 error. */
int lwe_verify_opening(const LweContext* ctx, const LweCommitment* comm,
                       const uint64_t* msg, size_t msg_len,
                       const LweOpening* opening);

/* Homomorphic combination sum coeffs[i] * comms[i] over the ring. */
LweCommitment* lwe_linear_combine(const LweContext* ctx,
                                  const LweCommitment* const* comms,
                                  const uint64_t* coeffs, size_t count);

LweCommitment* lwe_commitment_clone(const LweCommitment* comm);
void lwe_commitment_free(LweCommitment* comm);

/* Introspection helpers for bindings/tests. */
uint64_t lwe_context_ring_modulus(void);
int lwe_context_matrix_row(const LweContext* ctx, uint64_t j, uint64_t* out,
                           size_t len); /* NTT-domain A_j */

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_COMMITMENT_H */
