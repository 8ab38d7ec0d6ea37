/* Negacyclic + cyclic NTT over prime moduli (q = 1 mod 2n).
 *
 * API parity with reference cpp-core/include/lambda_snark/ntt.h:28-96
 * (ntt_context_create/free, ntt_forward/inverse, ntt_mul_pointwise), own
 * implementation: radix-2 DIT with psi-twist, __uint128_t Barrett-free
 * modmul. ntt_forward/inverse are the negacyclic (X^n + 1) transforms, the
 * contract of the reference's SEAL Harvey kernel; *_cyclic variants are the
 * plain (X^n - 1) transforms used by the interpolation pipeline.
 */
#ifndef LAMBDA_SNARK_NTT_H
#define LAMBDA_SNARK_NTT_H

#include "lambda_snark/types.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct NttContext NttContext;

/* q must be prime with q = 1 (mod 2n), n a power of two. The 2n-th root psi
 * is derived deterministically: smallest g in {2,3,...} whose
 * g^((q-1)/(2n)) has exact order 2n (checked via x^n == -1). */
NttContext* ntt_context_create(uint64_t n, uint64_t modulus);
void ntt_context_free(NttContext* ctx);

/* In-place negacyclic transforms on data[0..n). */
int ntt_forward(const NttContext* ctx, uint64_t* data);
int ntt_inverse(const NttContext* ctx, uint64_t* data);

/* out[i] = a[i] * b[i] mod q. */
int ntt_mul_pointwise(const NttContext* ctx, const uint64_t* a,
                      const uint64_t* b, uint64_t* out);

/* Cyclic (X^n - 1) variants. */
int ntt_forward_cyclic(const NttContext* ctx, uint64_t* data);
int ntt_inverse_cyclic(const NttContext* ctx, uint64_t* data);

/* Introspection. */
uint64_t ntt_context_psi(const NttContext* ctx);
uint64_t ntt_context_omega(const NttContext* ctx);

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_NTT_H */
