/* Discrete Gaussian sampling (CDT, constant-time scan).
 *
 * API parity with reference cpp-core/include/lambda_snark/utils.h:28
 * (sample_gaussian) plus a seeded ChaCha20 variant for deterministic
 * artifacts (bit-parity with the Python host sampler).
 */
#ifndef LAMBDA_SNARK_UTILS_H
#define LAMBDA_SNARK_UTILS_H

#include "lambda_snark/types.h"

#ifdef __cplusplus
extern "C" {
#endif

/* OS-entropy sampler (reference semantics: std::random_device). Samples are
 * two's-complement-encoded signed values. Returns 0 on success. */
int sample_gaussian(uint64_t* output, size_t len, double sigma);

/* Deterministic sampler: ChaCha20 keystream keyed by key[32]; per sample one
 * u64 draw selects the magnitude, a second u64's low bit the sign. */
int sample_gaussian_seeded(uint64_t* output, size_t len, double sigma,
                           const uint8_t key[32]);

/* Expose the CDT for tests: writes min(table_len, out_len) entries, returns
 * the full table length (ceil(12 sigma) + 1, floor 8+1), or <0 on error. */
int gaussian_cdt_table(double sigma, uint64_t* out, size_t out_len);

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_UTILS_H */
