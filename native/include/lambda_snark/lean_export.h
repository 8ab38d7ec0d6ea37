/* Lean 4 artifact export (C string emitters).
 *
 * API parity with reference cpp-core/src/lean_ffi.cpp:152-314
 * (export_vk_to_lean, export_params_to_lean); emits the exact same term
 * shapes as the Python layer (lambda_snark_tpu/lean/export.py), asserted
 * equal in tests. Returned strings are malloc'd; free with
 * lambda_snark_string_free.
 */
#ifndef LAMBDA_SNARK_LEAN_EXPORT_H
#define LAMBDA_SNARK_LEAN_EXPORT_H

#include "lambda_snark/r1cs.h"
#include "lambda_snark/types.h"

#ifdef __cplusplus
extern "C" {
#endif

/* VK anonymous-constructor term <m, n, l, q, A, B, C> with
 * SparseMatrix.mk entries in row-major order. l = num public inputs. */
char* export_vk_to_lean(const LambdaSnarkR1cs* r1cs, uint32_t num_public);

/* Params record { n := ..., k := ..., q := ..., sigma := ..., lambda := ... }
 * using the unicode field names the reference emits. */
char* export_params_to_lean(const PublicParams* params);

void lambda_snark_string_free(char* s);

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_LEAN_EXPORT_H */
