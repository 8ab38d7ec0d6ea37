/* R1CS constraint validation (COO sparse matrices over F_q).
 *
 * API parity with reference cpp-core/src/ffi.cpp:27-109
 * (lambda_snark_r1cs_create/validate_witness/free/num_constraints/
 * num_variables) and cpp-core/include/lambda_snark/r1cs.h:38-58 SparseEntry,
 * own implementation: __uint128_t modular arithmetic instead of NTL.
 * Entry values use the reference's *signed* conversion semantics
 * (static_cast<long> into the field; cpp-core/src/r1cs.cpp:166).
 */
#ifndef LAMBDA_SNARK_R1CS_H
#define LAMBDA_SNARK_R1CS_H

#include "lambda_snark/types.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct SparseEntry {
  uint32_t row;
  uint32_t col;
  uint64_t value; /* interpreted as int64 two's complement, reduced mod q */
} SparseEntry;

typedef struct LambdaSnarkR1cs LambdaSnarkR1cs;

LambdaSnarkR1cs* lambda_snark_r1cs_create(
    uint32_t num_constraints, uint32_t num_variables, uint64_t modulus,
    const SparseEntry* a, size_t a_len, const SparseEntry* b, size_t b_len,
    const SparseEntry* c, size_t c_len);

void lambda_snark_r1cs_free(LambdaSnarkR1cs* r1cs);

/* Checks witness[0] == 1 and (Az) o (Bz) == Cz. 1 valid, 0 invalid, <0 err. */
int lambda_snark_r1cs_validate_witness(const LambdaSnarkR1cs* r1cs,
                                       const uint64_t* witness, size_t len);

uint32_t lambda_snark_r1cs_num_constraints(const LambdaSnarkR1cs* r1cs);
uint32_t lambda_snark_r1cs_num_variables(const LambdaSnarkR1cs* r1cs);

/* out[0..m) = M z for M in {0:A, 1:B, 2:C}. */
int lambda_snark_r1cs_sparse_mv(const LambdaSnarkR1cs* r1cs, int which,
                                const uint64_t* vec, size_t len,
                                uint64_t* out);

#ifdef __cplusplus
}
#endif

#endif /* LAMBDA_SNARK_R1CS_H */
