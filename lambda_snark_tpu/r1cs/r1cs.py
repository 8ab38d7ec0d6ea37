"""R1CS constraint system and the quotient-polynomial pipeline.

Mirrors the reference ``rust-api/lambda-snark/src/r1cs.rs:44-503``:
(Az) o (Bz) = Cz over F_q with sparse A, B, C; the prover's core operation is

    Q(X) = (A_z(X) * B_z(X) - C_z(X)) / Z_H(X)

where A_z/B_z/C_z interpolate the constraint evaluations over the domain H.
The domain is an explicit ``Domain`` (see ``domain.py`` for why), defaulting
to the reference-compatible dispatch ``Domain.select(m, q)``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ..core.errors import InvalidDimensionsError, InvalidWitnessError
from . import poly
from .domain import Domain
from .sparse import SparseMatrix


@dataclasses.dataclass
class R1CS:
    """R1CS instance: m constraints, n variables, l public inputs.

    Public inputs are the first l witness entries (``r1cs.rs:180-188``).
    """

    m: int
    n: int
    l: int
    a: SparseMatrix
    b: SparseMatrix
    c: SparseMatrix
    modulus: int
    domain: Optional[Domain] = None

    def __post_init__(self) -> None:
        for name, mat in (("A", self.a), ("B", self.b), ("C", self.c)):
            if mat.rows != self.m or mat.cols != self.n:
                raise InvalidDimensionsError(
                    f"matrix {name} must be {self.m}x{self.n}, got {mat.rows}x{mat.cols}"
                )
        if self.l > self.n:
            raise InvalidDimensionsError("public input count l cannot exceed n")
        if self.domain is None:
            self.domain = Domain.select(self.m, self.modulus)

    # -- basic checks --------------------------------------------------------

    def validate(self) -> None:
        """Structural validation. Reference ``r1cs.rs:186-230``."""
        if self.m == 0:
            raise InvalidDimensionsError("R1CS must have at least one constraint")
        if self.n == 0:
            raise InvalidDimensionsError("R1CS witness size must be > 0")
        if self.modulus < (1 << 24):
            raise InvalidDimensionsError(
                f"modulus {self.modulus} too small (must exceed 2^24)"
            )

    def is_satisfied(self, witness: Sequence[int]) -> bool:
        """(Az)_i * (Bz)_i == (Cz)_i for all i. Reference ``r1cs.rs:148-173``."""
        az, bz, cz = self.compute_constraint_evals(witness)
        q = self.modulus
        return all(
            (az[i] * bz[i]) % q == cz[i] % q for i in range(self.m)
        )

    def public_inputs(self, witness: Sequence[int]) -> List[int]:
        if len(witness) != self.n:
            raise InvalidDimensionsError("witness length must equal n")
        return list(witness[: self.l])

    def compute_constraint_evals(
        self, witness: Sequence[int]
    ) -> Tuple[List[int], List[int], List[int]]:
        """Az, Bz, Cz. Reference ``r1cs.rs:296-304``."""
        if len(witness) != self.n:
            raise InvalidDimensionsError(
                f"witness length {len(witness)} must equal n={self.n}"
            )
        return (
            self.a.mul_vec(witness, self.modulus),
            self.b.mul_vec(witness, self.modulus),
            self.c.mul_vec(witness, self.modulus),
        )

    # -- polynomial pipeline -------------------------------------------------

    def eval_poly(self, coeffs: Sequence[int], x: int) -> int:
        return poly.poly_eval(coeffs, x, self.modulus)

    def eval_vanishing(self, x: int) -> int:
        return self.domain.eval_vanishing(x)

    def interpolations(self, witness: Sequence[int]):
        """Interpolated A_z, B_z, C_z polynomials over the domain."""
        a_evals, b_evals, c_evals = self.compute_constraint_evals(witness)
        return (
            poly.lagrange_interpolate(a_evals, self.domain),
            poly.lagrange_interpolate(b_evals, self.domain),
            poly.lagrange_interpolate(c_evals, self.domain),
        )

    def compute_quotient_poly(self, witness: Sequence[int]) -> List[int]:
        """Q(X) = (A_z*B_z - C_z) / Z_H. Reference ``r1cs.rs:474-503``.

        Raises InvalidWitnessError when the witness fails the constraints
        (either the explicit pre-check or a nonzero division remainder).

        Roots domains use the O(m log m) odd-coset formulation (identical
        output; see ``compute_quotient_poly_longdiv`` for the oracle);
        sequential domains use the reference's schoolbook + long division.
        """
        if not self.is_satisfied(witness):
            raise InvalidWitnessError("witness does not satisfy R1CS constraints")
        if self.domain.kind == "roots" and (self.m & (self.m - 1)) == 0:
            fast = self._quotient_odd_coset(witness)
            if fast is not None:
                return fast
        a_poly, b_poly, c_poly = self.interpolations(witness)
        ab = poly.poly_mul(a_poly, b_poly, self.modulus)
        numerator = poly.poly_sub(ab, c_poly, self.modulus)
        return poly.poly_div_vanishing(numerator, self.domain)

    def compute_quotient_poly_longdiv(self, witness: Sequence[int]) -> List[int]:
        """O(m^2) oracle: schoolbook product + long division (reference path)."""
        if not self.is_satisfied(witness):
            raise InvalidWitnessError("witness does not satisfy R1CS constraints")
        a_poly, b_poly, c_poly = self.interpolations(witness)
        ab = poly.poly_mul(a_poly, b_poly, self.modulus)
        numerator = poly.poly_sub(ab, c_poly, self.modulus)
        return poly.poly_div_vanishing(numerator, self.domain)

    def _quotient_odd_coset(self, witness: Sequence[int]):
        """Host odd-coset quotient (the device pipeline's math, Python ints).

        On the odd 2m-th roots psi*w^t, Z_H = X^m - 1 is identically -2, so
        Q's negacyclic NTT is ((A.B - C) at odd points) * (-2)^-1. Needs a
        2m-th root psi with psi^2 == omega; returns None when unavailable.
        """
        from ..core import field as f
        from ..core.params import (
            NTT_FRIENDLY_MODULUS,
            NTT_MODULUS,
            NTT_PRIMITIVE_ROOT,
            ROOTS_OF_UNITY_45BIT,
        )

        q = self.modulus
        m = self.m
        psi = None
        if q == NTT_FRIENDLY_MODULUS and 2 * m in ROOTS_OF_UNITY_45BIT:
            psi = ROOTS_OF_UNITY_45BIT[2 * m]
        elif q == NTT_MODULUS and 2 * m <= (1 << 32):
            psi = f.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * m), q)
        if psi is None or f.mul_mod(psi, psi, q) != self.domain.omega % q:
            return None
        psi_pows = [1] * m
        for i in range(1, m):
            psi_pows[i] = f.mul_mod(psi_pows[i - 1], psi, q)
        psi_inv = f.mod_inverse(psi, q)
        psi_inv_pows = [1] * m
        for i in range(1, m):
            psi_inv_pows[i] = f.mul_mod(psi_inv_pows[i - 1], psi_inv, q)
        omega = self.domain.omega

        def neg_fwd(coeffs):
            tw = [f.mul_mod(c, p, q) for c, p in zip(coeffs, psi_pows)]
            return poly.ntt_forward(tw, q, omega)

        a_poly, b_poly, c_poly = self.interpolations(witness)

        def padded(p_):
            return list(p_) + [0] * (m - len(p_))

        a_odd = neg_fwd(padded(a_poly))
        b_odd = neg_fwd(padded(b_poly))
        c_odd = neg_fwd(padded(c_poly))
        neg_half_inv = f.mod_inverse(q - 2, q)
        q_odd = [
            f.mul_mod(
                f.sub_mod(f.mul_mod(a_odd[i], b_odd[i], q), c_odd[i], q),
                neg_half_inv,
                q,
            )
            for i in range(m)
        ]
        q_cyc = poly.ntt_inverse(q_odd, q, omega)
        q_coeffs = [f.mul_mod(c, p, q) for c, p in zip(q_cyc, psi_inv_pows)]
        # trim like the long-division path
        while len(q_coeffs) > 1 and q_coeffs[-1] == 0:
            q_coeffs.pop()
        return q_coeffs

    # -- misc ----------------------------------------------------------------

    def total_nnz(self) -> int:
        return self.a.nnz() + self.b.nnz() + self.c.nnz()

    def density(self) -> float:
        total = 3 * self.m * self.n
        return self.total_nnz() / total if total else 0.0
