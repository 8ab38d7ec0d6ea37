"""Interpolation domains for the R1CS polynomial pipeline.

The reference selects the interpolation domain implicitly from
(modulus, m, feature flags), spread across ``r1cs.rs:385-394`` (Goldilocks
iNTT gate), ``r1cs.rs:563-607`` (45-bit roots table) and the sequential
fallback. For the 45-bit NTT-friendly modulus the reference interpolates over
the roots-of-unity domain but divides by the *sequential* vanishing polynomial
(``r1cs.rs:499-500``), which makes exact division impossible — ``prove_r1cs``
errors for that configuration (verified by simulation; see
``docs/reference_notes.md``). This framework instead makes the domain an
explicit, always self-consistent object: the Lagrange basis, the vanishing
polynomial and its evaluation all derive from the same point set.

Domain kinds:

- ``sequential``: H = {0, 1, ..., m-1}, Z_H(X) = prod (X - i).
  Used by every reference test vector (tv-0/1/2 moduli are not NTT-friendly);
  bit-exact with the reference here.
- ``roots``: H = {1, w, w^2, ..., w^{m-1}} for a primitive m-th root w,
  Z_H(X) = X^m - 1. Selected for the Goldilocks modulus (matching the
  reference's consistent iNTT path, ``r1cs.rs:385-389``) and for the 45-bit
  NTT-friendly modulus with m in the precomputed table.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..core import field
from ..core.params import (
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from ..core.errors import DomainError

SEQUENTIAL = "sequential"
ROOTS = "roots"


@dataclasses.dataclass(frozen=True)
class Domain:
    """An m-point evaluation domain over F_q."""

    kind: str
    m: int
    modulus: int
    omega: Optional[int] = None  # primitive m-th root (roots domain only)

    # -- construction --------------------------------------------------------

    @staticmethod
    def sequential(m: int, modulus: int) -> "Domain":
        return Domain(kind=SEQUENTIAL, m=m, modulus=modulus)

    @staticmethod
    def roots(m: int, modulus: int, omega: int) -> "Domain":
        return Domain(kind=ROOTS, m=m, modulus=modulus, omega=omega)

    @staticmethod
    def select(m: int, modulus: int) -> "Domain":
        """Default domain dispatch (mirrors the reference where consistent).

        - Goldilocks modulus + power-of-two m: roots domain with
          w = NTT_PRIMITIVE_ROOT^(2^32/m) (reference ``ntt.rs:226-233``).
        - 45-bit NTT-friendly modulus + m in the precomputed table: roots
          domain with the table root (reference ``r1cs.rs:534-547``).
        - otherwise: sequential domain.
        """
        if m <= 0:
            raise DomainError("domain size m must be positive")
        is_pow2 = (m & (m - 1)) == 0
        if modulus == NTT_MODULUS and is_pow2 and m <= (1 << 32):
            omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, modulus)
            return Domain.roots(m, modulus, omega)
        if modulus == NTT_FRIENDLY_MODULUS and m in ROOTS_OF_UNITY_45BIT:
            return Domain.roots(m, modulus, ROOTS_OF_UNITY_45BIT[m])
        return Domain.sequential(m, modulus)

    # -- points & vanishing polynomial ---------------------------------------

    @property
    def use_ntt(self) -> bool:
        return self.kind == ROOTS

    def points(self) -> List[int]:
        """The m domain points, in order."""
        q = self.modulus
        if self.kind == SEQUENTIAL:
            return [i % q for i in range(self.m)]
        pts = [1]
        for _ in range(1, self.m):
            pts.append(field.mul_mod(pts[-1], self.omega, q))
        return pts

    def eval_vanishing(self, x: int) -> int:
        """Z_H(x). Reference ``r1cs.rs:424-440`` (domain-aware)."""
        q = self.modulus
        if self.kind == ROOTS:
            return field.sub_mod(field.mod_pow(x, self.m, q), 1, q)
        result = 1
        for i in range(self.m):
            result = field.mul_mod(result, field.sub_mod(x, i % q, q), q)
        return result

    def vanishing_poly(self) -> List[int]:
        """Coefficients of Z_H(X). Reference ``r1cs.rs:959-976``."""
        q = self.modulus
        if self.kind == ROOTS:
            poly = [0] * (self.m + 1)
            poly[0] = q - 1
            poly[self.m] = 1
            return poly
        poly = [1]
        for i in range(self.m):
            poly = _poly_mul_linear(poly, i % q, q)
        return poly


def _poly_mul_linear(poly: List[int], a: int, q: int) -> List[int]:
    """p(X) * (X - a). Reference ``r1cs.rs:846-863`` helper (``poly_mul_linear``)."""
    out = [0] * (len(poly) + 1)
    for i, c in enumerate(poly):
        out[i + 1] = field.add_mod(out[i + 1], c, q)
        out[i] = field.sub_mod(out[i], field.mul_mod(a, c, q), q)
    return out
