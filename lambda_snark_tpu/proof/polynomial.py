"""Witness-encoding polynomial for the simple proof API.

Mirrors the reference ``rust-api/lambda-snark/src/polynomial.rs:12-241``:
coefficient-vector polynomial over F_q, ``from_witness`` (f(X) = sum z_i X^i),
Horner evaluation, ChaCha20-seeded ``random_blinding`` (bit-parity with
``ChaCha20Rng::seed_from_u64`` + ``gen::<u64>() % q``), and coefficient-wise
``add`` for blinding f' = f + r.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..core import field
from ..utils.chacha import ChaCha20Rng


class Polynomial:
    __slots__ = ("coeffs", "modulus")

    def __init__(self, coeffs: Sequence[int], modulus: int) -> None:
        self.coeffs: List[int] = [int(c) for c in coeffs]
        self.modulus = modulus

    @staticmethod
    def from_witness(witness: Sequence[int], modulus: int) -> "Polynomial":
        return Polynomial([int(v) % modulus for v in witness], modulus)

    def evaluate(self, alpha: int) -> int:
        return field.horner_eval(self.coeffs, alpha, self.modulus)

    def degree(self) -> int:
        return max(len(self.coeffs) - 1, 0)

    @staticmethod
    def random_blinding(
        degree: int, modulus: int, seed: Optional[int] = None
    ) -> "Polynomial":
        """r(X) with degree+1 uniform coefficients. Reference ``polynomial.rs:176-188``.

        With a seed, draws are bit-identical to the Rust stack
        (``ChaCha20Rng::seed_from_u64`` then ``gen::<u64>() % q`` per coeff).
        Without a seed, uses OS entropy.
        """
        if seed is not None:
            rng = ChaCha20Rng.from_u64(seed)
            coeffs = [rng.gen_u64_mod(modulus) for _ in range(degree + 1)]
        else:
            import secrets

            coeffs = [secrets.randbits(64) % modulus for _ in range(degree + 1)]
        return Polynomial(coeffs, modulus)

    def add(self, other: "Polynomial") -> "Polynomial":
        assert self.modulus == other.modulus, "modulus mismatch"
        n = max(len(self.coeffs), len(other.coeffs))
        out = [
            field.add_mod(
                self.coeffs[i] if i < len(self.coeffs) else 0,
                other.coeffs[i] if i < len(other.coeffs) else 0,
                self.modulus,
            )
            for i in range(n)
        ]
        return Polynomial(out, self.modulus)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Polynomial)
            and self.modulus == other.modulus
            and self.coeffs == other.coeffs
        )
