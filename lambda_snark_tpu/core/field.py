"""Golden (host, exact) modular arithmetic over u64-sized moduli.

This module is the *semantic contract* for every device kernel in
``lambda_snark_tpu.ops``: each limb-decomposed TPU implementation must agree
bit-for-bit with these functions on random and boundary vectors.

Semantics mirror the reference's single shared implementation
(reference ``rust-api/lambda-snark/src/arith.rs:7-106``):

- every op returns 0 when ``modulus <= 1`` (the reference's degenerate guard),
- ``mod_pow`` is mathematically ``pow(base, exp, modulus)`` (the reference's
  64-iteration constant-time ladder computes the same value),
- ``mod_inverse`` uses Fermat for odd moduli with an extended-Euclid fallback
  and returns ``None`` for non-invertible values.

All functions operate on Python ints (arbitrary precision => exact). They are
deliberately scalar; the vector paths live on-device in ``ops.modarith``.
"""

from __future__ import annotations

from typing import List, Optional

MASK64 = (1 << 64) - 1


def mul_mod(a: int, b: int, modulus: int) -> int:
    """(a * b) mod modulus. Reference: ``arith.rs:8-14`` (u128 widening)."""
    if modulus <= 1:
        return 0
    return (a * b) % modulus


def add_mod(a: int, b: int, modulus: int) -> int:
    """(a + b) mod modulus for a, b < modulus. Reference: ``arith.rs:17-27``."""
    if modulus <= 1:
        return 0
    s = a + b
    return s - modulus if s >= modulus else s


def sub_mod(a: int, b: int, modulus: int) -> int:
    """(a - b) mod modulus for a, b < modulus. Reference: ``arith.rs:29-38``."""
    if modulus <= 1:
        return 0
    d = a + modulus - b
    return d - modulus if d >= modulus else d


def mod_pow(base: int, exponent: int, modulus: int) -> int:
    """base^exponent mod modulus. Reference: ``arith.rs:41-61``.

    The reference runs a fixed 64-iteration constant-time square-and-multiply;
    for exponents < 2^64 the result equals ``pow``. Exponents are reduced to
    their low 64 bits to match the u64 signature.
    """
    if modulus <= 1:
        return 0
    return pow(base % modulus, exponent & MASK64, modulus)


def mod_inverse(value: int, modulus: int) -> Optional[int]:
    """Modular inverse, or None when not invertible. Reference: ``arith.rs:65-106``.

    Fermat's little theorem for odd moduli (verified by a multiply-back check,
    so composite odd moduli fall through correctly), extended Euclid otherwise.
    """
    if value == 0 or modulus <= 1:
        return None
    reduced = value % modulus
    if reduced == 0:
        return None
    if modulus & 1:
        candidate = pow(reduced, (modulus - 2) & MASK64, modulus)
        if (candidate * reduced) % modulus == 1 % modulus:
            return candidate
    return _mod_inverse_euclid(reduced, modulus)


def _mod_inverse_euclid(value: int, modulus: int) -> Optional[int]:
    t, new_t = 0, 1
    r, new_r = modulus, value
    while new_r != 0:
        quotient = r // new_r
        t, new_t = new_t, t - quotient * new_t
        r, new_r = new_r, r - quotient * new_r
    if r != 1:
        return None
    return t % modulus


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for u64 (12 witnesses).

    Reference: ``rust-api/lambda-snark/src/lean_params.rs:175-220`` — the
    VULN-001 guard against composite moduli such as 2^44+1 = 17 * 1034834473201.
    """
    if n < 2:
        return False
    if n in (2, 3):
        return True
    if n % 2 == 0:
        return False
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if a >= n:
            continue
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


# --- vector helpers (lists of ints; exact, host-side) -----------------------


def vec_mod(values, modulus: int) -> List[int]:
    """Reduce each element mod modulus (identity map semantics of ``% q``)."""
    return [v % modulus for v in values]


def horner_eval(coeffs, x: int, modulus: int) -> int:
    """Evaluate f(x) = sum coeffs[i] x^i via Horner.

    Reference: ``polynomial.rs:97-113`` (and ``r1cs.rs:362-373`` which
    accumulates low-to-high; identical value).
    """
    if modulus <= 1:
        return 0
    if not coeffs:
        return 0
    acc = coeffs[-1] % modulus
    x = x % modulus
    for c in reversed(coeffs[:-1]):
        acc = (acc * x + c) % modulus
    return acc
