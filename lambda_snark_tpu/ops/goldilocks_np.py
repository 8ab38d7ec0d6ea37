"""Vectorized Goldilocks-field arithmetic on host (NumPy uint64).

The commitment ring R = Z_p[X]/(X^n + 1) uses the Goldilocks prime
p = 2^64 - 2^32 + 1 (the reference's ``NTT_MODULUS``,
``lambda-snark-core/src/lib.rs:58``). This module provides exact, vectorized
mod-p arithmetic and the cyclic/negacyclic NTTs used by the host (golden)
commitment path; the device path reimplements the same contract in 16-bit
limbs (``ops.modarith`` / ``ops.ntt``) and is tested for bit-equality against
this module, which in turn is tested against ``core.field`` Python-int math.

Reduction uses the standard Goldilocks identities 2^64 = 2^32 - 1 and
2^96 = -1 (mod p).
"""

from __future__ import annotations

import numpy as np

GOLDILOCKS = 18446744069414584321  # 2^64 - 2^32 + 1
_P = np.uint64(GOLDILOCKS)
_M32 = np.uint64(0xFFFFFFFF)
_U32 = np.uint64(32)
_EPS = np.uint64(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p


def _as_u64(x) -> np.ndarray:
    return np.asarray(x, dtype=np.uint64)


def gl_add(a, b) -> np.ndarray:
    """(a + b) mod p for canonical a, b < p."""
    a = _as_u64(a)
    b = _as_u64(b)
    s = a + b  # wraps mod 2^64
    over = s < a  # wrapped => value s + 2^64 === s + eps (mod p)
    s = s + over.astype(np.uint64) * _EPS
    # s + eps can itself wrap only if s > p - eps; one more fold is enough
    over2 = s < (over.astype(np.uint64) * _EPS)
    s = s + over2.astype(np.uint64) * _EPS
    ge = s >= _P
    return s - ge.astype(np.uint64) * _P


def gl_sub(a, b) -> np.ndarray:
    """(a - b) mod p for canonical a, b < p."""
    a = _as_u64(a)
    b = _as_u64(b)
    d = a - b
    borrow = a < b  # wrapped: subtract eps to compensate +2^64
    d = d - borrow.astype(np.uint64) * _EPS
    # borrow in the adjustment can re-wrap; fold once more
    ge = d >= _P
    return d - ge.astype(np.uint64) * _P


def gl_neg(a) -> np.ndarray:
    a = _as_u64(a)
    nz = (a != 0).astype(np.uint64)
    return (_P - a) * nz


def _mul_128(a: np.ndarray, b: np.ndarray):
    """Full 128-bit product of u64 arrays as (lo64, hi64)."""
    a_lo = a & _M32
    a_hi = a >> _U32
    b_lo = b & _M32
    b_hi = b >> _U32
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + hl
    mid_carry = (mid < lh).astype(np.uint64)
    lo = ll + (mid << _U32)
    carry1 = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> _U32) + (mid_carry << _U32) + carry1
    return lo, hi


def _reduce_128(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Reduce lo + hi*2^64 mod p (plonky2-style)."""
    hi_hi = hi >> _U32  # weight 2^96 === -1
    hi_lo = hi & _M32  # weight 2^64 === 2^32 - 1
    t0 = lo - hi_hi
    borrow = (lo < hi_hi).astype(np.uint64)
    t0 = t0 - borrow * _EPS
    t1 = hi_lo * _EPS  # < 2^64, no overflow
    res = t0 + t1
    carry = (res < t1).astype(np.uint64)
    res = res + carry * _EPS
    ge = res >= _P
    return res - ge.astype(np.uint64) * _P


def gl_mul(a, b) -> np.ndarray:
    """(a * b) mod p for canonical a, b < p."""
    a = _as_u64(a)
    b = _as_u64(b)
    lo, hi = _mul_128(a, b)
    return _reduce_128(lo, hi)


def gl_pow(base: int, exp: int) -> int:
    return pow(int(base), int(exp), GOLDILOCKS)


def gl_inv(a: int) -> int:
    return pow(int(a), GOLDILOCKS - 2, GOLDILOCKS)


# --- NTT over the Goldilocks field (host golden) ----------------------------


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev


class GoldilocksNtt:
    """Precomputed cyclic + negacyclic NTT of a fixed power-of-two size."""

    def __init__(self, n: int) -> None:
        assert n & (n - 1) == 0 and n >= 2
        assert n <= (1 << 31), "2-adicity of Goldilocks is 32"
        self.n = n
        from ..core.params import NTT_PRIMITIVE_ROOT

        self.omega = gl_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // n)
        self.omega_inv = gl_inv(self.omega)
        self.n_inv = gl_inv(n)
        self.psi = gl_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // (2 * n))
        self.psi_inv = gl_inv(self.psi)
        self._rev = _bit_reverse_indices(n)
        self._tw_fwd = self._stage_twiddles(self.omega)
        self._tw_inv = self._stage_twiddles(self.omega_inv)
        self._psi_pows = self._powers(self.psi)
        self._psi_inv_pows = self._powers(self.psi_inv)

    def _powers(self, base: int) -> np.ndarray:
        out = np.empty(self.n, dtype=np.uint64)
        acc = 1
        for i in range(self.n):
            out[i] = acc
            acc = (acc * base) % GOLDILOCKS
        return out

    def _stage_twiddles(self, omega: int):
        n = self.n
        log_n = n.bit_length() - 1
        stages = []
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m >> 1
            wm = gl_pow(omega, n // m)
            tw = np.empty(half, dtype=np.uint64)
            acc = 1
            for j in range(half):
                tw[j] = acc
                acc = (acc * wm) % GOLDILOCKS
            stages.append(tw)
        return stages

    def _transform(self, data: np.ndarray, stages) -> np.ndarray:
        # batched: any leading axes, the transform runs over the LAST axis
        n = self.n
        x = data[..., self._rev].copy()
        lead = x.shape[:-1]
        for s, tw in enumerate(stages, start=1):
            m = 1 << s
            half = m >> 1
            x = x.reshape(lead + (n // m, m))
            u = x[..., :half]
            t = gl_mul(x[..., half:], tw)
            x = np.concatenate([gl_add(u, t), gl_sub(u, t)], axis=-1)
        return x.reshape(lead + (n,))

    def forward(self, coeffs: np.ndarray) -> np.ndarray:
        """Cyclic NTT; bit-exact with ``core`` golden ``ntt_forward``."""
        return self._transform(_as_u64(coeffs), self._tw_fwd)

    def inverse(self, evals: np.ndarray) -> np.ndarray:
        out = self._transform(_as_u64(evals), self._tw_inv)
        return gl_mul(out, np.uint64(self.n_inv))

    def forward_negacyclic(self, coeffs: np.ndarray) -> np.ndarray:
        """Negacyclic (X^n + 1) NTT: psi-twist then cyclic forward.

        Mirrors the contract of SEAL's Harvey negacyclic NTT used by the
        reference C++ kernel (``cpp-core/src/ntt.cpp:76-104``): pointwise
        multiplication in this domain is multiplication mod X^n + 1.
        """
        return self.forward(gl_mul(_as_u64(coeffs), self._psi_pows))

    def inverse_negacyclic(self, evals: np.ndarray) -> np.ndarray:
        return gl_mul(self.inverse(evals), self._psi_inv_pows)

    def negacyclic_mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a * b mod (X^n + 1, p)."""
        return self.inverse_negacyclic(
            gl_mul(self.forward_negacyclic(a), self.forward_negacyclic(b))
        )


_NTT_CACHE: dict = {}


def goldilocks_ntt(n: int) -> GoldilocksNtt:
    if n not in _NTT_CACHE:
        _NTT_CACHE[n] = GoldilocksNtt(n)
    return _NTT_CACHE[n]
