"""Limb (digit) representation of field elements for TPU kernels.

TPU has no 64-bit integer datapath, and products of 45-bit field elements
need up to 90 bits — so device arithmetic uses base-2^16 digits stored in
uint32 planes: an element x is

    x = sum_i d_i * 2^(16 i),   d_i < 2^16,  i < D

held as an array of shape (D, ...) (limb axis leading, element axes trailing
so they map onto TPU lanes). Digit products fit uint32
((2^16-1)^2 < 2^32), column sums of schoolbook multiplication stay far below
2^32, and Barrett reduction needs only uint32 mul/add/shift — the exact op
set of the TPU VPU (and, digit-planes as int8 pairs, the MXU).

D = 3 covers all reference moduli below 2^48 (the 44/45-bit field moduli);
D = 4 covers Goldilocks. The semantic contract is ``core.field`` —
``tests/test_limb_jax.py`` checks bit-equality on random + boundary vectors.

This module is host-side: modulus constants and numpy conversions. The JAX
ops live in ``ops.modarith``.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

BASE_BITS = 16
BASE = 1 << BASE_BITS
MASK = BASE - 1


def digits_for(q: int) -> int:
    """Smallest D with q < 2^(16 D)."""
    d = 1
    while (1 << (BASE_BITS * d)) <= q:
        d += 1
    return d


def int_to_digits(x: int, count: int) -> List[int]:
    return [(x >> (BASE_BITS * i)) & MASK for i in range(count)]


def digits_to_int(digits) -> int:
    return sum(int(d) << (BASE_BITS * i) for i, d in enumerate(digits))


@dataclasses.dataclass(frozen=True)
class ModulusCtx:
    """Static per-modulus constants for digit arithmetic.

    Barrett (HAC 14.42) with base b = 2^16, k = D digits:
    mu = floor(b^(2k) / q) (k+1 digits). Requires b^(k-1) <= q < b^k, which
    holds for every reference modulus at its natural D.
    """

    q: int
    d: int  # digit count k
    q_digits: tuple  # k digits
    q_digits_ext: tuple  # k+1 digits (top zero)
    mu_digits: tuple  # k+1 digits

    @staticmethod
    def create(q: int) -> "ModulusCtx":
        d = digits_for(q)
        if q < (1 << (BASE_BITS * (d - 1))):
            raise ValueError("modulus below b^(k-1); unsupported digit count")
        mu = (1 << (BASE_BITS * 2 * d)) // q
        return ModulusCtx(
            q=q,
            d=d,
            q_digits=tuple(int_to_digits(q, d)),
            q_digits_ext=tuple(int_to_digits(q, d + 1)),
            mu_digits=tuple(int_to_digits(mu, d + 1)),
        )


def to_limbs(x, d: int) -> np.ndarray:
    """Host: array of ints/uint64 -> (d, ...) uint32 digit planes."""
    arr = np.asarray(x)
    flat = [int(v) for v in arr.reshape(-1)]
    out = np.empty((d,) + arr.shape, dtype=np.uint32)
    for i in range(d):
        shift = BASE_BITS * i
        out[i] = (
            np.array([(v >> shift) & MASK for v in flat], dtype=np.uint32)
            .reshape(arr.shape)
        )
    return out


def u64_to_limbs(arr: np.ndarray, d: int) -> np.ndarray:
    """Host: uint64 array -> (d, ...) uint32 digit planes (vectorized)."""
    arr = np.asarray(arr, dtype=np.uint64)
    return np.stack(
        [
            ((arr >> np.uint64(BASE_BITS * i)) & np.uint64(MASK)).astype(
                np.uint32
            )
            for i in range(d)
        ]
    )


def from_limbs(planes) -> np.ndarray:
    """Host: (d, ...) uint32 digit planes -> object array of Python ints."""
    planes = np.asarray(planes)
    d = planes.shape[0]
    flat = planes.reshape(d, -1)
    vals = [
        sum(int(flat[i, j]) << (BASE_BITS * i) for i in range(d))
        for j in range(flat.shape[1])
    ]
    out = np.empty(flat.shape[1], dtype=object)
    out[:] = vals
    return out.reshape(planes.shape[1:])


def from_limbs_u64(planes) -> np.ndarray:
    """Host: digit planes -> uint64 (requires value < 2^64)."""
    planes = np.asarray(planes, dtype=np.uint64)
    d = planes.shape[0]
    acc = np.zeros(planes.shape[1:], dtype=np.uint64)
    for i in range(d):
        acc |= planes[i] << np.uint64(BASE_BITS * i)
    return acc


_CTX_CACHE: dict = {}


def modulus_ctx(q: int) -> ModulusCtx:
    if q not in _CTX_CACHE:
        _CTX_CACHE[q] = ModulusCtx.create(q)
    return _CTX_CACHE[q]
