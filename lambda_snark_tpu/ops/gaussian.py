"""Discrete Gaussian sampling via a CDT (cumulative distribution table).

Reimplements the reference CDT construction
(``cpp-core/src/utils.cpp:18-150``) with the same statistical contract:

- tail cutoff at ceil(12 * sigma) (probability mass beyond approx 2^-72),
  with a minimum support bound of 8,
- weights w_k = exp(-k^2 / (2 sigma^2)), doubled for k > 0 (folding +/-k),
- a u64-scaled CDF (last entry forced to 2^64 - 1),
- sample: draw uniform u64 ``u``, magnitude = first index with cdf[k] >= u,
  then an independent sign bit (zero never negated).

Differences from the reference, by design:
- the reference draws entropy from ``std::random_device`` (nondeterministic);
  here randomness comes from an explicit ChaCha20 stream so commitments are
  seed-deterministic (the north-star requirement the SEAL-based stack could
  not meet),
- the CDF is built in float64 instead of x86 ``long double``; the table is a
  protocol constant of *this* framework (documented in docs/reference_notes.md).

The vectorized device path (``ops.sampler_jax``) consumes the same table and
must agree exactly given identical uniform draws.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from ..utils.chacha import ChaCha20Rng

TAIL_CUTOFF = 12.0
U64_MAX = (1 << 64) - 1


def build_cdf(sigma: float) -> np.ndarray:
    """Build the u64-scaled CDF table. Reference ``utils.cpp:23-100``.

    Deliberately scalar/sequential IEEE-double arithmetic (``math.exp``,
    ordered summation): the native C++ implementation
    (``native/src/gaussian.cpp``) performs the identical double-precision
    operation sequence, so both languages produce bit-identical tables —
    the cross-language conformance anchor for commitment randomness.
    """
    if not (sigma > 0.0) or not math.isfinite(sigma):
        raise ValueError(f"sigma must be positive and finite, got {sigma}")
    bound = math.ceil(TAIL_CUTOFF * sigma)
    if bound < 8:
        bound = 8
    weights = []
    total = 0.0
    for k in range(bound + 1):
        w = math.exp(-(float(k) * float(k)) / (2.0 * sigma * sigma))
        if k > 0:
            w *= 2.0
        weights.append(w)
        total += w
    out = np.empty(bound + 1, dtype=np.uint64)
    if total == 0.0:
        out.fill(0)
        out[-1] = U64_MAX
        return out
    scale = float(U64_MAX) / total
    cumulative = 0.0
    for k, w in enumerate(weights):
        cumulative += w
        value = cumulative * scale
        if value >= float(U64_MAX):
            out[k] = U64_MAX
        elif value <= 0.0:
            out[k] = 0
        else:
            out[k] = int(value)
    out[-1] = U64_MAX
    return out


def sample_signed(rng: ChaCha20Rng, cdf: np.ndarray, count: int) -> np.ndarray:
    """Draw ``count`` signed Gaussian samples as int64.

    Per-sample draws (in order): one u64 for the magnitude, one u64 whose low
    bit is the sign — mirroring ``sample_single`` (``utils.cpp:95-129``).
    """
    out = np.empty(count, dtype=np.int64)
    cdf_list = cdf.tolist()
    for i in range(count):
        u = rng.next_u64()
        mag = _magnitude_from_uniform(u, cdf_list)
        sign = rng.next_u64() & 1
        if sign and mag != 0:
            mag = -mag
        out[i] = mag
    return out


def _magnitude_from_uniform(u: int, cdf_list: List[int]) -> int:
    """First index k with cdf[k] >= u (full scan, matching the CDT contract)."""
    for k, c in enumerate(cdf_list):
        if c >= u:
            return k
    return len(cdf_list) - 1


def magnitudes_from_uniforms(us: np.ndarray, cdf: np.ndarray) -> np.ndarray:
    """Vectorized magnitude lookup: count of table entries strictly below u.

    Equivalent to the scan above because the CDF is non-decreasing:
    ``sum(cdf[k] < u)`` = first index with cdf >= u.
    """
    return (cdf[None, :] < us[:, None].astype(np.uint64)).sum(axis=1)


def sample_signed_vectorized(
    rng: ChaCha20Rng, cdf: np.ndarray, count: int
) -> np.ndarray:
    """Vectorized host sampler, draw-for-draw identical to ``sample_signed``."""
    draws = rng.fill_u64(2 * count)
    us = draws[0::2]
    signs = draws[1::2] & np.uint64(1)
    mags = magnitudes_from_uniforms(us, cdf).astype(np.int64)
    flip = (signs.astype(np.int64) == 1) & (mags != 0)
    return np.where(flip, -mags, mags)


def to_field(samples: np.ndarray, modulus: int) -> np.ndarray:
    """Map signed samples into F_q (two's-complement-style embedding)."""
    s = samples.astype(object)
    return np.array([int(x) % modulus for x in s], dtype=np.uint64)
