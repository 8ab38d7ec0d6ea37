"""FRI low-degree proofs: the succinct-opening engine.

The reference's evaluation openings reveal the whole polynomial
(``opening.rs:104-115``) or are stubs (``lib.rs:788-791``, "real LWE openings
are TODO"). This module provides the missing piece: a hash-based proximity
test (FRI) that lets the verifier check claimed evaluations of *committed*
polynomials without seeing them — post-quantum, transparent, and succinct in
the circuit size.

Design notes (TPU-native framing):

- Codewords are Reed–Solomon extensions on a multiplicative coset
  ``offset * <omega>``; producing them is exactly the cyclic NTT this
  framework already runs at tens of Gbutterflies/s on the MXU
  (``ops/ntt_mxu.py``). The host golden NTT (``r1cs/poly.py``) is the
  semantic oracle used here; hashing and Fiat–Shamir stay host-side like the
  rest of the transcript layer.
- Merkle leaves pair positions ``i`` and ``i + N/2`` so each FRI fold query
  costs a single authentication path per layer (the fold consumes exactly
  that pair).
- Fold rule: with ``f(x) = f_e(x^2) + x * f_o(x^2)`` and challenge ``c``,
  the next layer is ``f_e + c * f_o`` on the squared domain:
  ``v' = ((lo + hi) + c * (lo - hi) / x) / 2``.

Supported fields: any modulus with a registered 2-adic subgroup — the
Goldilocks NTT modulus (2-adicity 32) and the 45-bit NTT-friendly prime
17592169062401 (2-adicity 13), i.e. the reference's two NTT fields
(``lambda-snark-core/src/lib.rs:58``, ``r1cs.rs:529``), plus the healthcare
dump prime 2013265921 (2-adicity 27, ``healthcare_quotient_dump.rs:10``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import struct
from typing import Callable, List, Optional, Sequence, Tuple

from ..core import field
from ..core.errors import DomainError, SerializationError
from ..core.params import (
    HEALTHCARE_DUMP_MODULUS,
    NTT_FRIENDLY_MODULUS,
    NTT_MODULUS,
    NTT_PRIMITIVE_ROOT,
    ROOTS_OF_UNITY_45BIT,
)
from ..r1cs.poly import ntt_forward, ntt_inverse
from .merkle import MerkleTree, verify_path

# --- field registry ----------------------------------------------------------

#: modulus -> (two_adicity, generator of the order-2^two_adicity subgroup,
#:             coset offset = a multiplicative generator of F_q^*)
_FRI_FIELDS = {
    # Goldilocks: NTT_PRIMITIVE_ROOT has order 2^32 (g = 7, ntt.rs:226-233)
    NTT_MODULUS: (32, NTT_PRIMITIVE_ROOT, 7),
    # q45: the largest reference table root has order 2^13 (g = 3, r1cs.rs:534)
    NTT_FRIENDLY_MODULUS: (13, ROOTS_OF_UNITY_45BIT[8192], 3),
    # Baby-Bear-like healthcare prime: 2^27 subgroup, generator 31
    HEALTHCARE_DUMP_MODULUS: (27, pow(31, 15, HEALTHCARE_DUMP_MODULUS), 31),
}


def fri_supported(modulus: int) -> bool:
    return modulus in _FRI_FIELDS


def max_codeword_size(modulus: int) -> int:
    if modulus not in _FRI_FIELDS:
        return 0
    return 1 << _FRI_FIELDS[modulus][0]


def root_of_order(modulus: int, size: int) -> int:
    """Primitive ``size``-th root of unity (size a power of two)."""
    if modulus not in _FRI_FIELDS:
        raise DomainError(
            f"FRI unsupported for modulus {modulus}: no registered 2-adic subgroup"
        )
    two_adicity, max_root, _ = _FRI_FIELDS[modulus]
    if size & (size - 1) or size < 1:
        raise DomainError(f"codeword size must be a power of two, got {size}")
    log = size.bit_length() - 1
    if log > two_adicity:
        raise DomainError(
            f"codeword size {size} exceeds the 2-adic subgroup 2^{two_adicity} "
            f"of modulus {modulus}"
        )
    return pow(max_root, 1 << (two_adicity - log), modulus)


def coset_offset(modulus: int) -> int:
    """Multiplicative generator used as the LDE coset shift (keeps the
    evaluation domain disjoint from every 2-power subgroup, so Z_H never
    vanishes on it)."""
    if modulus not in _FRI_FIELDS:
        raise DomainError(f"FRI unsupported for modulus {modulus}")
    return _FRI_FIELDS[modulus][2]


# --- vectorized Goldilocks backend --------------------------------------------
#
# For the Goldilocks modulus every hot FRI array op (LDE, coset powers,
# batched inversion, folding, the combined-quotient build) dispatches to the
# exact vectorized uint64 kernels in ``ops/goldilocks_np.py`` — the same
# module the device limb pipeline is tested against. Other moduli keep the
# Python-int golden path (q45 codewords are capped at 2^13 by the field's
# 2-adicity, so the golden path is already fast enough there).

import numpy as np

from ..ops import goldilocks_np as glnp


def _gl_powers(base: int, n: int) -> np.ndarray:
    """[base^0, ..., base^(n-1)] mod Goldilocks via log-doubling."""
    out = np.empty(n, dtype=np.uint64)
    out[0] = 1
    step = 1
    cur = base % glnp.GOLDILOCKS
    while step < n:
        m = min(step, n - step)
        out[step : step + m] = glnp.gl_mul(out[:m], np.uint64(cur))
        cur = cur * cur % glnp.GOLDILOCKS
        step <<= 1
    return out


def _gl_pow_array(a: np.ndarray, exp: int) -> np.ndarray:
    """Elementwise a^exp mod Goldilocks (square-and-multiply on the array)."""
    result = np.ones_like(a)
    base = a.copy()
    while exp:
        if exp & 1:
            result = glnp.gl_mul(result, base)
        exp >>= 1
        if exp:
            base = glnp.gl_mul(base, base)
    return result


def _gl_inverse_array(a: np.ndarray) -> np.ndarray:
    """Elementwise inverse mod Goldilocks via vectorized Montgomery batch
    inversion: inclusive prefix/suffix product scans (log-doubling, ~2·log n
    array passes) plus ONE scalar Fermat inverse of the total product —
    ~2.5x fewer uint64 passes than the per-element Fermat ladder, which
    dominated the kind-9 prover's host DEEP build."""
    if bool((a == 0).any()):
        raise DomainError("batch_inverse: zero element (challenge hit the domain)")
    flat = np.ascontiguousarray(a, dtype=np.uint64).reshape(-1)
    n = flat.size
    if n == 0:
        return a.copy()
    if n < 1024:  # scan overhead beats the ladder only at size
        return _gl_pow_array(a, glnp.GOLDILOCKS - 2)
    scan = flat.copy()  # scan[i] = prod(flat[0..i])
    shift = 1
    while shift < n:
        scan[shift:] = glnp.gl_mul(scan[shift:], scan[:-shift])
        shift <<= 1
    suf = flat.copy()  # suf[i] = prod(flat[i..])
    shift = 1
    while shift < n:
        suf[:-shift] = glnp.gl_mul(suf[:-shift], suf[shift:])
        shift <<= 1
    total_inv = np.uint64(glnp.gl_inv(int(scan[-1])))
    out = np.empty_like(flat)
    # out[i] = scan[i-1] * suf[i+1] * total_inv (prod of everything but i)
    out[0] = suf[1] if n > 1 else 1
    out[1:-1] = glnp.gl_mul(scan[:-2], suf[2:])
    out[-1] = scan[-2]
    out = glnp.gl_mul(out, total_inv)
    return out.reshape(a.shape)


# --- helpers -----------------------------------------------------------------


def batch_inverse(vals: Sequence[int], q: int) -> List[int]:
    """Montgomery batch inversion; raises DomainError on a zero element."""
    n = len(vals)
    prefix = [0] * n
    acc = 1
    for i, v in enumerate(vals):
        prefix[i] = acc
        acc = acc * v % q
    if acc == 0:
        raise DomainError("batch_inverse: zero element (challenge hit the domain)")
    inv_acc = field.mod_inverse(acc, q)
    if inv_acc is None:
        raise DomainError("batch_inverse: non-invertible product")
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_acc % q
        inv_acc = inv_acc * vals[i] % q
    return out


def coset_points(offset: int, omega: int, n: int, q: int) -> List[int]:
    pts = [0] * n
    acc = offset % q
    for i in range(n):
        pts[i] = acc
        acc = acc * omega % q
    return pts


def lde(coeffs: Sequence[int], n: int, offset: int, omega: int, q: int) -> List[int]:
    """Evaluate the polynomial on the size-``n`` coset ``offset * <omega>``.

    f(offset * x) has coefficients c_i * offset^i; one cyclic NTT then gives
    all coset evaluations — the RS encoding ridden by the device NTT paths.
    """
    if len(coeffs) > n:
        raise DomainError(f"polynomial length {len(coeffs)} exceeds codeword size {n}")
    if q == glnp.GOLDILOCKS:
        padded_np = np.zeros(n, dtype=np.uint64)
        if isinstance(coeffs, np.ndarray) and coeffs.dtype == np.uint64:
            padded_np[: len(coeffs)] = coeffs  # already reduced
        else:
            padded_np[: len(coeffs)] = np.array(
                [c % q for c in coeffs], dtype=np.uint64
            )
        twisted_np = glnp.gl_mul(padded_np, _gl_powers(offset, n))
        # GoldilocksNtt(n).omega == root_of_order(GOLDILOCKS, n): same 2^32
        # primitive-root ladder — asserted in tests/test_succinct.py
        return glnp.goldilocks_ntt(n).forward(twisted_np)
    padded = [c % q for c in coeffs] + [0] * (n - len(coeffs))
    acc = 1
    twisted = [0] * n
    for i, c in enumerate(padded):
        twisted[i] = c * acc % q
        acc = acc * offset % q
    return ntt_forward(twisted, q, omega)


def lde_batch_device(polys: Sequence[Sequence[int]], n: int, offset: int, q: int):
    """Batched Reed–Solomon encoding on the accelerator (Goldilocks only).

    The offset twist happens host-side (vectorized uint64), the batch of
    cyclic NTTs runs as ONE device dispatch through the four-step
    digit-plane pipeline (``ops/ntt_large.py``) — the same transform the
    MXU paths accelerate at m=2^20. Bit-exact with ``lde`` (asserted in
    tests); used by ``prove_r1cs_succinct(device_lde=True)``.
    """
    if q != glnp.GOLDILOCKS:
        raise DomainError("device LDE is implemented for the Goldilocks modulus")
    import jax.numpy as jnp

    from ..ops import limb
    from ..ops.ntt_large import four_step_plan, ntt_forward_large

    tw_pows = _gl_powers(offset, n)
    batch = np.zeros((len(polys), n), dtype=np.uint64)
    for i, coeffs in enumerate(polys):
        if len(coeffs) > n:
            raise DomainError(
                f"polynomial length {len(coeffs)} exceeds codeword size {n}"
            )
        if isinstance(coeffs, np.ndarray) and coeffs.dtype == np.uint64:
            batch[i, : len(coeffs)] = coeffs  # already reduced
        else:
            batch[i, : len(coeffs)] = np.array(
                [c % q for c in coeffs], dtype=np.uint64
            )
    twisted = glnp.gl_mul(batch, tw_pows[None, :])
    planes = limb.to_limbs(twisted, limb.digits_for(q))
    fsp = four_step_plan(n, q, root_of_order(q, n))
    out = ntt_forward_large(fsp, jnp.asarray(planes))
    return list(limb.from_limbs_u64(np.asarray(out)))


def lde_batch_device_planes(
    polys: Sequence[Sequence[int]], n: int, offset: int, q: int,
    pull_values: bool = True,
):
    """Like ``lde_batch_device`` but also returns the codewords as DEVICE
    digit planes (4, B, n) so downstream device-resident consumers
    (``proof.fri_device``) never re-upload them. Returns
    ``(planes_dev, values_u64)``; with ``pull_values=False`` the host copy
    is skipped entirely (device DEEP path) and ``values_u64`` is None."""
    if q != glnp.GOLDILOCKS:
        raise DomainError("device LDE is implemented for the Goldilocks modulus")
    import jax.numpy as jnp

    from ..ops import limb
    from ..ops.ntt_large import four_step_plan, ntt_forward_large

    tw_pows = _gl_powers(offset, n)
    batch = np.zeros((len(polys), n), dtype=np.uint64)
    for i, coeffs in enumerate(polys):
        if len(coeffs) > n:
            raise DomainError(
                f"polynomial length {len(coeffs)} exceeds codeword size {n}"
            )
        if isinstance(coeffs, np.ndarray) and coeffs.dtype == np.uint64:
            batch[i, : len(coeffs)] = coeffs
        else:
            batch[i, : len(coeffs)] = np.array(
                [c % q for c in coeffs], dtype=np.uint64
            )
    twisted = glnp.gl_mul(batch, tw_pows[None, :])
    planes = limb.u64_to_limbs(twisted, limb.digits_for(q))
    fsp = four_step_plan(n, q, root_of_order(q, n))
    out = ntt_forward_large(fsp, jnp.asarray(planes))
    if not pull_values:
        return out, None
    return out, limb.from_limbs_u64(np.asarray(out))


#: below this many leaves a host hashlib loop beats a device dispatch
_DEVICE_HASH_MIN_HALF = 4096

#: module knob (tests flip it to pin host/device tree equality)
DEVICE_HASH = True


def commit_codeword(values: Sequence[int]) -> MerkleTree:
    """Merkle-commit a codeword with paired leaves (i, i + N/2).

    Large uint64 codewords (the Goldilocks vectorized path) hash on the
    accelerator via the batched Keccak kernel (``ops/keccak_jax.py``);
    the tree is bit-identical either way.
    """
    n = len(values)
    half = n // 2
    if (
        DEVICE_HASH
        and isinstance(values, np.ndarray)
        and values.dtype == np.uint64
        and half >= _DEVICE_HASH_MIN_HALF
    ):
        return MerkleTree.from_u64_pairs(values[:half], values[half:])
    leaves = [
        struct.pack("<QQ", values[i], values[i + half]) for i in range(half)
    ]
    return MerkleTree(leaves)


def commit_codeword_group(codewords: Sequence[Sequence[int]]) -> MerkleTree:
    """Merkle-commit a GROUP of equal-size codewords in one interleaved tree
    (leaf i = ``concat_g pack("<QQ", cw_g[i], cw_g[i+half])``).

    This is the wire-v3 input-oracle commitment: a single authentication
    path opens every oracle of the group at a queried position. Device
    hashing for large uint64 codewords; bit-identical either way.
    """
    from .merkle import build_forest_u64_groups

    if len(codewords) > MAX_GROUP_ORACLES:
        raise DomainError(
            f"group of {len(codewords)} oracles exceeds MAX_GROUP_ORACLES "
            f"({MAX_GROUP_ORACLES}: the single-Keccak-block leaf limit)"
        )
    n = len(codewords[0])
    half = n // 2
    if any(len(cw) != n for cw in codewords):
        raise DomainError("group codewords must share one size")
    if (
        DEVICE_HASH
        and all(
            isinstance(cw, np.ndarray) and cw.dtype == np.uint64
            for cw in codewords
        )
        and half >= _DEVICE_HASH_MIN_HALF
    ):
        return build_forest_u64_groups(np.stack(codewords)[None])[0]
    leaves = [
        b"".join(
            struct.pack("<QQ", int(cw[i]), int(cw[i + half]))
            for cw in codewords
        )
        for i in range(half)
    ]
    return MerkleTree(leaves)


def commit_codeword_groups(
    groups: Sequence[Sequence[Sequence[int]]],
) -> List[MerkleTree]:
    """Commit several equal-shape groups, batching device hashing into one
    dispatch when the vectorized path applies (kind-8 statement batches)."""
    from .merkle import build_forest_u64_groups

    if (
        DEVICE_HASH
        and groups
        and all(
            isinstance(cw, np.ndarray) and cw.dtype == np.uint64
            for grp in groups
            for cw in grp
        )
        and len({len(grp) for grp in groups}) == 1
        and len({len(cw) for grp in groups for cw in grp}) == 1
        and len(groups[0][0]) // 2 >= _DEVICE_HASH_MIN_HALF
    ):
        stacked = np.stack([np.stack(grp) for grp in groups])  # [T, G, n]
        return build_forest_u64_groups(stacked)
    return [commit_codeword_group(grp) for grp in groups]


def commit_codewords(codewords: Sequence[Sequence[int]]) -> List[MerkleTree]:
    """Merkle-commit several equal-size codewords, batching all device
    hashing into one dispatch when the vectorized path applies."""
    from .merkle import build_forest_u64_pairs

    if (
        DEVICE_HASH
        and codewords
        and all(
            isinstance(cw, np.ndarray) and cw.dtype == np.uint64
            for cw in codewords
        )
        and len({len(cw) for cw in codewords}) == 1
        and len(codewords[0]) // 2 >= _DEVICE_HASH_MIN_HALF
    ):
        stacked = np.stack(codewords)
        half = stacked.shape[1] // 2
        return build_forest_u64_pairs(stacked[:, :half], stacked[:, half:])
    return [commit_codeword(cw) for cw in codewords]


# --- Fiat-Shamir transcript ---------------------------------------------------


class FriTranscript:
    """Deterministic SHA3-256 ratchet transcript (host-side, like
    ``transcript/challenge.py``). Every absorb/squeeze replaces the state with
    ``SHA3-256(state || label || data)``."""

    DOMAIN_TAG = b"LAMBDA-SNARK-R-FRI-v1"

    def __init__(self) -> None:
        self._state = hashlib.sha3_256(self.DOMAIN_TAG).digest()
        self._counter = 0

    def absorb(self, label: bytes, data: bytes) -> None:
        self._state = hashlib.sha3_256(self._state + label + data).digest()

    def absorb_words(self, label: bytes, words: Sequence[int]) -> None:
        blob = struct.pack("<Q", len(words)) + b"".join(
            struct.pack("<Q", int(w) & ((1 << 64) - 1)) for w in words
        )
        self.absorb(label, blob)

    def _squeeze(self, label: bytes) -> bytes:
        self._counter += 1
        digest = hashlib.sha3_256(
            self._state + label + struct.pack("<Q", self._counter)
        ).digest()
        self._state = digest
        return digest

    def challenge_field(self, q: int, label: bytes) -> int:
        """Field challenge: first 8 squeezed bytes mod q (same reduction the
        reference transcript uses, ``challenge.rs:128-133``)."""
        return int.from_bytes(self._squeeze(label)[:8], "little") % q

    def challenge_indices(self, bound: int, count: int, label: bytes) -> List[int]:
        out = []
        for _ in range(count):
            out.append(int.from_bytes(self._squeeze(label)[:8], "little") % bound)
        return out


# --- proof containers ---------------------------------------------------------

#: Hard cap on statements in an aggregated (kind-8) proof — shared between
#: the aggregate serializer and FriQuery.read so the two bounds cannot drift
#: (ADVICE r4 #2; docs/protocol.md W-4).
MAX_AGGREGATE_STATEMENTS = 4096

#: Hard cap on oracles per interleaved group: 8 oracles = 32 payload u32
#: words = 129-byte leaf messages, the single-Keccak-block limit shared by
#: the device leaf hasher (``keccak_jax.leaf_block_words_flex``) and the
#: native path verifier (``ls_merkle_verify_batch`` rejects leaves >= one
#: rate block). Enforced at commit AND deserialization so a wider group
#: fails loudly at the API boundary, not deep in a kernel.
MAX_GROUP_ORACLES = 8


@dataclasses.dataclass(frozen=True)
class FriParams:
    """Proximity-test parameters.

    Defaults: rate 1/8 (log_blowup 3) with 30 queries ~ 90 bits of
    conjectured proximity soundness (docs/security_analysis.md §2/§5);
    final polynomial capped at 64 coefficients — a larger final poly costs
    512 B once but removes three committed fold layers, i.e. ~90 fewer
    authentication paths per proof (~21 KB at m=2^13) and ~30% fewer
    verifier hashes, with no effect on the proximity bound.
    """

    log_blowup: int = 3
    num_queries: int = 30
    final_len: int = 64

    def validate(self) -> None:
        if not 1 <= self.log_blowup <= 8:
            raise DomainError(f"log_blowup out of range: {self.log_blowup}")
        if not 1 <= self.num_queries <= 1024:
            raise DomainError(f"num_queries out of range: {self.num_queries}")
        if self.final_len < 1 or self.final_len & (self.final_len - 1):
            raise DomainError(f"final_len must be a power of two: {self.final_len}")

    def at_least(self, floor: "FriParams") -> bool:
        """Is this parameter set at least as strong as ``floor``?"""
        return (
            self.log_blowup >= floor.log_blowup
            and self.num_queries >= floor.num_queries
        )


@dataclasses.dataclass(frozen=True)
class LayerOpening:
    """One authenticated codeword pair (v[i], v[i + N/2]) with its path.

    ``path`` holds the sibling digests bottom-up as ONE contiguous bytes
    blob (len = 32 * depth) — contiguous storage keeps deserialization a
    single slice and lets the batched native verifier pack all paths
    without touching thousands of small objects. Constructors may pass a
    sequence of 32-byte digests; it is normalized on construction.
    """

    v_lo: int
    v_hi: int
    path: bytes

    def __post_init__(self) -> None:
        if not isinstance(self.path, (bytes, bytearray)):
            object.__setattr__(self, "path", b"".join(self.path))

    def to_bytes(self) -> bytes:
        out = struct.pack("<QQB", self.v_lo, self.v_hi, len(self.path) // 32)
        return out + self.path

    @staticmethod
    def read(data: bytes, off: int) -> Tuple["LayerOpening", int]:
        if off + 17 > len(data):
            raise SerializationError("truncated FRI opening")
        v_lo, v_hi, plen = struct.unpack_from("<QQB", data, off)
        off += 17
        end = off + 32 * plen
        if end > len(data):
            raise SerializationError("truncated FRI path")
        return LayerOpening(v_lo, v_hi, data[off:end]), end


@dataclasses.dataclass(frozen=True)
class GroupOpening:
    """One authenticated interleaved-group leaf: the (lo, hi) value pairs of
    every oracle in the group at positions (i, i + N/2), under ONE path.

    ``values`` is ``(lo_0, hi_0, lo_1, hi_1, ...)`` in oracle order —
    exactly the leaf payload layout (wire-v3: one path per query opens a
    whole statement's oracles; 4x fewer hashes and paths than the v2
    per-oracle trees).
    """

    values: Tuple[int, ...]
    path: bytes

    def __post_init__(self) -> None:
        if not isinstance(self.path, (bytes, bytearray)):
            object.__setattr__(self, "path", b"".join(self.path))
        if not isinstance(self.values, tuple):
            object.__setattr__(self, "values", tuple(self.values))

    def leaf_bytes(self) -> bytes:
        return b"".join(struct.pack("<Q", int(v)) for v in self.values)

    def to_bytes(self) -> bytes:
        out = struct.pack("<B", len(self.values))
        out += b"".join(struct.pack("<Q", int(v)) for v in self.values)
        out += struct.pack("<B", len(self.path) // 32)
        return out + self.path

    @staticmethod
    def read(data: bytes, off: int) -> Tuple["GroupOpening", int]:
        if off + 1 > len(data):
            raise SerializationError("truncated FRI group opening")
        n_vals = data[off]
        off += 1
        # cap = 2 * MAX_GROUP_ORACLES (the single-Keccak-block leaf limit
        # the committers enforce); the widest shipped group is kind-9 zk's
        # 6 oracles
        if n_vals == 0 or n_vals & 1 or n_vals > 2 * MAX_GROUP_ORACLES:
            raise SerializationError(f"bad group opening width {n_vals}")
        if off + 8 * n_vals + 1 > len(data):
            raise SerializationError("truncated group opening values")
        values = struct.unpack_from(f"<{n_vals}Q", data, off)
        off += 8 * n_vals
        plen = data[off]
        off += 1
        end = off + 32 * plen
        if end > len(data):
            raise SerializationError("truncated group opening path")
        return GroupOpening(values, data[off:end]), end


@dataclasses.dataclass(frozen=True)
class FriQuery:
    input_openings: Tuple[GroupOpening, ...]  # one per input oracle GROUP
    layer_openings: Tuple[LayerOpening, ...]  # one per committed fold layer

    def to_bytes(self) -> bytes:
        # LE16 counts: an aggregated (kind-8) query opens S statement
        # groups, which exceeds u8 at S >= 256
        out = struct.pack(
            "<HH", len(self.input_openings), len(self.layer_openings)
        )
        for op in self.input_openings:
            out += op.to_bytes()
        for op in self.layer_openings:
            out += op.to_bytes()
        return out

    @staticmethod
    def read(data: bytes, off: int) -> Tuple["FriQuery", int]:
        if off + 4 > len(data):
            raise SerializationError("truncated FRI query")
        n_in, n_layer = struct.unpack_from("<HH", data, off)
        off += 4
        # defense-in-depth bound (pre-0.8 blobs are already rejected at the
        # header by the wire-version byte, proof/succinct.py)
        if n_in > MAX_AGGREGATE_STATEMENTS or n_layer > 64:
            raise SerializationError(
                f"unreasonable FRI query counts ({n_in}, {n_layer}) — "
                "possibly a pre-0.8 proof blob"
            )
        ins = []
        for _ in range(n_in):
            op, off = GroupOpening.read(data, off)
            ins.append(op)
        layers = []
        for _ in range(n_layer):
            op, off = LayerOpening.read(data, off)
            layers.append(op)
        return FriQuery(tuple(ins), tuple(layers)), off


@dataclasses.dataclass(frozen=True)
class FriProof:
    layer_roots: Tuple[bytes, ...]
    final_coeffs: Tuple[int, ...]
    queries: Tuple[FriQuery, ...]

    def to_bytes(self) -> bytes:
        out = struct.pack("<H", len(self.layer_roots)) + b"".join(self.layer_roots)
        out += struct.pack("<H", len(self.final_coeffs))
        out += b"".join(struct.pack("<Q", c) for c in self.final_coeffs)
        out += struct.pack("<H", len(self.queries))
        for qy in self.queries:
            out += qy.to_bytes()
        return out

    @staticmethod
    def read(data: bytes, off: int) -> Tuple["FriProof", int]:
        if off + 2 > len(data):
            raise SerializationError("truncated FRI proof")
        (n_roots,) = struct.unpack_from("<H", data, off)
        off += 2
        roots = []
        for _ in range(n_roots):
            if off + 32 > len(data):
                raise SerializationError("truncated FRI roots")
            roots.append(data[off : off + 32])
            off += 32
        if off + 2 > len(data):
            raise SerializationError("truncated FRI final length")
        (n_final,) = struct.unpack_from("<H", data, off)
        off += 2
        if n_final > 4096:
            raise SerializationError("unreasonable FRI final polynomial length")
        final = []
        for _ in range(n_final):
            if off + 8 > len(data):
                raise SerializationError("truncated FRI final coeffs")
            (c,) = struct.unpack_from("<Q", data, off)
            final.append(c)
            off += 8
        if off + 2 > len(data):
            raise SerializationError("truncated FRI query count")
        (n_q,) = struct.unpack_from("<H", data, off)
        off += 2
        if n_q > 4096:
            raise SerializationError("unreasonable FRI query count")
        queries = []
        for _ in range(n_q):
            qy, off = FriQuery.read(data, off)
            queries.append(qy)
        return FriProof(tuple(roots), tuple(final), tuple(queries)), off


# --- folding -----------------------------------------------------------------


def _fold_codeword(values, offset: int, omega: int, c: int, q: int):
    n = len(values)
    half = n // 2
    inv2 = field.mod_inverse(2, q)
    if q == glnp.GOLDILOCKS:
        v = np.asarray(values, dtype=np.uint64)
        lo, hi = v[:half], v[half:]
        # 1/x over the coset is itself geometric: inv(offset) * inv(omega)^i
        inv_xs = glnp.gl_mul(
            np.uint64(field.mod_inverse(offset, q)),
            _gl_powers(field.mod_inverse(omega, q), half),
        )
        t = glnp.gl_mul(glnp.gl_mul(np.uint64(c % q), glnp.gl_sub(lo, hi)), inv_xs)
        return glnp.gl_mul(glnp.gl_add(glnp.gl_add(lo, hi), t), np.uint64(inv2))
    xs = coset_points(offset, omega, half, q)
    inv_xs = batch_inverse(xs, q)
    out = [0] * half
    for i in range(half):
        lo = values[i]
        hi = values[i + half]
        out[i] = ((lo + hi) + c * ((lo - hi) % q) % q * inv_xs[i]) % q * inv2 % q
    return out


def _fold_pair(lo: int, hi: int, x: int, c: int, q: int) -> int:
    inv2x = field.mod_inverse(2 * x % q, q)
    if inv2x is None:
        raise DomainError("fold point not invertible")
    inv2 = field.mod_inverse(2, q)
    return ((lo + hi) % q * inv2 + c * ((lo - hi) % q) % q * inv2x) % q


def _fold_pair_xinv(
    lo: int, hi: int, x_inv: int, c: int, q: int, inv2: int
) -> int:
    """``_fold_pair`` with the fold point's inverse supplied directly.

    The verifier derives x_inv for layer 0 once per query and then just
    squares it per layer (x_{k+1} = x_k^2 exactly: offsets and omegas
    square while positions reduce mod the half-size, and omega_k has
    order size_k) — this removed ~2/3 of the verifier's scalar Fermat
    inversions (19.3 -> single-digit ms per m=2^13 proof).
    """
    inv2x = inv2 * x_inv % q
    return ((lo + hi) % q * inv2 + c * ((lo - hi) % q) % q * inv2x) % q


def _effective_final_len(d_bound: int, final_len: int) -> int:
    """At least one fold must happen; shrink final_len for tiny instances."""
    return min(final_len, max(1, d_bound >> 1))


# --- prover ------------------------------------------------------------------


def fri_prove(
    g_codeword: List[int],
    inputs: Sequence[Tuple[Sequence[Sequence[int]], MerkleTree]],
    offset: int,
    omega: int,
    q: int,
    params: FriParams,
    tr: FriTranscript,
) -> FriProof:
    """Prove that ``g_codeword`` (the virtual combined-quotient oracle built
    from the committed ``inputs``) is within proximity of degree <
    ``len(g_codeword) >> params.log_blowup``.

    ``inputs`` is a sequence of GROUPS: ``(codewords, tree)`` where the tree
    commits all of the group's codewords position-wise
    (``commit_codeword_group``); each query opens one path per group.

    The caller must have absorbed the input roots and claimed evaluations
    into ``tr`` already; challenges and query indices are derived here in
    the same order the verifier re-derives them.
    """
    params.validate()
    n0 = len(g_codeword)
    d_bound = n0 >> params.log_blowup
    final_len = _effective_final_len(d_bound, params.final_len)

    committed: List[Tuple[Sequence[int], MerkleTree]] = []
    roots: List[bytes] = []
    cur = g_codeword
    off, om, d = offset, omega, d_bound
    while True:
        c = tr.challenge_field(q, b"fri-fold")
        cur = _fold_codeword(cur, off, om, c, q)
        off = off * off % q
        om = om * om % q
        d >>= 1
        if d <= final_len:
            break
        tree = commit_codeword(cur)
        committed.append((cur, tree))
        roots.append(tree.root)
        tr.absorb(b"fri-layer-root", tree.root)

    # final polynomial: iNTT on the residual coset, untwisted by the offset
    coeffs = ntt_inverse([int(v) for v in cur], q, om)
    inv_off = field.mod_inverse(off, q)
    acc = 1
    final: List[int] = []
    for i, cf in enumerate(coeffs):
        final.append(cf * acc % q)
        acc = acc * inv_off % q
    # degree bound: everything beyond final_len must vanish for an honest run
    if any(final[final_len:]):
        raise DomainError("FRI final polynomial exceeds its degree bound")
    final = final[:final_len]
    tr.absorb_words(b"fri-final", final)

    indices = tr.challenge_indices(n0 // 2, params.num_queries, b"fri-query")

    queries: List[FriQuery] = []
    for i0 in indices:
        input_openings = []
        for group_cws, tree in inputs:
            half = len(group_cws[0]) // 2
            vals = []
            for cw in group_cws:
                vals.append(int(cw[i0]))
                vals.append(int(cw[i0 + half]))
            input_openings.append(
                GroupOpening(tuple(vals), tuple(tree.path(i0)))
            )
        layer_openings = []
        pos = i0  # position of the folded value inside the next layer
        for values, tree in committed:
            half = len(values) // 2
            p = pos % half
            layer_openings.append(
                LayerOpening(int(values[p]), int(values[p + half]), tuple(tree.path(p)))
            )
            pos = p
        queries.append(FriQuery(tuple(input_openings), tuple(layer_openings)))

    return FriProof(tuple(roots), tuple(final), tuple(queries))


# --- verifier ----------------------------------------------------------------

#: module knob: use the native batched Merkle/SHA3 verifier when the C++
#: library is available (tests flip it to pin native/host parity)
NATIVE_VERIFY = True

_native_mod = None


def _native():
    """The native_bridge module if the C++ library loads, else None."""
    global _native_mod
    if _native_mod is None:
        try:
            from .. import native_bridge

            _native_mod = native_bridge if native_bridge.available() else False
        except Exception:  # pragma: no cover - import/build failure
            _native_mod = False
    return _native_mod or None


def _query_positions(indices, n0: int, n_layers: int) -> np.ndarray:
    """Per-query leaf positions at the input level and each committed fold
    layer: pos[:, 0] = i0; pos[:, k+1] = pos[:, k] % (n0 >> (k+2)).

    Pure index arithmetic — shared by the path collector and the fold walk.
    """
    q_n = len(indices)
    pos = np.empty((q_n, n_layers + 1), dtype=np.int64)
    pos[:, 0] = np.asarray(indices, dtype=np.int64)
    for k in range(n_layers):
        pos[:, k + 1] = pos[:, k] % (n0 >> (k + 2))
    return pos


def _verify_paths_native(
    proof: "FriProof",
    input_groups: Sequence[Tuple[bytes, int]],
    indices: Sequence[int],
    pos: np.ndarray,
    n0: int,
    grp_vals: Sequence[np.ndarray],
    lay_vals: np.ndarray,
) -> bool:
    """Authenticate every group/layer opening of every query in a handful of
    native calls (8-lane SoA Keccak, native/src/keccak_batch.cpp; one call
    per distinct leaf width). Semantics are exactly those of the per-path
    host loop (pinned in tests).

    ``grp_vals[g]``: uint64 [q_n, 2*size_g] opened group values;
    ``lay_vals``: uint64 [q_n, n_layers, 2] opened layer (lo, hi) values —
    collected once by the caller (shared with the field-math stage).
    """
    nb = _native()
    q_n = len(indices)
    n_layers = len(proof.layer_roots)
    depth_in = (n0 // 2).bit_length() - 1
    layer_depths = [(n0 >> (k + 2)).bit_length() - 1 for k in range(n_layers)]
    if q_n == 0:
        return True
    idx_arr = np.asarray(indices, dtype=np.uint64)

    # input-group lanes, bucketed by leaf width (one native call per width)
    sizes = sorted({size for _root, size in input_groups})
    for size in sizes:
        g_ids = [g for g, (_r, s) in enumerate(input_groups) if s == size]
        n_g = len(g_ids)
        lanes = q_n * n_g
        leaf_len = 16 * size
        leaves = np.empty((lanes, leaf_len), dtype=np.uint8)
        sib = np.zeros((lanes, depth_in, 32), dtype=np.uint8)
        roots = np.empty((lanes, 32), dtype=np.uint8)
        # query-major, group-minor
        for j, g in enumerate(g_ids):
            leaves.reshape(q_n, n_g, leaf_len)[:, j] = (
                np.ascontiguousarray(grp_vals[g]).view(np.uint8)
            )
            path_blob = b"".join(
                qy.input_openings[g].path for qy in proof.queries
            )
            sib.reshape(q_n, n_g, depth_in, 32)[:, j] = np.frombuffer(
                path_blob, dtype=np.uint8
            ).reshape(q_n, depth_in, 32)
        root_block = np.frombuffer(
            b"".join(input_groups[g][0] for g in g_ids), dtype=np.uint8
        ).reshape(n_g, 32)
        roots[:] = np.tile(root_block, (q_n, 1))
        lane_idx = np.repeat(idx_arr, n_g)
        depths = np.full(lanes, depth_in, dtype=np.uint32)
        ok = nb.merkle_verify_batch(leaves, lane_idx, sib, depths, roots)
        if not bool(ok.all()):
            return False

    if n_layers == 0:
        return True
    lanes = q_n * n_layers
    max_depth = max(layer_depths)
    leaves = lay_vals.reshape(lanes, 2).view(np.uint8).reshape(lanes, 16)
    lane_idx = pos[:, 1:].astype(np.uint64).reshape(-1)
    sib = np.zeros((lanes, max_depth, 32), dtype=np.uint8)
    roots = np.tile(
        np.frombuffer(b"".join(proof.layer_roots), dtype=np.uint8).reshape(
            n_layers, 32
        ),
        (q_n, 1),
    )
    depths = np.tile(np.asarray(layer_depths, dtype=np.uint32), q_n)
    lay_blob = b"".join(
        op.path for qy in proof.queries for op in qy.layer_openings
    )
    stride = sum(layer_depths) * 32  # bytes per query's layer paths
    blob_arr = np.frombuffer(lay_blob, dtype=np.uint8).reshape(q_n, stride)
    lay_sib = sib.reshape(q_n, n_layers, max_depth, 32)
    cursor = 0
    for k in range(n_layers):
        d = layer_depths[k]
        lay_sib[:, k, :d] = blob_arr[:, cursor : cursor + d * 32].reshape(
            q_n, d, 32
        )
        cursor += d * 32
    ok = nb.merkle_verify_batch(leaves, lane_idx, sib, depths, roots)
    return bool(ok.all())


def fri_verify(
    proof: FriProof,
    input_groups: Sequence,
    g_eval: Callable[[int, int, Sequence[int], Sequence[int]], Tuple[int, int]],
    n0: int,
    offset: int,
    omega: int,
    q: int,
    params: FriParams,
    tr: FriTranscript,
    deep=None,
    g_eval_batch=None,
) -> bool:
    """Verify a FriProof.

    ``input_groups`` is a sequence of ``(root, group_size)`` pairs — each
    input oracle GROUP is one interleaved tree committing ``group_size``
    codewords position-wise (``commit_codeword_group``); a bare root is
    accepted as shorthand for a size-1 group.

    ``g_eval(index, half, lo_values, hi_values) -> (g_lo, g_hi)`` computes the
    virtual oracle at positions ``index`` and ``index + half`` from the
    authenticated per-oracle codeword values (flattened across groups in
    group order, one lo/hi pair per oracle).

    ``g_eval_batch(indices_u64, half, in_lo[q, k], in_hi[q, k]) ->
    (g_lo[q], g_hi[q])`` optionally supplies a vectorized oracle
    evaluation used on the native fast path when ``deep`` does not apply
    (kind-9's multi-point/shifted combination); it must be
    decision-identical to ``g_eval`` (raise DomainError to reject).

    ``deep`` optionally supplies the standard batched-DEEP oracle shape as
    six length-``n_in`` arrays ``(wa, wb, ea, eb, alphas, betas)`` meaning
    ``g(x) = sum_k wa[k] (f_k(x)-ea[k])/(x-alphas[k]) + wb[k]
    (f_k(x)-eb[k])/(x-betas[k])``; with it and the native library present,
    path authentication, oracle evaluation and the fold walk each run as one
    C call (8-lane Keccak + __uint128 field math) — same accept/reject
    decisions as the scalar path (pinned in tests).

    All opened codeword values must be canonical (< q) and every path must
    have the exact tree depth; both are rejected up front on every path (an
    honest prover never violates them, and the scalar arithmetic would
    reject them downstream anyway — the explicit check keeps the fast and
    golden paths decision-identical).
    """
    params.validate()
    d_bound = n0 >> params.log_blowup
    final_len = _effective_final_len(d_bound, params.final_len)
    if len(proof.final_coeffs) > final_len:
        return False

    # re-derive the fold challenges / query indices exactly as the prover did
    fold_challenges: List[int] = []
    d = d_bound
    layer_idx = 0
    while True:
        fold_challenges.append(tr.challenge_field(q, b"fri-fold"))
        d >>= 1
        if d <= final_len:
            break
        if layer_idx >= len(proof.layer_roots):
            return False
        tr.absorb(b"fri-layer-root", proof.layer_roots[layer_idx])
        layer_idx += 1
    if layer_idx != len(proof.layer_roots):
        return False
    tr.absorb_words(b"fri-final", list(proof.final_coeffs))
    indices = tr.challenge_indices(n0 // 2, params.num_queries, b"fri-query")
    if len(proof.queries) != len(indices):
        return False
    inv2 = field.mod_inverse(2, q)
    inv_offset = field.mod_inverse(offset, q)
    inv_omega = field.mod_inverse(omega, q)
    if inv2 is None or inv_offset is None or inv_omega is None:
        return False

    groups = [
        (g, 1) if isinstance(g, (bytes, bytearray)) else (g[0], int(g[1]))
        for g in input_groups
    ]
    n_groups = len(groups)
    n_in = sum(size for _r, size in groups)  # total oracle count
    n_layers = len(proof.layer_roots)
    q_n = len(indices)
    depth_in = (n0 // 2).bit_length() - 1
    layer_depths = [(n0 >> (k + 2)).bit_length() - 1 for k in range(n_layers)]
    for query in proof.queries:
        if len(query.input_openings) != n_groups:
            return False
        if len(query.layer_openings) != n_layers:
            return False
        for op, (_root, size) in zip(query.input_openings, groups):
            if len(op.values) != 2 * size:
                return False
            if len(op.path) != 32 * depth_in:
                return False
        for k, op in enumerate(query.layer_openings):
            if len(op.path) != 32 * layer_depths[k]:
                return False
    try:
        # per-group opened values [q_n, 2*size] plus the flattened
        # per-oracle (lo, hi) matrix [q_n, n_in, 2] the field math consumes
        grp_vals = [
            np.array(
                [qy.input_openings[g].values for qy in proof.queries],
                dtype=np.uint64,
            ).reshape(q_n, 2 * size)
            for g, (_root, size) in enumerate(groups)
        ]
        in_vals = (
            np.concatenate(grp_vals, axis=1).reshape(q_n, n_in, 2)
            if n_groups
            else np.empty((q_n, 0, 2), dtype=np.uint64)
        )
        lay_vals = np.array(
            [
                [(op.v_lo, op.v_hi) for op in qy.layer_openings]
                for qy in proof.queries
            ],
            dtype=np.uint64,
        ).reshape(q_n, n_layers, 2)
    except (ValueError, OverflowError):
        return False
    # canonicity: honest provers only emit reduced values; rejecting
    # non-canonical encodings up front keeps every path decision-identical
    if int(in_vals.max(initial=0)) >= q or int(lay_vals.max(initial=0)) >= q:
        return False

    pos = _query_positions(indices, n0, n_layers)
    half0 = n0 // 2

    # fast path: native batched hashing + native field math in three calls
    use_native = NATIVE_VERIFY and _native() is not None
    if use_native:
        nb = _native()
        if not _verify_paths_native(
            proof, groups, indices, pos, n0, grp_vals, lay_vals
        ):
            return False
        idx_arr = np.asarray(indices, dtype=np.uint64)
        in_lo = in_vals[:, :, 0]
        in_hi = in_vals[:, :, 1]
        lay_lo = lay_vals[:, :, 0]
        lay_hi = lay_vals[:, :, 1]
        if deep is not None:
            g = nb.fri_deep_g_eval(
                q, offset, omega, n0, idx_arr, in_lo, in_hi, *deep
            )
            if g is None:
                return False
            g_lo, g_hi = g
        elif g_eval_batch is not None:
            try:
                g_lo, g_hi = g_eval_batch(idx_arr, half0, in_lo, in_hi)
            except DomainError:
                return False
        else:
            g_lo = np.empty(len(indices), dtype=np.uint64)
            g_hi = np.empty(len(indices), dtype=np.uint64)
            try:
                for qi, i0 in enumerate(indices):
                    g_lo[qi], g_hi[qi] = g_eval(
                        i0, half0,
                        [int(v) for v in in_lo[qi]],
                        [int(v) for v in in_hi[qi]],
                    )
            except DomainError:
                return False
        return nb.fri_fold_walk(
            q, offset, omega, n0, [c % q for c in fold_challenges], idx_arr,
            g_lo, g_hi, lay_lo, lay_hi, [c % q for c in proof.final_coeffs],
        )

    for qi, (i0, query) in enumerate(zip(indices, proof.queries)):
        for op, (root, _size) in zip(query.input_openings, groups):
            if not verify_path(root, i0, op.leaf_bytes(), op.path):
                return False
        for k, op in enumerate(query.layer_openings):
            leaf = struct.pack("<QQ", op.v_lo, op.v_hi)
            if not verify_path(
                proof.layer_roots[k], int(pos[qi, k + 1]), leaf, op.path
            ):
                return False
        lo_vals = [int(v) for v in in_vals[qi, :, 0]]
        hi_vals = [int(v) for v in in_vals[qi, :, 1]]
        try:
            g_lo, g_hi = g_eval(i0, half0, lo_vals, hi_vals)
        except DomainError:
            return False

        # walk the fold layers; x_inv squares per layer (see _fold_pair_xinv)
        size = n0
        off, om = offset, omega
        v_lo, v_hi = g_lo, g_hi
        x_inv = inv_offset * pow(inv_omega, i0, q) % q
        for k, c in enumerate(fold_challenges):
            folded = _fold_pair_xinv(v_lo, v_hi, x_inv, c, q, inv2)
            x_inv = x_inv * x_inv % q
            size //= 2
            off = off * off % q
            om = om * om % q
            if k < n_layers:
                half = size // 2
                if pos[qi, k] >= half:
                    # x_{k+1} = -x_k^2 there: om_k^(size_k/2) = -1, and the
                    # position folds down by size_k/4
                    x_inv = (q - x_inv) % q
                op = query.layer_openings[k]
                expect = op.v_lo if pos[qi, k] < half else op.v_hi
                if folded != expect:
                    return False
                v_lo, v_hi = op.v_lo, op.v_hi
            else:
                # final layer: compare against the sent polynomial
                x_fin = off * pow(om, int(pos[qi, k]), q) % q
                fin = 0
                for cf in reversed(proof.final_coeffs):
                    fin = (fin * x_fin + cf) % q
                if folded != fin:
                    return False
    return True
