"""Succinct R1CS proofs: FRI-bound evaluation openings (ROADMAP item 6).

Closes the reference's two open opening gaps at once
(``lib.rs:788-791`` "real LWE openings are TODO"; ``opening.rs:104-115``
openings reveal the whole polynomial):

- **Non-revealing**: the verifier never sees Q or A_z/B_z/C_z — only Merkle
  roots of their Reed–Solomon codewords plus ~30 authenticated spot checks.
- **Binding for *all four* claimed evaluations**: the base protocol (like the
  reference) takes A_z/B_z/C_z evaluations on faith (stub openings); here
  every claimed value is tied to a committed low-degree polynomial by the
  batched FRI quotient ``G = sum_k lambda^t (f_k(X) - v_k) / (X - pt)``.
- **Zero-knowledge** (``zk=True``): Marlin-style vanishing masks. With
  rho_A/rho_B/rho_C uniform of length ``mask_len``:

      A~ = A + Z_H rho_A,  B~ = B + Z_H rho_B,  C~ = C + Z_H rho_C
      Q~ = Q + rho_A B + rho_B A + Z_H rho_A rho_B - rho_C

  so ``A~ B~ - C~ = Q~ Z_H`` still holds identically, the masked polynomials
  agree with the real ones on H, and any ``mask_len`` codeword positions are
  jointly uniform (``mask_len = 2*num_queries + 8`` covers every queried pair
  plus alpha/beta). Unlike the reference's scalar blinding (``lib.rs:890``,
  whose proof ships ``r`` in clear), nothing about Q leaks.

The verification equation is unchanged — ``Q~(x) Z_H(x) = A~(x) B~(x) - C~(x)``
at the dual Fiat–Shamir challenges — so soundness composes with the existing
dual-challenge analysis; the FRI layer adds ~``num_queries * log_blowup`` bits
of proximity soundness for the degree claims.

Transcript (wire v4): alpha/beta derive from the v1 byte layout over the
SHA3-256 digest of the LWE commitment words (4 LE64 words) with the input
Merkle root appended — the claimed evaluations are sampled after *all*
commitments are fixed, and the verifier hashes 32 bytes instead of the
full ring vector (binding by SHA3 collision resistance).

Requires an NTT field (Goldilocks / q45 / healthcare prime) and a roots
domain; the tv moduli are not smooth and keep the revealing openings, exactly
as the reference keeps its O(m^2) path for them.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Sequence, Tuple

from ..commit import lwe
from ..core import field
from ..core.errors import DomainError, SerializationError
from ..r1cs import poly as polyops
from ..r1cs.domain import ROOTS
from ..r1cs.r1cs import R1CS
from ..transcript.challenge import Challenge, derive_dual
from ..utils.chacha import ChaCha20Rng
from ..ops import goldilocks_np as glnp
from .fri import (
    FriParams,
    FriProof,
    FriTranscript,
    _gl_inverse_array,
    _gl_powers,
    batch_inverse,
    commit_codeword,
    coset_offset,
    coset_points,
    fri_prove,
    fri_supported,
    fri_verify,
    lde,
    max_codeword_size,
    root_of_order,
)

_MAGIC = b"LSNKTPU1"
KIND_R1CS_SUCCINCT = 7

#: Wire-format version for the FRI-carrying kinds (7/8/9), written right
#: after the kind byte. Bumped 1 -> 2 when the FriQuery count fields grew
#: u8 -> u16 (pre-0.7 blobs have the modulus LE-word there instead, whose
#: first byte is odd — every supported modulus is an odd prime — so they are
#: rejected deterministically at the header, ADVICE r4 #1); bumped 2 -> 3
#: when the input oracles moved to ONE interleaved tree per statement
#: (GroupOpening leaves: 4x fewer paths and hashes per query); bumped
#: 3 -> 4 with the digest-first challenge transcript (alpha/beta derive
#: over SHA3-256(commitment words) — 4 words instead of the full ring
#: vector, saving 2x 64 KB of verifier hashing per statement at m=2^13;
#: binding unchanged by SHA3 collision resistance).
WIRE_VERSION = 4

import hashlib


def commitment_digest_words(commitment) -> "np.ndarray":
    """The v4 transcript's compact commitment binding: SHA3-256 over the
    packed LE64 commitment words, as 4 LE64 words (domain-separated)."""
    words = np.ascontiguousarray(
        np.asarray(commitment.words, dtype=np.uint64)
    ).astype("<u8")
    dig = hashlib.sha3_256(b"LSNK-commitment-v4" + words.tobytes()).digest()
    return np.frombuffer(dig, dtype="<u8")


def statement_binding_words(commitment, r1cs) -> "np.ndarray":
    """The v4 challenge-derivation word prefix: commitment digest ‖ circuit
    digest (8 LE64 words). Unlike v1 (kept for reference parity on kinds
    1-3), the FRI kinds bind the circuit into alpha/beta, so a proof for
    one circuit can never verify against another of the same shape —
    closing the v1-inherited cross-circuit malleability for kinds 7/8
    (kind 9 is bound structurally: its verifier recomputes r^T M)."""
    from ..utils.artifacts import circuit_digest

    cdig = bytes.fromhex(circuit_digest(r1cs))
    return np.concatenate(
        [
            commitment_digest_words(commitment),
            np.frombuffer(cdig, dtype="<u8"),
        ]
    )


def _check_wire_version(data: bytes, off: int) -> int:
    if off >= len(data):
        raise SerializationError("truncated proof header")
    ver = data[off]
    if ver != WIRE_VERSION:
        raise SerializationError(
            f"unsupported succinct wire version {ver} (expected "
            f"{WIRE_VERSION}; odd values indicate a pre-0.7 blob)"
        )
    return off + 1

#: Verifier-side cap on the prover-chosen mask length (the degree bound grows
#: with it; an absurd mask would water down the FRI rate).
_MASK_LEN_CAP = 4096


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length() if n > 1 else 1


# --- vectorized Goldilocks front-end -------------------------------------------
#
# For Goldilocks roots-domain circuits every polynomial step before the FRI
# layer (interpolation, odd-coset quotient, mask composition, evaluation)
# runs on the vectorized uint64 kernels instead of Python-int loops —
# bit-identical proof bytes (pinned in tests/test_succinct.py). The generic
# path stays as the golden oracle and serves the other NTT fields.

#: module knob (tests flip it to pin fast/golden byte equality)
GL_FAST_FRONTEND = True

import numpy as np


def _gl_frontend_applicable(r1cs: R1CS) -> bool:
    if not GL_FAST_FRONTEND or r1cs.modulus != glnp.GOLDILOCKS:
        return False
    if r1cs.domain.kind != ROOTS or r1cs.m & (r1cs.m - 1) or r1cs.m < 2:
        return False
    return glnp.goldilocks_ntt(r1cs.m).omega == r1cs.domain.omega % r1cs.modulus


def _gl_trim(p: np.ndarray) -> np.ndarray:
    nz = np.nonzero(p)[0]
    end = int(nz[-1]) + 1 if len(nz) else 1
    return p[:end]


def _gl_quotient_and_interpolations(r1cs: R1CS, witness: Sequence[int]):
    """(Q, A_z, B_z, C_z) as uint64 arrays; Q trimmed like the host path.

    Mirrors ``R1CS.compute_quotient_poly`` (odd-coset formulation,
    ``r1cs/r1cs.py::_quotient_odd_coset``) + ``R1CS.interpolations`` exactly.
    """
    from ..core.errors import InvalidWitnessError

    q = r1cs.modulus
    az, bz, cz = r1cs.compute_constraint_evals(witness)
    az = np.array(az, dtype=np.uint64)
    bz = np.array(bz, dtype=np.uint64)
    cz = np.array(cz, dtype=np.uint64)
    if bool(glnp.gl_sub(glnp.gl_mul(az, bz), cz).any()):
        raise InvalidWitnessError("witness does not satisfy R1CS constraints")
    ntt = glnp.goldilocks_ntt(r1cs.m)
    a_poly = ntt.inverse(az)
    b_poly = ntt.inverse(bz)
    c_poly = ntt.inverse(cz)
    # odd coset psi*<omega>: Z_H === -2 there, so Q_hat = (A.B - C) / (-2)
    a_odd = ntt.forward_negacyclic(a_poly)
    b_odd = ntt.forward_negacyclic(b_poly)
    c_odd = ntt.forward_negacyclic(c_poly)
    neg_half_inv = np.uint64(glnp.gl_inv(q - 2))
    q_odd = glnp.gl_mul(
        glnp.gl_sub(glnp.gl_mul(a_odd, b_odd), c_odd), neg_half_inv
    )
    q_coeffs = glnp.gl_mul(ntt.inverse(q_odd), ntt._psi_inv_pows)
    return _gl_trim(q_coeffs), a_poly, b_poly, c_poly


def _gl_poly_eval(p: np.ndarray, x: int) -> int:
    """p(x) mod Goldilocks: power ladder + pairwise tree reduction."""
    if len(p) == 0:
        return 0
    terms = glnp.gl_mul(np.asarray(p, dtype=np.uint64), _gl_powers(x, len(p)))
    while len(terms) > 1:
        if len(terms) & 1:
            terms = np.concatenate([terms, np.zeros(1, dtype=np.uint64)])
        terms = glnp.gl_add(terms[0::2], terms[1::2])
    return int(terms[0])


def _gl_conv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact polynomial product via a cyclic NTT of padded size."""
    out_len = len(a) + len(b) - 1
    s = _next_pow2(out_len)
    ntt = glnp.goldilocks_ntt(max(s, 2))
    pa = np.zeros(ntt.n, dtype=np.uint64)
    pa[: len(a)] = a
    pb = np.zeros(ntt.n, dtype=np.uint64)
    pb[: len(b)] = b
    return ntt.inverse(glnp.gl_mul(ntt.forward(pa), ntt.forward(pb)))[:out_len]


def _gl_zh_mul(rho: np.ndarray, m: int) -> np.ndarray:
    """(X^m - 1) * rho, vectorized (Z_H is the roots-domain vanishing poly)."""
    out = np.zeros(m + len(rho), dtype=np.uint64)
    out[m:] = rho
    out[: len(rho)] = glnp.gl_sub(out[: len(rho)], rho)
    return out


def _gl_add_padded(*polys: np.ndarray) -> np.ndarray:
    n = max(len(p) for p in polys)
    acc = np.zeros(n, dtype=np.uint64)
    for p in polys:
        padded = np.zeros(n, dtype=np.uint64)
        padded[: len(p)] = p
        acc = glnp.gl_add(acc, padded)
    return acc


def _degree_bound(m: int, mask_len: int) -> int:
    """Shared prover/verifier formula: smallest power of two covering every
    committed polynomial (max length is ``m + 2*mask_len``, reached by Q~'s
    ``Z_H rho_A rho_B`` term)."""
    return _next_pow2(m + 2 * mask_len) if mask_len else _next_pow2(m)


def _roots_to_words(roots: Sequence[bytes]) -> List[int]:
    words: List[int] = []
    for root in roots:
        words.extend(
            int.from_bytes(root[i : i + 8], "little") for i in range(0, 32, 8)
        )
    return words


@dataclasses.dataclass(frozen=True)
class SuccinctProofR1CS:
    """R1CS proof with FRI-bound openings (wire kind 7).

    Field order mirrors ``ProofR1CS`` where shared; ``mask_len > 0`` marks the
    zero-knowledge variant (verification is identical — the masks are folded
    into the committed polynomials).
    """

    commitment_q: lwe.Commitment  # lattice commitment to the unmasked Q
    input_root: bytes  # ONE interleaved Merkle root committing A~, B~, C~, Q~
    challenge_alpha: Challenge
    challenge_beta: Challenge
    # claimed evaluations at alpha then beta (A~, B~, C~, Q~)
    a_alpha: int
    b_alpha: int
    c_alpha: int
    q_alpha: int
    a_beta: int
    b_beta: int
    c_beta: int
    q_beta: int
    fri: FriProof
    m: int
    mask_len: int
    log_blowup: int
    num_queries: int
    final_len: int
    modulus: int

    @property
    def fri_params(self) -> FriParams:
        return FriParams(
            log_blowup=self.log_blowup,
            num_queries=self.num_queries,
            final_len=self.final_len,
        )

    def _evals(self) -> Tuple[int, ...]:
        return (
            self.a_alpha,
            self.b_alpha,
            self.c_alpha,
            self.q_alpha,
            self.a_beta,
            self.b_beta,
            self.c_beta,
            self.q_beta,
        )

    def to_bytes(self) -> bytes:
        out = _MAGIC + bytes([KIND_R1CS_SUCCINCT, WIRE_VERSION])
        out += struct.pack("<QQIBHH", self.modulus, self.m, self.mask_len,
                           self.log_blowup, self.num_queries, self.final_len)
        words = self.commitment_q.as_words()
        out += struct.pack("<Q", len(words))
        out += b"".join(struct.pack("<Q", int(w)) for w in words)
        out += self.input_root
        out += self.challenge_alpha.to_bytes() + self.challenge_beta.to_bytes()
        out += struct.pack("<8Q", *self._evals())
        out += self.fri.to_bytes()
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "SuccinctProofR1CS":
        if len(data) < 9 or data[:8] != _MAGIC or data[8] != KIND_R1CS_SUCCINCT:
            raise SerializationError("bad succinct-proof header")
        off = _check_wire_version(data, 9)
        if off + 25 > len(data):
            raise SerializationError("truncated succinct proof header")
        modulus, m, mask_len, log_blowup, num_queries, final_len = struct.unpack_from(
            "<QQIBHH", data, off
        )
        off += 25
        if off + 8 > len(data):
            raise SerializationError("truncated commitment length")
        (n_words,) = struct.unpack_from("<Q", data, off)
        off += 8
        if n_words > (1 << 24):
            raise SerializationError("unreasonable commitment length")
        if off + 8 * n_words > len(data):
            raise SerializationError("truncated commitment words")
        words = list(struct.unpack_from(f"<{n_words}Q", data, off)) if n_words else []
        off += 8 * n_words
        if off + 32 > len(data):
            raise SerializationError("truncated input root")
        input_root = data[off : off + 32]
        off += 32
        if off + 80 > len(data):
            raise SerializationError("truncated challenges")
        ch_a = Challenge.from_bytes(data[off : off + 40])
        ch_b = Challenge.from_bytes(data[off + 40 : off + 80])
        off += 80
        if off + 64 > len(data):
            raise SerializationError("truncated evaluations")
        evals = struct.unpack_from("<8Q", data, off)
        off += 64
        fri_proof, off = FriProof.read(data, off)
        return SuccinctProofR1CS(
            commitment_q=lwe.Commitment(np.array(words, dtype=np.uint64)),
            input_root=input_root,
            challenge_alpha=ch_a,
            challenge_beta=ch_b,
            a_alpha=evals[0],
            b_alpha=evals[1],
            c_alpha=evals[2],
            q_alpha=evals[3],
            a_beta=evals[4],
            b_beta=evals[5],
            c_beta=evals[6],
            q_beta=evals[7],
            fri=fri_proof,
            m=m,
            mask_len=mask_len,
            log_blowup=log_blowup,
            num_queries=num_queries,
            final_len=final_len,
            modulus=modulus,
        )


# --- shared transcript seeding -------------------------------------------------


def _seed_fri_transcript(
    q: int,
    m: int,
    mask_len: int,
    params: FriParams,
    d_bound: int,
    input_roots: Sequence[bytes],
    alpha: int,
    beta: int,
    evals: Sequence[int],
) -> FriTranscript:
    tr = FriTranscript()
    tr.absorb_words(
        b"succinct-params",
        [q, m, mask_len, params.log_blowup, params.num_queries,
         params.final_len, d_bound],
    )
    for root in input_roots:
        tr.absorb(b"input-root", root)
    tr.absorb_words(b"points", [alpha, beta])
    tr.absorb_words(b"evals", list(evals))
    return tr


def _check_instance(r1cs: R1CS, params: FriParams, mask_len: int) -> Tuple[int, int, int]:
    """Validate field/domain support; return (d_bound, N, omega_N)."""
    q = r1cs.modulus
    if not fri_supported(q):
        raise DomainError(
            f"succinct openings need an NTT field (modulus {q} has no "
            "registered 2-adic subgroup); use the revealing openings instead"
        )
    if r1cs.domain.kind != ROOTS:
        raise DomainError(
            "succinct openings require a roots interpolation domain "
            f"(got {r1cs.domain.kind})"
        )
    d_bound = _degree_bound(r1cs.m, mask_len)
    n0 = d_bound << params.log_blowup
    if n0 > max_codeword_size(q):
        raise DomainError(
            f"codeword size {n0} exceeds the 2-adic limit "
            f"{max_codeword_size(q)} of modulus {q}; lower log_blowup, "
            "num_queries, or the circuit size"
        )
    return d_bound, n0, root_of_order(q, n0)


# --- prover ------------------------------------------------------------------


def prove_r1cs_succinct(
    r1cs: R1CS,
    witness: Sequence[int],
    ctx: lwe.LweContext,
    seed: int,
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seed: Optional[int] = None,
    rng: Optional[ChaCha20Rng] = None,
    device_lde: bool = False,
) -> SuccinctProofR1CS:
    """Prove R1CS satisfaction with succinct, binding, optionally ZK openings.

    ``device_lde=True`` (Goldilocks only) runs the four Reed–Solomon
    encodings as one batched device NTT dispatch; the proof bytes are
    identical to the host path.
    """
    params = fri_params or FriParams()
    params.validate()
    q = r1cs.modulus
    m = r1cs.m
    mask_len = (2 * params.num_queries + 8) if zk else 0
    d_bound, n0, omega_n = _check_instance(r1cs, params, mask_len)
    offset = coset_offset(q)

    gl_fast = _gl_frontend_applicable(r1cs)
    if gl_fast:
        q_coeffs, a_poly, b_poly, c_poly = _gl_quotient_and_interpolations(
            r1cs, witness
        )
    else:
        q_coeffs = r1cs.compute_quotient_poly(witness)  # validates the witness
        a_poly, b_poly, c_poly = r1cs.interpolations(witness)

    if zk:
        if rng is None:
            if blinding_seed is not None:
                rng = ChaCha20Rng.from_u64(blinding_seed)
            else:
                import secrets

                rng = ChaCha20Rng(secrets.token_bytes(32))
        masks = [[rng.next_u64() % q for _ in range(mask_len)] for _ in range(3)]
        rho_a, rho_b, rho_c = masks
        if gl_fast:
            rho_a_v = np.array(rho_a, dtype=np.uint64)
            rho_b_v = np.array(rho_b, dtype=np.uint64)
            rho_c_v = np.array(rho_c, dtype=np.uint64)
            a_t = _gl_add_padded(a_poly, _gl_zh_mul(rho_a_v, m))
            b_t = _gl_add_padded(b_poly, _gl_zh_mul(rho_b_v, m))
            c_t = _gl_add_padded(c_poly, _gl_zh_mul(rho_c_v, m))
            q_t = _gl_add_padded(
                q_coeffs,
                _gl_conv(rho_a_v, b_poly),
                _gl_conv(rho_b_v, a_poly),
                _gl_zh_mul(_gl_conv(rho_a_v, rho_b_v), m),
                glnp.gl_neg(rho_c_v),
            )
        else:
            z_h = r1cs.domain.vanishing_poly()
            a_t = polyops.poly_add(a_poly, polyops.poly_mul(z_h, rho_a, q), q)
            b_t = polyops.poly_add(b_poly, polyops.poly_mul(z_h, rho_b, q), q)
            c_t = polyops.poly_add(c_poly, polyops.poly_mul(z_h, rho_c, q), q)
            q_t = polyops.poly_add(
                q_coeffs, polyops.poly_mul(rho_a, b_poly, q), q
            )
            q_t = polyops.poly_add(q_t, polyops.poly_mul(rho_b, a_poly, q), q)
            q_t = polyops.poly_add(
                q_t, polyops.poly_mul(z_h, polyops.poly_mul(rho_a, rho_b, q), q), q
            )
            q_t = polyops.poly_sub(q_t, rho_c, q)
    else:
        a_t, b_t, c_t, q_t = a_poly, b_poly, c_poly, q_coeffs

    polys = [a_t, b_t, c_t, q_t]
    # Device-resident path (Goldilocks + device hashing): codewords and
    # Merkle levels never round-trip the relay; see proof/fri_device.py.
    from . import fri as fri_mod

    use_device_fri = (
        device_lde and q == glnp.GOLDILOCKS and fri_mod.DEVICE_HASH
    )
    planes_dev = None
    forest = None
    if use_device_fri:
        from . import fri_device
        from .fri import lde_batch_device_planes

        planes_dev, _ = lde_batch_device_planes(
            polys, n0, offset, q, pull_values=False
        )
        codewords = None  # device DEEP: codewords never visit the host
        forest = fri_device.commit_planes_dev_groups(planes_dev[:, None])
        root = forest.roots[0]
    else:
        if device_lde:
            from .fri import lde_batch_device

            codewords = lde_batch_device(polys, n0, offset, q)
        else:
            codewords = [lde(p, n0, offset, omega_n, q) for p in polys]
        from .fri import commit_codeword_group

        tree = commit_codeword_group(codewords)
        root = tree.root

    # The lattice layer commits the *unmasked* quotient (LWE commitments are
    # hiding on their own); the masked Q~ is bound by its Merkle root. This
    # also keeps the message within the ring degree regardless of mask_len.
    commitment_q, _op = lwe.commit(ctx, q_coeffs, seed)
    # ndarray word vector: the transcript packer's vectorized path
    comm_words = np.concatenate(
        [
            statement_binding_words(commitment_q, r1cs),
            np.array(_roots_to_words([root]), dtype=np.uint64),
        ]
    )
    public_inputs = r1cs.public_inputs(witness)
    ch_alpha, ch_beta = derive_dual(public_inputs, comm_words, q)
    alpha, beta = ch_alpha.alpha, ch_beta.alpha

    if gl_fast:
        evals = [_gl_poly_eval(p, alpha) for p in polys] + [
            _gl_poly_eval(p, beta) for p in polys
        ]
    else:
        evals = [polyops.poly_eval(p, alpha, q) for p in polys] + [
            polyops.poly_eval(p, beta, q) for p in polys
        ]

    tr = _seed_fri_transcript(
        q, m, mask_len, params, d_bound, [root], alpha, beta, evals
    )
    lam = tr.challenge_field(q, b"fri-lambda")

    # combined DEEP quotient over the coset (vectorized for Goldilocks;
    # fully on-device for the device-resident path)
    if use_device_fri:
        g = None
    elif q == glnp.GOLDILOCKS:
        xs_np = glnp.gl_mul(np.uint64(offset), _gl_powers(omega_n, n0))
        inv_ab = _gl_inverse_array(
            np.stack(
                [
                    glnp.gl_sub(xs_np, np.uint64(alpha)),
                    glnp.gl_sub(xs_np, np.uint64(beta)),
                ]
            )
        )
        inv_a, inv_b = inv_ab[0], inv_ab[1]
        g = np.zeros(n0, dtype=np.uint64)
        lam_pow = 1
        for k, cw in enumerate(codewords):
            lam2 = lam_pow * lam % q
            term_a = glnp.gl_mul(
                glnp.gl_mul(np.uint64(lam_pow), glnp.gl_sub(cw, np.uint64(evals[k]))),
                inv_a,
            )
            term_b = glnp.gl_mul(
                glnp.gl_mul(np.uint64(lam2), glnp.gl_sub(cw, np.uint64(evals[4 + k]))),
                inv_b,
            )
            g = glnp.gl_add(g, glnp.gl_add(term_a, term_b))
            lam_pow = lam2 * lam % q
    else:
        xs = coset_points(offset, omega_n, n0, q)
        inv_a = batch_inverse([(x - alpha) % q for x in xs], q)
        inv_b = batch_inverse([(x - beta) % q for x in xs], q)
        g = [0] * n0
        lam_pow = 1
        for k, cw in enumerate(codewords):
            va = evals[k]
            vb = evals[4 + k]
            lam2 = lam_pow * lam % q
            for i in range(n0):
                g[i] = (
                    g[i]
                    + lam_pow * ((cw[i] - va) % q) % q * inv_a[i]
                    + lam2 * ((cw[i] - vb) % q) % q * inv_b[i]
                ) % q
            lam_pow = lam2 * lam % q

    if use_device_fri:
        from . import fri_device

        input_planes = planes_dev[:, None, :, :]  # (4, 1, 4, n0)
        g_planes = fri_device.deep_combine_device(
            input_planes,
            np.array([alpha], dtype=np.uint64),
            np.array([beta], dtype=np.uint64),
            np.array([lam], dtype=np.uint64),
            np.array([evals], dtype=np.uint64),
            offset, omega_n,
        )
        fri_proof = fri_device.fri_prove_device(
            g_planes, input_planes, forest, offset, omega_n, q, params, [tr],
        )[0]
    else:
        fri_proof = fri_prove(
            g, [(codewords, tree)], offset, omega_n, q, params, tr
        )
    return SuccinctProofR1CS(
        commitment_q=commitment_q,
        input_root=root,
        challenge_alpha=ch_alpha,
        challenge_beta=ch_beta,
        a_alpha=evals[0],
        b_alpha=evals[1],
        c_alpha=evals[2],
        q_alpha=evals[3],
        a_beta=evals[4],
        b_beta=evals[5],
        c_beta=evals[6],
        q_beta=evals[7],
        fri=fri_proof,
        m=m,
        mask_len=mask_len,
        log_blowup=params.log_blowup,
        num_queries=params.num_queries,
        final_len=params.final_len,
        modulus=q,
    )


# --- verifier ----------------------------------------------------------------


def verify_r1cs_succinct(
    proof: SuccinctProofR1CS,
    public_inputs: Sequence[int],
    r1cs: R1CS,
    min_params: Optional[FriParams] = None,
) -> bool:
    """Verify a succinct R1CS proof.

    ``min_params`` (default: the library defaults) is the verifier's floor on
    the prover-chosen FRI parameters — weaker proofs are rejected.
    """
    q = r1cs.modulus
    if proof.modulus != q or proof.m != r1cs.m:
        return False
    if proof.mask_len > _MASK_LEN_CAP:
        return False
    params = proof.fri_params
    try:
        params.validate()
        d_bound, n0, omega_n = _check_instance(r1cs, params, proof.mask_len)
    except DomainError:
        return False
    floor = min_params or FriParams()
    if not params.at_least(floor):
        return False

    # 1. dual challenges bind the commitment digest, the circuit digest and
    #    the interleaved input root (v4)
    comm_words = np.concatenate(
        [
            statement_binding_words(proof.commitment_q, r1cs),
            np.array(_roots_to_words([proof.input_root]), dtype=np.uint64),
        ]
    )
    ch_alpha = Challenge.derive(public_inputs, comm_words, q)
    if proof.challenge_alpha.alpha != ch_alpha.alpha:
        return False
    alpha = ch_alpha.alpha
    ch_beta = Challenge.derive([alpha], comm_words, q)
    if proof.challenge_beta.alpha != ch_beta.alpha:
        return False
    beta = ch_beta.alpha

    evals = proof._evals()
    if any(v >= q for v in evals):
        return False

    # 2. quotient identity at both challenge points
    zh_alpha = r1cs.eval_vanishing(alpha)
    zh_beta = r1cs.eval_vanishing(beta)
    if field.mul_mod(proof.q_alpha, zh_alpha, q) != field.sub_mod(
        field.mul_mod(proof.a_alpha, proof.b_alpha, q), proof.c_alpha, q
    ):
        return False
    if field.mul_mod(proof.q_beta, zh_beta, q) != field.sub_mod(
        field.mul_mod(proof.a_beta, proof.b_beta, q), proof.c_beta, q
    ):
        return False

    # 3. FRI: every claimed evaluation is bound to its committed polynomial
    offset = coset_offset(q)
    tr = _seed_fri_transcript(
        q, r1cs.m, proof.mask_len, params, d_bound, [proof.input_root],
        alpha, beta, evals,
    )
    lam = tr.challenge_field(q, b"fri-lambda")

    def g_eval(index, half, lo_vals, hi_vals):
        out = []
        for pos, vals in ((index, lo_vals), (index + half, hi_vals)):
            x = offset * pow(omega_n, pos, q) % q
            # paired inversion: one Fermat inverse for both denominators
            da = (x - alpha) % q
            db = (x - beta) % q
            iab = field.mod_inverse(da * db % q, q)
            if iab is None:
                raise DomainError("challenge point on the evaluation domain")
            ia = iab * db % q
            ib = iab * da % q
            acc = 0
            lam_pow = 1
            for k, fv in enumerate(vals):
                lam2 = lam_pow * lam % q
                acc = (
                    acc
                    + lam_pow * ((fv - evals[k]) % q) % q * ia
                    + lam2 * ((fv - evals[4 + k]) % q) % q * ib
                ) % q
                lam_pow = lam2 * lam % q
            out.append(acc)
        return out[0], out[1]

    return fri_verify(
        proof.fri, [(proof.input_root, 4)], g_eval, n0, offset, omega_n, q,
        params, tr, deep=_deep_arrays(lam, evals, alpha, beta, q),
    )


def _deep_arrays(lam, evals, alpha, beta, q, n_polys: int = 4):
    """The standard DEEP weight/eval/point arrays for ``fri_verify(deep=...)``
    (the lambda-power ladder of the combined quotient, one column per
    committed polynomial)."""
    wa = np.empty(n_polys, dtype=np.uint64)
    wb = np.empty(n_polys, dtype=np.uint64)
    lam_pow = 1
    for k in range(n_polys):
        lam2 = lam_pow * lam % q
        wa[k] = lam_pow
        wb[k] = lam2
        lam_pow = lam2 * lam % q
    ea = np.array([evals[k] % q for k in range(n_polys)], dtype=np.uint64)
    eb = np.array(
        [evals[n_polys + k] % q for k in range(n_polys)], dtype=np.uint64
    )
    alphas = np.full(n_polys, alpha % q, dtype=np.uint64)
    betas = np.full(n_polys, beta % q, dtype=np.uint64)
    return wa, wb, ea, eb, alphas, betas


# --- zero-knowledge simulator --------------------------------------------------
#
# The verifier's view of a succinct-ZK proof — the 8 claimed evaluations plus
# the queried input-codeword values — is simulatable WITHOUT the witness: the
# Marlin-style masks make (A~, B~, C~) jointly uniform at any <= mask_len
# codeword positions (and at the out-of-domain points alpha/beta), while Q~
# is the deterministic function (A~ B~ - C~) / Z_H of them. The simulator
# samples exactly that distribution. Reference intent: the base-protocol
# simulator ``simulate_proof`` + ``tests/zk_simulator.rs:29-90``; the
# reference has no succinct layer, so this extends its ZK contract to the
# FRI-bound openings (VERDICT round-2 item 7).


@dataclasses.dataclass(frozen=True)
class SuccinctView:
    """What a (possibly simulated) succinct proof reveals about the inputs:
    claimed evaluations at alpha/beta plus the queried codeword values
    ((a, b, c, q) value pairs per query)."""

    alpha: int
    beta: int
    evals: Tuple[int, ...]  # (a,b,c,q)@alpha then (a,b,c,q)@beta
    positions: Tuple[int, ...]  # query indices in [0, n0/2)
    leaves: Tuple[Tuple[Tuple[int, int], ...], ...]  # [query][k] = (lo, hi)


def succinct_view(proof: SuccinctProofR1CS, r1cs: R1CS) -> SuccinctView:
    """Extract the revealed view from a real proof (query positions replayed
    from the Fiat-Shamir transcript exactly as the verifier derives them)."""
    params = proof.fri_params
    d_bound, n0, _omega_n = _check_instance(r1cs, params, proof.mask_len)
    evals = proof._evals()
    tr = _seed_fri_transcript(
        proof.modulus, r1cs.m, proof.mask_len, params, d_bound,
        [proof.input_root], proof.challenge_alpha.alpha,
        proof.challenge_beta.alpha, evals,
    )
    tr.challenge_field(proof.modulus, b"fri-lambda")
    for root in proof.fri.layer_roots:
        tr.challenge_field(proof.modulus, b"fri-fold")
        tr.absorb(b"fri-layer-root", root)
    tr.challenge_field(proof.modulus, b"fri-fold")
    tr.absorb_words(b"fri-final", proof.fri.final_coeffs)
    indices = tr.challenge_indices(
        n0 // 2, params.num_queries, b"fri-query"
    )
    leaves = tuple(
        tuple(
            (qr.input_openings[0].values[2 * k], qr.input_openings[0].values[2 * k + 1])
            for k in range(4)
        )
        for qr in proof.fri.queries
    )
    return SuccinctView(
        alpha=proof.challenge_alpha.alpha,
        beta=proof.challenge_beta.alpha,
        evals=evals,
        positions=tuple(indices),
        leaves=leaves,
    )


def simulate_succinct_view(
    r1cs: R1CS,
    sim_seed: Optional[int] = None,
    fri_params: Optional[FriParams] = None,
) -> SuccinctView:
    """Sample the verifier-view distribution of a succinct-ZK proof without
    any witness.

    alpha/beta and the query positions are uniform (as Fiat-Shamir outputs
    are modeled); (a, b, c) values are uniform at every revealed point; q is
    computed through the quotient identity q = (a*b - c) / Z_H(x), which is
    exactly how the honest masked values are distributed (the masks are a
    degree-``mask_len`` one-time pad on <= mask_len positions).
    ``sim_seed=None`` draws fresh system randomness (reference
    ``simulate_proof``'s contract, ``zk_simulator.rs:81-96``)."""
    params = fri_params or FriParams()
    params.validate()
    q = r1cs.modulus
    mask_len = 2 * params.num_queries + 8
    d_bound, n0, omega_n = _check_instance(r1cs, params, mask_len)
    offset = coset_offset(q)
    if sim_seed is not None:
        rng = ChaCha20Rng.from_u64(sim_seed)
    else:
        import secrets

        rng = ChaCha20Rng(secrets.token_bytes(32))

    def u() -> int:
        return rng.next_u64() % q

    def zh(x: int) -> int:
        return (pow(x, r1cs.m, q) - 1) % q

    # out-of-domain points: uniform, Z_H != 0 w.o.p. (resample like a real
    # transcript would never hit H for 45+-bit fields; guard anyway)
    while True:
        alpha = u()
        if zh(alpha):
            break
    while True:
        beta = u()
        if zh(beta):
            break
    ev = []
    for x in (alpha, beta):
        a, b, c = u(), u(), u()
        qv = (a * b - c) % q * field.mod_inverse(zh(x), q) % q
        ev.extend([a, b, c, qv])
    half = n0 // 2
    positions = tuple(rng.next_u64() % half for _ in range(params.num_queries))
    leaves = []
    for i0 in positions:
        row = []
        vals = {}
        for pos in (i0, i0 + half):
            x = offset * pow(omega_n, pos, q) % q
            a, b, c = u(), u(), u()
            qv = (a * b - c) % q * field.mod_inverse(zh(x), q) % q
            vals[pos] = (a, b, c, qv)
        for k in range(4):
            row.append((vals[i0][k], vals[i0 + half][k]))
        leaves.append(tuple(row))
    return SuccinctView(
        alpha=alpha,
        beta=beta,
        evals=tuple(ev),
        positions=positions,
        leaves=tuple(leaves),
    )
