"""Succinct committed-witness binding: lincheck/mulcheck without revealing z
(wire kind 9).

This is the capability the reference planned as "Phase 2" and never built
(``cpp-core/src/lincheck.cpp`` / ``mulcheck.cpp`` are empty placeholders;
``lib.rs:788-791`` "real LWE openings are TODO") and the last step the
revealing variant (``proof/checks.py``) left open: prove that the
Merkle-committed codewords A~/B~/C~ really are A.z / B.z / C.z for a SINGLE
committed witness z whose public prefix equals the statement — with z never
disclosed.

Construction (one extra univariate sumcheck on top of the kind-7 layer):

- The witness is committed as the Reed-Solomon codeword of its low-degree
  extension ``z^`` over the sumcheck domain H_s = <w_s> of size
  M = max(m, next_pow2(n)) (ZK: plus a vanishing mask ``Z_Hs * rho_z``), and
  Merkle-committed alongside A~/B~/C~/Q~.
- **mulcheck** is the existing quotient identity ``Q~ Z_H = A~ B~ - C~``
  checked at the dual out-of-domain challenges alpha/beta: it already proves
  the Hadamard relation of the committed codewords ON H.
- **lincheck** ties those codewords to z: for a transcript challenge r and
  batching weights eta_A/eta_B/eta_C, with rows embedded in H_s at stride
  s = M/m,

      sum_{h in H_s} [ R_s(h) * (eta_A A~ + eta_B B~ + eta_C C~)(h)
                       - U_s(h) * z^(h) ] = 0

  where R_s interpolates r^i at w_s^{i s} (zero elsewhere) and U_s
  interpolates u_j = sum_M eta_M (r^T M)_j at w_s^j — both verifier-computable
  in O(m + nnz) from the public matrices. By Schwartz-Zippel over r, equality
  for random r forces A~(w^i) = (A z)_i for every row (and likewise B, C).
- The sum is proven by the univariate sumcheck over the multiplicative
  subgroup H_s (Z_Hs = X^M - 1): the prover commits h(X) and p(X) with

      F(X) = Z_Hs(X) * h(X) + X * p(X),      deg p <= M - 2,

  which holds iff sum_{H_s} F = 0 (BCRSVW/Aurora lemma: the sum over a
  multiplicative subgroup is M times the constant term of F mod Z_Hs). The
  identity is checked at one out-of-domain point gamma; p's tight degree
  bound is enforced by an extra shifted column ``lambda^T X^{sh} p(X)``
  (sh = d_bound - (M-1)) folded into the batched DEEP-FRI combination, so
  a p of degree > M-2 pushes the combined codeword past the FRI bound.
- The public prefix of z is bound without revealing the rest: the DEEP batch
  gains one quotient column ``(z^(X) - x_j)/(X - w_s^j)`` per public input
  (the points lie in H_s, which is disjoint from the FRI evaluation coset,
  so the quotients are well-defined everywhere they are queried).
- **ZK**: A~/B~/C~/Q~/z^ carry the kind-7 Marlin-style vanishing masks; the
  sumcheck itself is masked Aurora-style by a committed random polynomial mu
  with sum_{H_s} mu = 0 (coefficients at X^{tM} cancel by construction), so
  the sumcheck target stays publicly zero and h/p become uniformly
  distributed conditioned on the checked identity.

Everything is bound by ONE batched FRI proof — same engine, same wire
conventions as kinds 7/8 (``proof/fri.py``). See docs/security_analysis.md
for the composed soundness statement.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..commit import lwe
from ..core import field
from ..core.errors import DomainError, SerializationError
from ..ops import goldilocks_np as glnp
from ..r1cs import poly as polyops
from ..r1cs.domain import ROOTS
from ..r1cs.r1cs import R1CS
from ..transcript.challenge import Challenge, derive_dual
from ..utils.chacha import ChaCha20Rng
from .fri import (
    FriParams,
    FriProof,
    FriTranscript,
    _gl_inverse_array,
    _gl_pow_array,
    _gl_powers,
    batch_inverse,
    commit_codeword_group,
    coset_offset,
    coset_points,
    fri_prove,
    fri_supported,
    fri_verify,
    lde,
    max_codeword_size,
    root_of_order,
)
from .succinct import (
    _MAGIC,
    WIRE_VERSION,
    statement_binding_words,
    _check_wire_version,
    _gl_add_padded,
    _gl_conv,
    _gl_poly_eval,
    _gl_quotient_and_interpolations,
    _gl_trim,
    _gl_zh_mul,
    _gl_frontend_applicable,
    _MASK_LEN_CAP,
    _next_pow2,
    _roots_to_words,
)

KIND_R1CS_WITNESS = 9


# --- instance geometry --------------------------------------------------------


def _witness_geometry(
    r1cs: R1CS, params: FriParams, mask_len: int
) -> Tuple[int, int, int, int, int]:
    """Validate the instance; return (M, omega_s, d_bound, n0, omega_n).

    M is the sumcheck-domain size, omega_s its generator, d_bound the shared
    FRI degree bound, n0 the codeword size, omega_n the coset generator.
    """
    q = r1cs.modulus
    if not fri_supported(q):
        raise DomainError(
            f"witness-bound openings need an NTT field (modulus {q} has no "
            "registered 2-adic subgroup)"
        )
    if r1cs.domain.kind != ROOTS:
        raise DomainError(
            "witness-bound openings require a roots interpolation domain "
            f"(got {r1cs.domain.kind})"
        )
    m = r1cs.m
    if m < 2 or m & (m - 1):
        raise DomainError(
            f"witness-bound openings require a power-of-two constraint count "
            f"(got m={m})"
        )
    M = max(m, _next_pow2(r1cs.n))
    if M > max_codeword_size(q):
        raise DomainError(
            f"sumcheck domain {M} exceeds the 2-adic limit of modulus {q}"
        )
    omega_s = root_of_order(q, M)
    if pow(omega_s, M // m, q) != r1cs.domain.omega % q:
        raise DomainError(
            "R1CS domain generator is not on the field's 2-adic root ladder"
        )
    # committed lengths: A~/B~/C~ = m+mask, Q~ <= m+2*mask, z^ = M+mask,
    # h <= M+mask-1, p = M-1, mu = 2M+mask-1, F <= 2M+mask-1
    d_bound = _next_pow2(max(2 * M + mask_len - 1, m + 2 * mask_len, M + 1))
    n0 = d_bound << params.log_blowup
    if n0 > max_codeword_size(q):
        raise DomainError(
            f"codeword size {n0} exceeds the 2-adic limit "
            f"{max_codeword_size(q)} of modulus {q}; lower log_blowup or "
            "the circuit size"
        )
    return M, omega_s, d_bound, n0, root_of_order(q, n0)


def _row_weights(r1cs: R1CS, r: int, etas: Tuple[int, int, int]):
    """(u, r_pows): u = eta_A (r^T A) + eta_B (r^T B) + eta_C (r^T C)
    (length n) plus the length-m r-power ladder it used (the verifier
    feeds the same ladder to the R_s Lagrange sum — one O(m) pass).

    Goldilocks path is vectorized straight off the CSR arrays: terms
    scatter-add into split 32-bit-half accumulators (no uint64 overflow:
    each half-term < 2^32 and per-column counts are far below 2^32),
    canonicalized per column at the end — exact mod arithmetic, equal to
    the generic coo loop (pinned by the kind-9 suite on both fields).
    """
    q = r1cs.modulus
    if q == glnp.GOLDILOCKS:
        r_pows_np = _gl_powers(r % q, r1cs.m)
        acc_lo = np.zeros(r1cs.n, dtype=np.uint64)
        acc_hi = np.zeros(r1cs.n, dtype=np.uint64)
        mask32 = np.uint64(0xFFFFFFFF)
        for mat, eta in zip((r1cs.a, r1cs.b, r1cs.c), etas):
            counts = np.diff(np.asarray(mat.row_ptr, dtype=np.int64))
            rows = np.repeat(np.arange(r1cs.m, dtype=np.int64), counts)
            cols = np.asarray(mat.col_indices, dtype=np.int64)
            vals = np.array([v % q for v in mat.values], dtype=np.uint64)
            terms = glnp.gl_mul(
                glnp.gl_mul(np.uint64(eta % q), r_pows_np[rows]), vals
            )
            np.add.at(acc_lo, cols, terms & mask32)
            np.add.at(acc_hi, cols, terms >> np.uint64(32))
        # acc halves are < 2^34 (far below p): valid residues; recombine
        # vectorized as lo + hi * 2^32 mod p
        u_np = glnp.gl_add(
            acc_lo, glnp.gl_mul(acc_hi, np.uint64((1 << 32) % q))
        )
        return u_np, r_pows_np
    r_pows = [1] * r1cs.m
    for i in range(1, r1cs.m):
        r_pows[i] = r_pows[i - 1] * r % q
    u = [0] * r1cs.n
    for mat, eta in zip((r1cs.a, r1cs.b, r1cs.c), etas):
        for i, j, v in mat.coo():
            u[j] = (u[j] + eta * r_pows[i] % q * v) % q
    return u, r_pows


def _lagrange_sum(
    weights: Sequence[int],
    positions: Sequence[int],
    gamma: int,
    omega_s: int,
    M: int,
    q: int,
) -> int:
    """sum_k w_k L_{positions[k]}(gamma) for the size-M subgroup <omega_s>:
    L_k(gamma) = (omega_s^k / M) * Z(gamma) / (gamma - omega_s^k)."""
    z_g = (pow(gamma, M, q) - 1) % q
    if z_g == 0:
        raise DomainError("sumcheck point fell on the domain")
    if q == glnp.GOLDILOCKS:
        w = np.array([x % q for x in weights], dtype=np.uint64)
        pts = _gl_pow_vec_int(omega_s, positions)
        dens = glnp.gl_sub(np.uint64(gamma % q), pts)
        inv = _gl_inverse_array(dens)
        terms = glnp.gl_mul(glnp.gl_mul(w, pts), inv)
        # pairwise tree reduction (a scalar Python sum over m terms was
        # the verifier's largest single cost at m=2^12)
        while len(terms) > 1:
            if len(terms) & 1:
                terms = np.concatenate(
                    [terms, np.zeros(1, dtype=np.uint64)]
                )
            terms = glnp.gl_add(terms[0::2], terms[1::2])
        acc = int(terms[0])
        scale = z_g * field.mod_inverse(M % q, q) % q
        return acc * scale % q
    pts = [pow(omega_s, k, q) for k in positions]
    inv = batch_inverse([(gamma - pt) % q for pt in pts], q)
    acc = 0
    for w, pt, iv in zip(weights, pts, inv):
        acc = (acc + w % q * pt % q * iv) % q
    return acc * z_g % q * field.mod_inverse(M % q, q) % q


def _lagrange_sum_geometric(
    weights_np: np.ndarray,
    base: int,
    gamma: int,
    omega_s: int,
    M: int,
    q: int,
) -> int:
    """Goldilocks ``_lagrange_sum`` for GEOMETRIC position sets: weights[k]
    sits at point base^k (the verifier's two sums are both of this shape —
    R_s at stride-embedded rows, U_s at consecutive columns), so the point
    table is one doubling ladder instead of a per-exponent power ladder."""
    z_g = (pow(gamma, M, q) - 1) % q
    if z_g == 0:
        raise DomainError("sumcheck point fell on the domain")
    pts = _gl_powers(base % q, len(weights_np))
    inv = _gl_inverse_array(glnp.gl_sub(np.uint64(gamma % q), pts))
    terms = glnp.gl_mul(glnp.gl_mul(weights_np, pts), inv)
    while len(terms) > 1:
        if len(terms) & 1:
            terms = np.concatenate([terms, np.zeros(1, dtype=np.uint64)])
        terms = glnp.gl_add(terms[0::2], terms[1::2])
    return int(terms[0]) * z_g % q * field.mod_inverse(M % q, q) % q


def _gl_pow_vec_int(base: int, exps: Sequence[int]) -> np.ndarray:
    """[base^e for e in exps] mod Goldilocks."""
    e = np.asarray(list(exps), dtype=np.uint64)
    out = np.ones(len(e), dtype=np.uint64)
    b = base % glnp.GOLDILOCKS
    maxbits = int(e.max()).bit_length() if len(e) else 0
    for _ in range(maxbits):
        sel = (e & np.uint64(1)).astype(bool)
        if sel.any():
            out[sel] = glnp.gl_mul(out[sel], np.uint64(b))
        b = b * b % glnp.GOLDILOCKS
        e >>= np.uint64(1)
    return out


def _fold_by_vanishing(f: Sequence[int], M: int, q: int):
    """Euclid by Z = X^M - 1 via coefficient folding:
    ``f = Z*h + g`` with ``g_j = sum_t f[j+tM]`` and ``h_k = sum_{t>=1}
    f[k+tM]`` (X^i = X^{i mod M} + Z * sum_{t=1..i//M} X^{i-tM}).
    Returns (h, g) with len(g) = M."""
    if q == glnp.GOLDILOCKS:
        fa = np.asarray(f, dtype=np.uint64)
        n = len(fa)
        n_pad = ((n + M - 1) // M) * M
        padded = np.zeros(n_pad, dtype=np.uint64)
        padded[:n] = fa
        blocks = padded.reshape(-1, M)
        g = np.zeros(M, dtype=np.uint64)
        for b in blocks:
            g = glnp.gl_add(g, b)
        h = np.zeros(max(n - M, 1), dtype=np.uint64)
        # h_k = sum over blocks t>=1 of padded[k + tM]
        for t in range(1, blocks.shape[0]):
            seg = blocks[t]
            # block t covers h positions [ (t-1)M - ??? ] -- recompute directly:
            # X^{k+tM} contributes to h at k, k+M, ..., k+(t-1)M
            for s in range(t):
                lo = s * M
                hi = min(lo + M, len(h))
                if lo >= len(h):
                    break
                h[lo:hi] = glnp.gl_add(h[lo:hi], seg[: hi - lo])
        return h, g
    n = len(f)
    g = [0] * M
    h = [0] * max(n - M, 1)
    for i, c in enumerate(f):
        c = c % q
        g[i % M] = (g[i % M] + c) % q
        t = i - M
        while t >= 0:
            h[t] = (h[t] + c) % q
            t -= M
    return h, g


# --- proof container ----------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WitnessProofR1CS:
    """Succinct R1CS proof with committed-witness binding (wire kind 9).

    ``pre_root`` commits the pre-challenge oracles in ONE interleaved tree
    (A~, B~, C~, Q~, z^[, mu]); ``sum_root`` the post-(r, eta, tau)
    sumcheck pair (h, p). ``mask_len > 0`` marks the ZK variant (and the
    presence of the mu oracle).
    """

    commitment_q: lwe.Commitment
    pre_root: bytes
    sum_root: bytes
    challenge_alpha: Challenge
    challenge_beta: Challenge
    evals_ab: Tuple[int, ...]  # (A~,B~,C~,Q~)@alpha then @beta — 8 values
    evals_gamma: Tuple[int, ...]  # (A~,B~,C~,z^,h,p[,mu])@gamma
    fri: FriProof
    m: int
    n_vars: int
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

    @property
    def zk(self) -> bool:
        return self.mask_len > 0

    @property
    def n_pre(self) -> int:
        """Oracle count of the pre-challenge group (A~,B~,C~,Q~,z^[,mu])."""
        return 6 if self.zk else 5

    def input_groups(self):
        """``fri_verify`` group spec: (root, size) per interleaved tree."""
        return [(self.pre_root, self.n_pre), (self.sum_root, 2)]

    def to_bytes(self) -> bytes:
        out = _MAGIC + bytes([KIND_R1CS_WITNESS, WIRE_VERSION])
        out += struct.pack(
            "<QQQIBHH",
            self.modulus,
            self.m,
            self.n_vars,
            self.mask_len,
            self.log_blowup,
            self.num_queries,
            self.final_len,
        )
        words = self.commitment_q.as_words()
        out += struct.pack("<Q", len(words))
        out += b"".join(struct.pack("<Q", int(w)) for w in words)
        out += self.pre_root + self.sum_root
        out += self.challenge_alpha.to_bytes() + self.challenge_beta.to_bytes()
        out += struct.pack("<8Q", *self.evals_ab)
        out += bytes([len(self.evals_gamma)])
        out += b"".join(struct.pack("<Q", v) for v in self.evals_gamma)
        out += self.fri.to_bytes()
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "WitnessProofR1CS":
        if len(data) < 9 or data[:8] != _MAGIC or data[8] != KIND_R1CS_WITNESS:
            raise SerializationError("bad witness-proof header")
        off = _check_wire_version(data, 9)
        if off + 33 > len(data):
            raise SerializationError("truncated witness proof header")
        (modulus, m, n_vars, mask_len, log_blowup, num_queries, final_len) = (
            struct.unpack_from("<QQQIBHH", data, off)
        )
        off += 33
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
        if off + 64 > len(data):
            raise SerializationError("truncated roots")
        pre_root = data[off : off + 32]
        sum_root = data[off + 32 : off + 64]
        off += 64
        if off + 80 > len(data):
            raise SerializationError("truncated challenges")
        ch_a = Challenge.from_bytes(data[off : off + 40])
        ch_b = Challenge.from_bytes(data[off + 40 : off + 80])
        off += 80
        if off + 64 > len(data):
            raise SerializationError("truncated evaluations")
        evals_ab = struct.unpack_from("<8Q", data, off)
        off += 64
        if off + 1 > len(data):
            raise SerializationError("truncated gamma eval count")
        n_g = data[off]
        off += 1
        if n_g not in (6, 7):
            raise SerializationError(f"bad gamma eval count {n_g}")
        if off + 8 * n_g > len(data):
            raise SerializationError("truncated gamma evals")
        evals_gamma = struct.unpack_from(f"<{n_g}Q", data, off)
        off += 8 * n_g
        fri_proof, off = FriProof.read(data, off)
        return WitnessProofR1CS(
            commitment_q=lwe.Commitment(np.array(words, dtype=np.uint64)),
            pre_root=pre_root,
            sum_root=sum_root,
            challenge_alpha=ch_a,
            challenge_beta=ch_b,
            evals_ab=tuple(evals_ab),
            evals_gamma=tuple(evals_gamma),
            fri=fri_proof,
            m=m,
            n_vars=n_vars,
            mask_len=mask_len,
            log_blowup=log_blowup,
            num_queries=num_queries,
            final_len=final_len,
            modulus=modulus,
        )


# --- transcript ---------------------------------------------------------------


def _seed_witness_transcript(
    q: int,
    m: int,
    n_vars: int,
    big_m: int,
    mask_len: int,
    params: FriParams,
    d_bound: int,
    input_roots: Sequence[bytes],
    alpha: int,
    beta: int,
    evals_ab: Sequence[int],
) -> FriTranscript:
    tr = FriTranscript()
    tr.absorb_words(
        b"witness-params",
        [
            KIND_R1CS_WITNESS, q, m, n_vars, big_m, mask_len,
            params.log_blowup, params.num_queries, params.final_len, d_bound,
        ],
    )
    for root in input_roots:
        tr.absorb(b"input-root", root)
    tr.absorb_words(b"points", [alpha, beta])
    tr.absorb_words(b"evals", list(evals_ab))
    return tr


def _deep_terms(
    zk: bool,
    alpha: int,
    beta: int,
    gamma: int,
    evals_ab: Sequence[int],
    evals_gamma: Sequence[int],
    pub_points: Sequence[int],
    pub_values: Sequence[int],
) -> List[Tuple[int, int, int]]:
    """The ordered DEEP quotient columns: (oracle index, point, claimed value).

    Oracle order: A~=0, B~=1, C~=2, Q~=3, z^=4[, mu=5], h, p (h/p last).
    The prover and verifier must build this identically; the shifted
    degree-bound column on p is appended separately with weight
    lambda^len(terms).
    """
    z_i = 4
    mu_i = 5 if zk else None
    h_i = 6 if zk else 5
    p_i = h_i + 1
    terms = [
        (0, alpha, evals_ab[0]),
        (1, alpha, evals_ab[1]),
        (2, alpha, evals_ab[2]),
        (3, alpha, evals_ab[3]),
        (0, beta, evals_ab[4]),
        (1, beta, evals_ab[5]),
        (2, beta, evals_ab[6]),
        (3, beta, evals_ab[7]),
        (0, gamma, evals_gamma[0]),
        (1, gamma, evals_gamma[1]),
        (2, gamma, evals_gamma[2]),
        (z_i, gamma, evals_gamma[3]),
        (h_i, gamma, evals_gamma[4]),
        (p_i, gamma, evals_gamma[5]),
    ]
    if zk:
        terms.append((mu_i, gamma, evals_gamma[6]))
    for pt, v in zip(pub_points, pub_values):
        terms.append((z_i, pt, v))
    return terms


# --- prover -------------------------------------------------------------------


def prove_r1cs_witness(
    r1cs: R1CS,
    witness: Sequence[int],
    ctx: lwe.LweContext,
    seed: int,
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seed: Optional[int] = None,
    device_lde: bool = False,
) -> WitnessProofR1CS:
    """Prove R1CS satisfaction with the witness bound to a hidden commitment.

    The full SNARK statement: "I know z with public prefix x such that
    (Az) o (Bz) = Cz" — witness substitution is rejected by the lincheck
    (tested), and z is never revealed (``zk=True`` additionally makes the
    revealed codeword values simulatable).
    """
    params = fri_params or FriParams()
    params.validate()
    q = r1cs.modulus
    m = r1cs.m
    mask_len = (2 * params.num_queries + 8) if zk else 0
    big_m, omega_s, d_bound, n0, omega_n = _witness_geometry(
        r1cs, params, mask_len
    )
    z = [int(v) % q for v in witness]
    gl_fast = _gl_frontend_applicable(r1cs)

    if gl_fast:
        q_coeffs, a_poly, b_poly, c_poly = _gl_quotient_and_interpolations(
            r1cs, witness
        )
    else:
        q_coeffs = r1cs.compute_quotient_poly(witness)
        a_poly, b_poly, c_poly = r1cs.interpolations(witness)

    # z^ = LDE of z (padded to M) over H_s
    if gl_fast:
        z_pad = np.zeros(big_m, dtype=np.uint64)
        z_pad[: len(z)] = np.array(z, dtype=np.uint64)
        z_poly = glnp.goldilocks_ntt(big_m).inverse(z_pad)
    else:
        z_pad = z + [0] * (big_m - len(z))
        z_poly = polyops.ntt_inverse(z_pad, q, omega_s)

    rng = None
    if zk:
        if blinding_seed is not None:
            rng = ChaCha20Rng.from_u64(blinding_seed)
        else:
            import secrets

            rng = ChaCha20Rng(secrets.token_bytes(32))
        masks = [[rng.next_u64() % q for _ in range(mask_len)] for _ in range(4)]
        rho_a, rho_b, rho_c, rho_z = masks
        mu_len = 2 * big_m + mask_len - 1
        mu = [rng.next_u64() % q for _ in range(mu_len)]
        # sum over H_s of mu is M * sum_t mu[tM]; cancel it exactly
        acc = 0
        t = big_m
        while t < mu_len:
            acc = (acc + mu[t]) % q
            t += big_m
        mu[0] = (q - acc) % q
        if gl_fast:
            rho_a_v = np.array(rho_a, dtype=np.uint64)
            rho_b_v = np.array(rho_b, dtype=np.uint64)
            rho_c_v = np.array(rho_c, dtype=np.uint64)
            rho_z_v = np.array(rho_z, dtype=np.uint64)
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
            z_t = _gl_add_padded(z_poly, _gl_zh_mul(rho_z_v, big_m))
            mu_poly = np.array(mu, dtype=np.uint64)
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
                q_t,
                polyops.poly_mul(z_h, polyops.poly_mul(rho_a, rho_b, q), q),
                q,
            )
            q_t = polyops.poly_sub(q_t, rho_c, q)
            z_hs = [q - 1] + [0] * (big_m - 1) + [1]  # X^M - 1
            z_t = polyops.poly_add(z_poly, polyops.poly_mul(z_hs, rho_z, q), q)
            mu_poly = mu
    else:
        a_t, b_t, c_t, q_t = a_poly, b_poly, c_poly, q_coeffs
        z_t = z_poly
        mu_poly = None

    return _prove_from_parts(
        r1cs, z, a_t, b_t, c_t, q_t, z_t, mu_poly, q_coeffs, ctx, seed,
        params, mask_len, big_m, omega_s, d_bound, n0, omega_n, gl_fast,
        device_lde=device_lde,
    )


def _prove_from_parts(
    r1cs: R1CS,
    z: Sequence[int],
    a_t,
    b_t,
    c_t,
    q_t,
    z_t,
    mu_poly,
    q_coeffs,
    ctx: lwe.LweContext,
    seed: int,
    params: FriParams,
    mask_len: int,
    big_m: int,
    omega_s: int,
    d_bound: int,
    n0: int,
    omega_n: int,
    gl_fast: bool,
    public_override: Optional[Sequence[int]] = None,
    device_lde: bool = False,
    _allow_bad_sum: bool = False,
) -> WitnessProofR1CS:
    """Shared prover tail (split out so tests can feed forged polynomials
    through the honest transcript and confirm the verifier rejects them;
    ``_allow_bad_sum`` lets those tests commit a sumcheck with a nonzero
    remainder exactly as a cheating prover would)."""
    q = r1cs.modulus
    m = r1cs.m
    zk = mask_len > 0
    offset = coset_offset(q)

    pre_polys = [a_t, b_t, c_t, q_t, z_t] + ([mu_poly] if zk else [])
    use_device = device_lde and q == glnp.GOLDILOCKS
    pre_planes = None
    if use_device:
        from .fri import lde_batch_device_planes

        pre_planes, pre_cw = lde_batch_device_planes(
            pre_polys, n0, offset, q, pull_values=True
        )
        pre_cw = list(pre_cw)
    else:
        pre_cw = [lde(p, n0, offset, omega_n, q) for p in pre_polys]
    pre_tree = commit_codeword_group(pre_cw)
    pre_root = pre_tree.root

    commitment_q, _op = lwe.commit(ctx, q_coeffs, seed)
    comm_words = np.concatenate(
        [
            statement_binding_words(commitment_q, r1cs),
            np.array(_roots_to_words([pre_root]), dtype=np.uint64),
        ]
    )
    public_inputs = (
        list(public_override)
        if public_override is not None
        else [z[j] for j in range(r1cs.l)]
    )
    ch_alpha, ch_beta = derive_dual(public_inputs, comm_words, q)
    alpha, beta = ch_alpha.alpha, ch_beta.alpha

    ab_polys = [a_t, b_t, c_t, q_t]
    if gl_fast:
        evals_ab = [_gl_poly_eval(p, alpha) for p in ab_polys] + [
            _gl_poly_eval(p, beta) for p in ab_polys
        ]
    else:
        evals_ab = [polyops.poly_eval(p, alpha, q) for p in ab_polys] + [
            polyops.poly_eval(p, beta, q) for p in ab_polys
        ]

    tr = _seed_witness_transcript(
        q, m, r1cs.n, big_m, mask_len, params, d_bound, [pre_root],
        alpha, beta, evals_ab,
    )
    r = tr.challenge_field(q, b"lincheck-r")
    etas = (
        tr.challenge_field(q, b"lincheck-eta"),
        tr.challenge_field(q, b"lincheck-eta"),
        tr.challenge_field(q, b"lincheck-eta"),
    )
    tau = tr.challenge_field(q, b"sumcheck-tau")

    # F = R_s * (eta.A~ + eta.B~ + eta.C~) - U_s * z^ + tau*mu
    u, _r_pows = _row_weights(r1cs, r, etas)
    stride = big_m // m
    if gl_fast:
        rho = np.zeros(big_m, dtype=np.uint64)
        rho[::stride] = _gl_powers(r, m)
        r_s = glnp.goldilocks_ntt(big_m).inverse(rho)
        u_pad = np.zeros(big_m, dtype=np.uint64)
        u_pad[: len(u)] = np.array(u, dtype=np.uint64)
        u_s = glnp.goldilocks_ntt(big_m).inverse(u_pad)
        combo = _gl_add_padded(
            glnp.gl_mul(np.asarray(a_t, dtype=np.uint64), np.uint64(etas[0])),
            glnp.gl_mul(np.asarray(b_t, dtype=np.uint64), np.uint64(etas[1])),
            glnp.gl_mul(np.asarray(c_t, dtype=np.uint64), np.uint64(etas[2])),
        )
        f_poly = _gl_add_padded(
            _gl_conv(r_s, combo),
            glnp.gl_neg(_gl_conv(u_s, np.asarray(z_t, dtype=np.uint64))),
            *(
                [glnp.gl_mul(np.asarray(mu_poly, dtype=np.uint64), np.uint64(tau))]
                if zk
                else []
            ),
        )
        h_poly, g_rem = _fold_by_vanishing(f_poly, big_m, q)
        if int(g_rem[0]) != 0 and not _allow_bad_sum:
            raise DomainError("sumcheck remainder nonzero (witness bug)")
        p_poly = np.array(g_rem[1:], dtype=np.uint64)
        h_poly = _gl_trim(np.asarray(h_poly, dtype=np.uint64))
        if len(p_poly) == 0:
            p_poly = np.zeros(1, dtype=np.uint64)
    else:
        rho = [0] * big_m
        acc = 1
        for k in range(m):
            rho[k * stride] = acc
            acc = acc * r % q
        r_s = polyops.ntt_inverse(rho, q, omega_s)
        u_pad = [x % q for x in u] + [0] * (big_m - len(u))
        u_s = polyops.ntt_inverse(u_pad, q, omega_s)
        combo = polyops.poly_add(
            polyops.poly_add(
                [x * etas[0] % q for x in a_t], [x * etas[1] % q for x in b_t], q
            ),
            [x * etas[2] % q for x in c_t],
            q,
        )
        f_poly = polyops.poly_sub(
            polyops.poly_mul(r_s, combo, q), polyops.poly_mul(u_s, list(z_t), q), q
        )
        if zk:
            f_poly = polyops.poly_add(
                f_poly, [x * tau % q for x in mu_poly], q
            )
        h_poly, g_rem = _fold_by_vanishing(f_poly, big_m, q)
        if g_rem[0] % q != 0 and not _allow_bad_sum:
            raise DomainError("sumcheck remainder nonzero (witness bug)")
        p_poly = g_rem[1:] or [0]

    sum_planes = None
    if use_device:
        from .fri import lde_batch_device_planes

        sum_planes, sum_cw = lde_batch_device_planes(
            [h_poly, p_poly], n0, offset, q, pull_values=True
        )
        sum_cw = list(sum_cw)
    else:
        sum_cw = [
            lde(h_poly, n0, offset, omega_n, q),
            lde(p_poly, n0, offset, omega_n, q),
        ]
    sum_tree = commit_codeword_group(sum_cw)
    tr.absorb(b"sum-root", sum_tree.root)
    gamma = tr.challenge_field(q, b"sumcheck-gamma")
    if pow(gamma, big_m, q) == 1:  # pragma: no cover - 2^-45..2^-64 event
        raise DomainError("sumcheck challenge fell on the domain")

    g_polys = [a_t, b_t, c_t, z_t, h_poly, p_poly] + ([mu_poly] if zk else [])
    if gl_fast:
        evals_gamma = [_gl_poly_eval(np.asarray(p, dtype=np.uint64), gamma) for p in g_polys]
    else:
        evals_gamma = [polyops.poly_eval(list(p), gamma, q) for p in g_polys]
    tr.absorb_words(b"gamma-evals", evals_gamma)
    lam = tr.challenge_field(q, b"fri-lambda")

    pub_points = [pow(omega_s, j, q) for j in range(len(public_inputs))]
    terms = _deep_terms(
        zk, alpha, beta, gamma, evals_ab, evals_gamma, pub_points,
        [v % q for v in public_inputs],
    )
    sh_p = d_bound - (big_m - 1)
    codewords = pre_cw + sum_cw  # flattened oracle order: pre then h, p

    # combined DEEP quotient + the shifted degree-bound column on p
    p_cw_idx = len(codewords) - 1
    import jax as _jax

    if (
        use_device
        and pre_planes is not None
        and sum_planes is not None
        and _jax.default_backend() == "tpu"
    ):
        # device G build: the host inverse/mul passes were the kind-9
        # prover's bottleneck. TPU-only like the other in-graph Fermat
        # chains — the fori_loop inverse ladder's XLA:CPU compile is
        # pathological (minutes even at tiny shapes; CLAUDE.md) — and
        # validated there by the bench's prove+verify round trip (the
        # math is the same exact digit arithmetic as the host build)
        import jax.numpy as jnp

        from . import fri_device
        from ..ops.limb import from_limbs_u64

        distinct_pts = []
        for _k, pt, _v in terms:
            if pt not in distinct_pts:
                distinct_pts.append(pt)
        pt_index = {pt: i for i, pt in enumerate(distinct_pts)}
        weights = []
        lam_pow = 1
        for _ in terms:
            weights.append(lam_pow)
            lam_pow = lam_pow * lam % q
        g_planes = fri_device.deep_combine_terms_device(
            jnp.concatenate([pre_planes, sum_planes], axis=1),
            np.array(distinct_pts, dtype=np.uint64),
            tuple(k for k, _pt, _v in terms),
            tuple(pt_index[pt] for _k, pt, _v in terms),
            np.array(weights, dtype=np.uint64),
            np.array([v % q for _k, _pt, v in terms], dtype=np.uint64),
            offset, omega_n, p_cw_idx, sh_p, lam_pow,
        )
        g = from_limbs_u64(np.asarray(g_planes))
    elif q == glnp.GOLDILOCKS:
        xs_np = glnp.gl_mul(np.uint64(offset), _gl_powers(omega_n, n0))
        inv_cache = {}
        g = np.zeros(n0, dtype=np.uint64)
        lam_pow = 1
        for k, pt, v in terms:
            if pt not in inv_cache:
                inv_cache[pt] = _gl_inverse_array(
                    glnp.gl_sub(xs_np, np.uint64(pt % q))
                )
            cw = np.asarray(codewords[k], dtype=np.uint64)
            g = glnp.gl_add(
                g,
                glnp.gl_mul(
                    glnp.gl_mul(np.uint64(lam_pow), glnp.gl_sub(cw, np.uint64(v % q))),
                    inv_cache[pt],
                ),
            )
            lam_pow = lam_pow * lam % q
        shift = _gl_pow_array(xs_np, sh_p)
        g = glnp.gl_add(
            g,
            glnp.gl_mul(
                glnp.gl_mul(np.uint64(lam_pow), np.asarray(codewords[p_cw_idx], dtype=np.uint64)),
                shift,
            ),
        )
    else:
        xs = coset_points(offset, omega_n, n0, q)
        inv_cache = {}
        g = [0] * n0
        lam_pow = 1
        for k, pt, v in terms:
            if pt not in inv_cache:
                inv_cache[pt] = batch_inverse([(x - pt) % q for x in xs], q)
            cw = codewords[k]
            iv = inv_cache[pt]
            for i in range(n0):
                g[i] = (g[i] + lam_pow * ((int(cw[i]) - v) % q) % q * iv[i]) % q
            lam_pow = lam_pow * lam % q
        p_cw = codewords[p_cw_idx]
        for i in range(n0):
            g[i] = (g[i] + lam_pow * pow(xs[i], sh_p, q) % q * int(p_cw[i])) % q

    fri_proof = fri_prove(
        g, [(pre_cw, pre_tree), (sum_cw, sum_tree)], offset, omega_n, q,
        params, tr,
    )
    return WitnessProofR1CS(
        commitment_q=commitment_q,
        pre_root=pre_root,
        sum_root=sum_tree.root,
        challenge_alpha=ch_alpha,
        challenge_beta=ch_beta,
        evals_ab=tuple(int(v) for v in evals_ab),
        evals_gamma=tuple(int(v) for v in evals_gamma),
        fri=fri_proof,
        m=m,
        n_vars=r1cs.n,
        mask_len=mask_len,
        log_blowup=params.log_blowup,
        num_queries=params.num_queries,
        final_len=params.final_len,
        modulus=q,
    )


# --- verifier -----------------------------------------------------------------


def verify_r1cs_witness(
    proof: WitnessProofR1CS,
    public_inputs: Sequence[int],
    r1cs: R1CS,
    min_params: Optional[FriParams] = None,
) -> bool:
    """Verify a witness-bound succinct proof.

    Accepts iff (a) the dual-challenge quotient identity holds at alpha/beta,
    (b) the lincheck sumcheck identity holds at gamma for the
    verifier-computed R_s(gamma)/U_s(gamma), (c) z^'s public prefix equals
    ``public_inputs`` (per-point DEEP quotients), and (d) the batched FRI
    accepts — binding every claimed value to the committed oracles and
    enforcing p's tight degree bound. Verifier cost is O(nnz + m) field ops
    plus the FRI queries.
    """
    q = r1cs.modulus
    if proof.modulus != q or proof.m != r1cs.m or proof.n_vars != r1cs.n:
        return False
    if proof.mask_len > _MASK_LEN_CAP:
        return False
    if len(public_inputs) != r1cs.l:
        return False
    params = proof.fri_params
    try:
        params.validate()
        big_m, omega_s, d_bound, n0, omega_n = _witness_geometry(
            r1cs, params, proof.mask_len
        )
    except DomainError:
        return False
    floor = min_params or FriParams()
    if not params.at_least(floor):
        return False
    zk = proof.zk
    if len(proof.evals_gamma) != (7 if zk else 6):
        return False

    comm_words = np.concatenate(
        [
            statement_binding_words(proof.commitment_q, r1cs),
            np.array(_roots_to_words([proof.pre_root]), dtype=np.uint64),
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

    evals_ab = proof.evals_ab
    if any(v >= q for v in evals_ab) or any(v >= q for v in proof.evals_gamma):
        return False

    # quotient identity (mulcheck on the committed codewords)
    zh_alpha = r1cs.eval_vanishing(alpha)
    zh_beta = r1cs.eval_vanishing(beta)
    if field.mul_mod(evals_ab[3], zh_alpha, q) != field.sub_mod(
        field.mul_mod(evals_ab[0], evals_ab[1], q), evals_ab[2], q
    ):
        return False
    if field.mul_mod(evals_ab[7], zh_beta, q) != field.sub_mod(
        field.mul_mod(evals_ab[4], evals_ab[5], q), evals_ab[6], q
    ):
        return False

    tr = _seed_witness_transcript(
        q, r1cs.m, r1cs.n, big_m, proof.mask_len, params, d_bound,
        [proof.pre_root], alpha, beta, evals_ab,
    )
    r = tr.challenge_field(q, b"lincheck-r")
    etas = (
        tr.challenge_field(q, b"lincheck-eta"),
        tr.challenge_field(q, b"lincheck-eta"),
        tr.challenge_field(q, b"lincheck-eta"),
    )
    tau = tr.challenge_field(q, b"sumcheck-tau")
    tr.absorb(b"sum-root", proof.sum_root)
    gamma = tr.challenge_field(q, b"sumcheck-gamma")
    if pow(gamma, big_m, q) == 1:
        return False
    tr.absorb_words(b"gamma-evals", list(proof.evals_gamma))
    lam = tr.challenge_field(q, b"fri-lambda")

    # lincheck sumcheck identity at gamma
    u, r_pows = _row_weights(r1cs, r, etas)
    stride = big_m // r1cs.m
    try:
        if q == glnp.GOLDILOCKS:
            # both sums have geometric position sets: rows embed at
            # stride s (points (w_s^s)^i), columns sit consecutively
            r_s_g = _lagrange_sum_geometric(
                np.asarray(r_pows, dtype=np.uint64),
                pow(omega_s, stride, q), gamma, omega_s, big_m, q,
            )
            u_s_g = _lagrange_sum_geometric(
                np.asarray(u, dtype=np.uint64), omega_s, gamma, omega_s,
                big_m, q,
            )
        else:
            r_s_g = _lagrange_sum(
                r_pows, [i * stride for i in range(r1cs.m)], gamma,
                omega_s, big_m, q,
            )
            nz = [(j, v) for j, v in enumerate(u) if v]
            u_s_g = (
                _lagrange_sum(
                    [v for _, v in nz], [j for j, _ in nz], gamma, omega_s,
                    big_m, q,
                )
                if nz
                else 0
            )
    except DomainError:
        return False
    eg = proof.evals_gamma
    a_g, b_g, c_g, z_g, h_g, p_g = eg[:6]
    mu_g = eg[6] if zk else 0
    z_hs_g = (pow(gamma, big_m, q) - 1) % q
    lhs = (
        r_s_g * ((etas[0] * a_g + etas[1] * b_g + etas[2] * c_g) % q)
        - u_s_g * z_g
        + tau * mu_g
    ) % q
    rhs = (z_hs_g * h_g + gamma * p_g) % q
    if lhs != rhs:
        return False

    offset = coset_offset(q)
    pub_points = [pow(omega_s, j, q) for j in range(len(public_inputs))]
    terms = _deep_terms(
        zk, alpha, beta, gamma, evals_ab, proof.evals_gamma, pub_points,
        [v % q for v in public_inputs],
    )
    sh_p = d_bound - (big_m - 1)
    n_oracles = proof.n_pre + 2
    p_idx = n_oracles - 1

    # per-term weights and grouped inversion points
    weights = []
    lam_pow = 1
    for _ in terms:
        weights.append(lam_pow)
        lam_pow = lam_pow * lam % q
    w_shift = lam_pow
    distinct_pts = []
    for _, pt, _ in terms:
        if pt not in distinct_pts:
            distinct_pts.append(pt)

    def g_eval(index, half, lo_vals, hi_vals):
        out = []
        for pos, vals in ((index, lo_vals), (index + half, hi_vals)):
            x = offset * pow(omega_n, pos, q) % q
            dens = [(x - pt) % q for pt in distinct_pts]
            invs = dict(zip(distinct_pts, batch_inverse(dens, q)))
            acc = 0
            for w, (k, pt, v) in zip(weights, terms):
                acc = (acc + w * ((vals[k] - v) % q) % q * invs[pt]) % q
            acc = (acc + w_shift * pow(x, sh_p, q) % q * vals[p_idx]) % q
            out.append(acc)
        return out[0], out[1]

    pt_index = {pt: i for i, pt in enumerate(distinct_pts)}

    def g_eval_batch(idx_arr, half, in_lo, in_hi):
        # vectorized Goldilocks form of g_eval over ALL queries at once —
        # identical math, identical DomainError rejection on a zero
        # denominator (fri_verify's native fast path)
        x_lo = glnp.gl_mul(
            np.uint64(offset % q),
            _gl_pow_vec_int(omega_n, [int(i) for i in idx_arr]),
        )
        x_hi = glnp.gl_mul(x_lo, np.uint64(pow(omega_n, half, q)))
        out = []
        for xs, vals in ((x_lo, in_lo), (x_hi, in_hi)):
            dens = np.stack(
                [glnp.gl_sub(xs, np.uint64(pt % q)) for pt in distinct_pts]
            )
            invs = _gl_inverse_array(dens)  # raises DomainError on zero
            acc = np.zeros(len(xs), dtype=np.uint64)
            for w, (k, pt, v) in zip(weights, terms):
                acc = glnp.gl_add(
                    acc,
                    glnp.gl_mul(
                        glnp.gl_mul(
                            np.uint64(w),
                            glnp.gl_sub(vals[:, k], np.uint64(v % q)),
                        ),
                        invs[pt_index[pt]],
                    ),
                )
            acc = glnp.gl_add(
                acc,
                glnp.gl_mul(
                    np.uint64(w_shift),
                    glnp.gl_mul(_gl_pow_array(xs, sh_p), vals[:, p_idx]),
                ),
            )
            out.append(acc)
        return out[0], out[1]

    return fri_verify(
        proof.fri, proof.input_groups(), g_eval, n0, offset, omega_n, q,
        params, tr,
        g_eval_batch=(g_eval_batch if q == glnp.GOLDILOCKS else None),
    )
