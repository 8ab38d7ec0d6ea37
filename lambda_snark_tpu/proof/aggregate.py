"""Aggregated succinct proofs: one shared FRI for a whole statement batch.

``prove_r1cs_succinct_batch`` amortizes *compute* but still emits S
independent proofs, each carrying its own FRI fold layers (the dominant
bytes: ~num_queries authenticated pairs per layer). This module amortizes
the *proof* as well: the S statements' 4S DEEP quotients are folded into ONE
combined low-degree claim under a single Fiat–Shamir challenge, so the fold
layers, the final polynomial and the query index set are shared across the
batch (wire kind 8). Per statement only the lattice commitment, ONE
interleaved input Merkle root, the dual challenges and the eight claimed
evaluations remain — plus one authenticated group opening per shared query
(the statement's four oracles share a single path, wire v3).

Soundness: per-statement binding is unchanged (each statement's alpha/beta
derive from its own commitment + roots exactly as in ``proof/succinct.py``);
the aggregate transcript then absorbs every statement's roots, points and
evaluations before sampling the combination challenge lambda, so a single
cheating statement breaks the combined claim except with the usual batched
soundness loss of ~(8S * degree) / q (Schwartz–Zippel over the lambda
powers) — negligible for the Goldilocks field at any practical S. The FRI
proximity soundness (~num_queries * log_blowup bits) is shared, not split.

ZK composes unchanged: each statement carries its own vanishing masks of
length ``2*num_queries + 8`` and the shared query set opens each statement's
codewords at the same ``<= 2*num_queries`` pair positions (+ its own
alpha/beta), within the per-statement mask budget.

The reference has neither batching nor aggregation (its openings were stubs
— ``lib.rs:788-791``); this is new capability, sized for batch serving.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..commit import lwe
from ..core import field
from ..core.errors import DomainError, InvalidDimensionsError, SerializationError
from ..ops import goldilocks_np as glnp
from ..r1cs.r1cs import R1CS
from ..transcript.challenge import Challenge
from .fri import (
    MAX_AGGREGATE_STATEMENTS,
    FriParams,
    FriProof,
    FriTranscript,
    coset_offset,
    fri_prove,
    fri_verify,
)
from .succinct import (
    _MAGIC,
    _MASK_LEN_CAP,
    WIRE_VERSION,
    _check_instance,
    _check_wire_version,
    _gl_frontend_applicable,
    _roots_to_words,
)
from .succinct_batch import (
    _gl_batch_frontend,
    _gl_inverse_batch,
    _gl_powers,
)

KIND_R1CS_AGGREGATE = 8

__all__ = [
    "AggregatedProofR1CS",
    "StatementOpening",
    "prove_r1cs_succinct_aggregate",
    "verify_r1cs_succinct_aggregate",
]


@dataclasses.dataclass(frozen=True)
class StatementOpening:
    """Per-statement slice of an aggregated proof (mirrors the non-FRI
    fields of ``SuccinctProofR1CS``)."""

    commitment_q: lwe.Commitment
    input_root: bytes  # ONE interleaved Merkle root (A~, B~, C~, Q~)
    challenge_alpha: Challenge
    challenge_beta: Challenge
    evals: Tuple[int, ...]  # (A,B,C,Q at alpha) then (A,B,C,Q at beta)

    def to_bytes(self) -> bytes:
        words = self.commitment_q.as_words()
        out = struct.pack("<Q", len(words))
        out += b"".join(struct.pack("<Q", int(w)) for w in words)
        out += self.input_root
        out += self.challenge_alpha.to_bytes() + self.challenge_beta.to_bytes()
        out += struct.pack("<8Q", *self.evals)
        return out

    @staticmethod
    def read(data: bytes, off: int) -> Tuple["StatementOpening", int]:
        if off + 8 > len(data):
            raise SerializationError("truncated aggregate commitment length")
        (n_words,) = struct.unpack_from("<Q", data, off)
        off += 8
        if n_words > (1 << 24):
            raise SerializationError("unreasonable commitment length")
        if off + 8 * n_words > len(data):
            raise SerializationError("truncated aggregate commitment words")
        words = list(struct.unpack_from(f"<{n_words}Q", data, off)) if n_words else []
        off += 8 * n_words
        if off + 32 > len(data):
            raise SerializationError("truncated aggregate input root")
        input_root = data[off : off + 32]
        off += 32
        if off + 80 > len(data):
            raise SerializationError("truncated aggregate challenges")
        ch_a = Challenge.from_bytes(data[off : off + 40])
        ch_b = Challenge.from_bytes(data[off + 40 : off + 80])
        off += 80
        if off + 64 > len(data):
            raise SerializationError("truncated aggregate evaluations")
        evals = struct.unpack_from("<8Q", data, off)
        off += 64
        return (
            StatementOpening(
                commitment_q=lwe.Commitment(np.array(words, dtype=np.uint64)),
                input_root=input_root,
                challenge_alpha=ch_a,
                challenge_beta=ch_b,
                evals=tuple(evals),
            ),
            off,
        )


@dataclasses.dataclass(frozen=True)
class AggregatedProofR1CS:
    """S succinct statements sharing ONE FRI proof (wire kind 8)."""

    statements: Tuple[StatementOpening, ...]
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

    def to_bytes(self) -> bytes:
        out = _MAGIC + bytes([KIND_R1CS_AGGREGATE, WIRE_VERSION])
        out += struct.pack("<QQIBHH", self.modulus, self.m, self.mask_len,
                           self.log_blowup, self.num_queries, self.final_len)
        out += struct.pack("<H", len(self.statements))
        for st in self.statements:
            out += st.to_bytes()
        out += self.fri.to_bytes()
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "AggregatedProofR1CS":
        if len(data) < 9 or data[:8] != _MAGIC or data[8] != KIND_R1CS_AGGREGATE:
            raise SerializationError("bad aggregated-proof header")
        off = _check_wire_version(data, 9)
        if off + 25 > len(data):
            raise SerializationError("truncated aggregated proof header")
        modulus, m, mask_len, log_blowup, num_queries, final_len = struct.unpack_from(
            "<QQIBHH", data, off
        )
        off += 25
        if off + 2 > len(data):
            raise SerializationError("truncated statement count")
        (n_st,) = struct.unpack_from("<H", data, off)
        off += 2
        if n_st == 0 or n_st > MAX_AGGREGATE_STATEMENTS:
            raise SerializationError("unreasonable statement count")
        statements = []
        for _ in range(n_st):
            st, off = StatementOpening.read(data, off)
            statements.append(st)
        fri_proof, off = FriProof.read(data, off)
        return AggregatedProofR1CS(
            statements=tuple(statements),
            fri=fri_proof,
            m=m,
            mask_len=mask_len,
            log_blowup=log_blowup,
            num_queries=num_queries,
            final_len=final_len,
            modulus=modulus,
        )


# --- shared transcript ----------------------------------------------------------


def _seed_aggregate_transcript(
    q: int,
    m: int,
    mask_len: int,
    params: FriParams,
    d_bound: int,
    statements: Sequence[Tuple[Sequence[bytes], int, int, Sequence[int]]],
) -> FriTranscript:
    """Absorb every statement's (roots, alpha, beta, evals) — the combination
    challenge is sampled only after ALL commitments and claims are fixed."""
    tr = FriTranscript()
    tr.absorb_words(
        b"aggregate-params",
        [q, m, mask_len, params.log_blowup, params.num_queries,
         params.final_len, d_bound, len(statements)],
    )
    for roots, alpha, beta, evals in statements:
        for root in roots:
            tr.absorb(b"input-root", root)
        tr.absorb_words(b"points", [alpha, beta])
        tr.absorb_words(b"evals", list(evals))
    return tr


# --- prover ----------------------------------------------------------------------


def prove_r1cs_succinct_aggregate(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: lwe.LweContext,
    seeds: Sequence[int],
    zk: bool = False,
    fri_params: Optional[FriParams] = None,
    blinding_seeds: Optional[Sequence[int]] = None,
    device_lde: bool = True,
) -> AggregatedProofR1CS:
    """Prove a batch of statements as ONE aggregated succinct proof.

    Same front-end as ``prove_r1cs_succinct_batch`` (batched device LDE,
    batched Merkle hashing, per-statement dual challenges); the 4S DEEP
    quotients then fold into one combined codeword and one shared FRI.
    Goldilocks roots-domain circuits only (the vectorized front-end's
    domain).
    """
    params = fri_params or FriParams()
    params.validate()
    s = len(witnesses)
    if s == 0:
        raise InvalidDimensionsError("aggregate proving needs at least one witness")
    if s > MAX_AGGREGATE_STATEMENTS:
        raise InvalidDimensionsError(
            f"aggregate batch {s} exceeds MAX_AGGREGATE_STATEMENTS "
            f"({MAX_AGGREGATE_STATEMENTS})"
        )
    if len(seeds) != s:
        raise InvalidDimensionsError("need one seed per witness")
    if zk and (blinding_seeds is None or len(blinding_seeds) != s):
        raise InvalidDimensionsError(
            "zk aggregate proving needs one blinding seed per witness"
        )
    if not _gl_frontend_applicable(r1cs):
        raise DomainError(
            "aggregated succinct proving requires a Goldilocks roots-domain "
            "circuit (the batched front-end's field)"
        )

    from . import fri as fri_mod

    fe = _gl_batch_frontend(
        r1cs, witnesses, ctx, seeds, zk, params, blinding_seeds, device_lde,
        device_fri=device_lde and fri_mod.DEVICE_HASH and not zk,
    )
    q, n0, omega_n, offset = fe.q, fe.n0, fe.omega_n, fe.offset

    tr = _seed_aggregate_transcript(
        q, fe.m, fe.mask_len, params, fe.d_bound,
        [
            (fe.roots[i], int(fe.alphas[i]), int(fe.betas[i]),
             [int(v) for v in fe.evals[i]])
            for i in range(s)
        ],
    )
    lam = tr.challenge_field(q, b"fri-lambda")

    if getattr(fe, "forest", None) is not None:
        # device-resident path: ONE cross-statement lambda ladder feeds the
        # batched DEEP combine, statements sum into one codeword, and the
        # shared FRI runs as the single-dispatch device chain over all 4S
        # input oracles (s-major tree order = the `inputs` order below).
        # Bytes identical to the host path (exact mod-p arithmetic; pinned
        # in tests/test_aggregate.py).
        from . import fri_device

        lam_a = np.empty((s, 4), dtype=np.uint64)
        lam_b = np.empty((s, 4), dtype=np.uint64)
        lam_pow = 1
        for i in range(s):
            for k in range(4):
                lam2 = lam_pow * lam % q
                lam_a[i, k] = lam_pow
                lam_b[i, k] = lam2
                lam_pow = lam2 * lam % q
        input_planes = fe.planes_dev.reshape(4, s, 4, n0)
        g_s = fri_device.deep_combine_device(
            input_planes, fe.alphas, fe.betas, np.zeros(s, dtype=np.uint64),
            fe.evals, offset, omega_n, lam_tables=(lam_a, lam_b),
        )
        g_comb = fri_device.sum_statements_device(g_s)  # (4, 1, n0)
        # ONE FRI statement whose 4S oracles live in S per-statement
        # interleaved trees (n_groups = S): one path per statement per query
        input_r = fe.planes_dev.reshape(4, 1, 4 * s, n0)
        fri_proof = fri_device.fri_prove_device(
            g_comb, input_r, fe.forest, offset, omega_n, q, params, [tr],
            n_groups=s,
        )[0]
        return AggregatedProofR1CS(
            statements=tuple(
                StatementOpening(
                    commitment_q=fe.commitments[i],
                    input_root=fe.roots[i][0],
                    challenge_alpha=fe.chals[i][0],
                    challenge_beta=fe.chals[i][1],
                    evals=tuple(int(v) for v in fe.evals[i]),
                )
                for i in range(s)
            ),
            fri=fri_proof,
            m=fe.m,
            mask_len=fe.mask_len,
            log_blowup=params.log_blowup,
            num_queries=params.num_queries,
            final_len=params.final_len,
            modulus=q,
        )

    # combined DEEP quotient over all statements and polynomial kinds
    xs = glnp.gl_mul(np.uint64(offset), _gl_powers(omega_n, n0))
    inv_a = _gl_inverse_batch(glnp.gl_sub(xs[None, :], fe.alphas[:, None]))
    inv_b = _gl_inverse_batch(glnp.gl_sub(xs[None, :], fe.betas[:, None]))
    g = np.zeros(n0, dtype=np.uint64)
    lam_pow = 1
    for i in range(s):
        for k in range(4):
            lam2 = lam_pow * lam % q
            term_a = glnp.gl_mul(
                glnp.gl_mul(
                    np.uint64(lam_pow),
                    glnp.gl_sub(fe.cw[i, k], fe.evals[i, k]),
                ),
                inv_a[i],
            )
            term_b = glnp.gl_mul(
                glnp.gl_mul(
                    np.uint64(lam2),
                    glnp.gl_sub(fe.cw[i, k], fe.evals[i, 4 + k]),
                ),
                inv_b[i],
            )
            g = glnp.gl_add(g, glnp.gl_add(term_a, term_b))
            lam_pow = lam2 * lam % q

    inputs = [
        ([fe.cw[i, k] for k in range(4)], fe.trees[i]) for i in range(s)
    ]
    fri_proof = fri_prove(g, inputs, offset, omega_n, q, params, tr)

    return AggregatedProofR1CS(
        statements=tuple(
            StatementOpening(
                commitment_q=fe.commitments[i],
                input_root=fe.roots[i][0],
                challenge_alpha=fe.chals[i][0],
                challenge_beta=fe.chals[i][1],
                evals=tuple(int(v) for v in fe.evals[i]),
            )
            for i in range(s)
        ),
        fri=fri_proof,
        m=fe.m,
        mask_len=fe.mask_len,
        log_blowup=params.log_blowup,
        num_queries=params.num_queries,
        final_len=params.final_len,
        modulus=q,
    )


# --- verifier ----------------------------------------------------------------------


def verify_r1cs_succinct_aggregate(
    proof: AggregatedProofR1CS,
    public_inputs_list: Sequence[Sequence[int]],
    r1cs: R1CS,
    min_params: Optional[FriParams] = None,
) -> bool:
    """Verify an aggregated succinct proof (one public-input vector per
    statement, in order)."""
    q = r1cs.modulus
    if proof.modulus != q or proof.m != r1cs.m:
        return False
    if proof.mask_len > _MASK_LEN_CAP:
        return False
    s = len(proof.statements)
    if s == 0 or len(public_inputs_list) != s:
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

    # 1. per-statement binding: challenges + quotient identity (unchanged
    #    from the single-statement verifier)
    alphas: List[int] = []
    betas: List[int] = []
    from .succinct import statement_binding_words

    for st, public in zip(proof.statements, public_inputs_list):
        comm_words = list(statement_binding_words(st.commitment_q, r1cs)) + _roots_to_words(
            [st.input_root]
        )
        ch_alpha = Challenge.derive(public, comm_words, q)
        if st.challenge_alpha.alpha != ch_alpha.alpha:
            return False
        alpha = ch_alpha.alpha
        ch_beta = Challenge.derive([alpha], comm_words, q)
        if st.challenge_beta.alpha != ch_beta.alpha:
            return False
        beta = ch_beta.alpha
        evals = st.evals
        if len(evals) != 8 or any(v >= q for v in evals):
            return False
        zh_alpha = r1cs.eval_vanishing(alpha)
        zh_beta = r1cs.eval_vanishing(beta)
        if field.mul_mod(evals[3], zh_alpha, q) != field.sub_mod(
            field.mul_mod(evals[0], evals[1], q), evals[2], q
        ):
            return False
        if field.mul_mod(evals[7], zh_beta, q) != field.sub_mod(
            field.mul_mod(evals[4], evals[5], q), evals[6], q
        ):
            return False
        alphas.append(alpha)
        betas.append(beta)

    # 2. shared FRI over the combined DEEP quotient
    offset = coset_offset(q)
    tr = _seed_aggregate_transcript(
        q, r1cs.m, proof.mask_len, params, d_bound,
        [
            ([st.input_root], alphas[i], betas[i], list(st.evals))
            for i, st in enumerate(proof.statements)
        ],
    )
    lam = tr.challenge_field(q, b"fri-lambda")
    all_evals = [st.evals for st in proof.statements]

    def g_eval(index, half, lo_vals, hi_vals):
        out = []
        for pos, vals in ((index, lo_vals), (index + half, hi_vals)):
            x = offset * pow(omega_n, pos, q) % q
            acc = 0
            lam_pow = 1
            for i in range(s):
                ia = field.mod_inverse((x - alphas[i]) % q, q)
                ib = field.mod_inverse((x - betas[i]) % q, q)
                if ia is None or ib is None:
                    raise DomainError("challenge point on the evaluation domain")
                for k in range(4):
                    fv = vals[4 * i + k]
                    lam2 = lam_pow * lam % q
                    acc = (
                        acc
                        + lam_pow * ((fv - all_evals[i][k]) % q) % q * ia
                        + lam2 * ((fv - all_evals[i][4 + k]) % q) % q * ib
                    ) % q
                    lam_pow = lam2 * lam % q
            out.append(acc)
        return out[0], out[1]

    # the aggregate's combined quotient IS the standard batched-DEEP shape
    # with per-statement points: 4S columns, lambda-ladder weights, each
    # statement's (alpha, beta) repeated over its 4 oracles — so the native
    # batched verifier (path auth + g eval + fold walk) applies directly
    n_cols = 4 * s
    wa = np.empty(n_cols, dtype=np.uint64)
    wb = np.empty(n_cols, dtype=np.uint64)
    ea = np.empty(n_cols, dtype=np.uint64)
    eb = np.empty(n_cols, dtype=np.uint64)
    al = np.empty(n_cols, dtype=np.uint64)
    be = np.empty(n_cols, dtype=np.uint64)
    lam_pow = 1
    for i in range(s):
        for k in range(4):
            col = 4 * i + k
            lam2 = lam_pow * lam % q
            wa[col] = lam_pow
            wb[col] = lam2
            ea[col] = all_evals[i][k] % q
            eb[col] = all_evals[i][4 + k] % q
            al[col] = alphas[i]
            be[col] = betas[i]
            lam_pow = lam2 * lam % q

    input_groups = [(st.input_root, 4) for st in proof.statements]
    return fri_verify(
        proof.fri, input_groups, g_eval, n0, offset, omega_n, q, params, tr,
        deep=(wa, wb, ea, eb, al, be),
    )
