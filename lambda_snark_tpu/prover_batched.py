"""Batched R1CS proving: device heavy stage + host transcripts.

``prove_r1cs_batched`` proves B witnesses against one roots-domain R1CS in a
single device invocation (the "vmap over proof batch" of the north star):

    host:   SpMV per witness  (sparse, tiny — reference ``sparse_matrix.rs``)
    device: interpolation, quotient, Module-LWE commitment  (``pipeline.py``)
    host:   SHA3 Fiat-Shamir transcripts + Horner evaluations + assembly

Commitments here use the device ("threefry") randomness suite keyed from the
per-batch master seed — deterministic given (context_seed, r1cs, witnesses,
seed), like everything else in this framework.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .commit.lwe import Commitment, LweContext
from .commit.lwe_jax import DeviceCommitContext
from .core import field
from .core.errors import DomainError, InvalidWitnessError
from .pipeline import ProvePlan, prove_stage_batch_jit, prove_stage_batch_zk_jit
from .proof.types import EvalOpening, ProofR1CS, ProofR1csZk
from .r1cs.r1cs import R1CS
from .ops.limb import from_limbs, from_limbs_u64, to_limbs
from .transcript.challenge import derive_dual
from .utils.chacha import ChaCha20Rng

_PLAN_CACHE: dict = {}
_DCTX_CACHE: dict = {}


def _prove_plan(r1cs: R1CS, ctx: LweContext) -> ProvePlan:
    key = (r1cs.m, r1cs.modulus, id(ctx))
    if key not in _PLAN_CACHE:
        if id(ctx) not in _DCTX_CACHE:
            _DCTX_CACHE[id(ctx)] = DeviceCommitContext.from_host(ctx)
        _PLAN_CACHE[key] = ProvePlan.create(
            r1cs.m, r1cs.modulus, _DCTX_CACHE[id(ctx)]
        )
    return _PLAN_CACHE[key]


def prove_r1cs_batched(
    r1cs: R1CS,
    witnesses: Sequence[Sequence[int]],
    ctx: LweContext,
    seed: int,
    zk: bool = False,
    blinding_seed: Optional[int] = None,
):
    """Batched proving (plain or ZK). ZK blinds the committed quotient on
    device (Q' = Q + r * Z_H; needs ring degree n >= m + 1) with per-proof
    blinding factors derived from ``blinding_seed`` (defaults to ``seed``).
    Returns List[ProofR1CS] or List[ProofR1csZk].
    """
    if r1cs.domain.kind != "roots":
        raise DomainError(
            "batched device proving requires a roots (NTT) domain; "
            f"got {r1cs.domain.kind} for q={r1cs.modulus}, m={r1cs.m}"
        )
    if r1cs.m > ctx.n or (zk and r1cs.m + 1 > ctx.n):
        raise DomainError(
            f"quotient length (m={r1cs.m}{'+1 for ZK' if zk else ''}) "
            f"exceeds ring degree {ctx.n}"
        )
    q = r1cs.modulus
    b = len(witnesses)
    pp = _prove_plan(r1cs, ctx)
    # sanity: plan domain must equal the R1CS domain (same omega ordering)
    assert field.mul_mod(pp.plan.omega, 1, q) == r1cs.domain.omega % q, (
        "device plan omega != r1cs domain omega"
    )

    # host SpMV -> stacked evals
    evs = [r1cs.compute_constraint_evals(w) for w in witnesses]
    d = pp.plan.ctx.d

    def stack(idx):
        arr = np.array([e[idx] for e in evs], dtype=object)  # (B, m)
        return jnp.asarray(to_limbs(arr, d))

    a_e, b_e, c_e = stack(0), stack(1), stack(2)
    key = jax.random.PRNGKey(seed & 0x7FFFFFFF)
    blinding = None
    if zk:
        rng = ChaCha20Rng.from_u64(
            blinding_seed if blinding_seed is not None else seed
        )
        blinding = [rng.next_u64() % q for _ in range(b)]
        blind_planes = jnp.asarray(
            to_limbs(np.array(blinding, dtype=object), d)
        )
        q_pl, a_pl, b_pl, c_pl, comm_pl, valid = prove_stage_batch_zk_jit(
            pp, a_e, b_e, c_e, blind_planes, key
        )
    else:
        q_pl, a_pl, b_pl, c_pl, comm_pl, valid = prove_stage_batch_jit(
            pp, a_e, b_e, c_e, key
        )
    return _assemble_proofs(
        r1cs, witnesses, (q_pl, a_pl, b_pl, c_pl, comm_pl, valid),
        zk=zk, blinding=blinding,
    )


def prove_r1cs_stream(
    r1cs: R1CS,
    witness_iter,
    ctx: LweContext,
    seed: int,
    batch: int = 16,
    zk: bool = False,
    blinding_seed: Optional[int] = None,
    store=None,
):
    """Streamed batched proving with host/device overlap (double buffering).

    Yields proofs in witness order. JAX dispatch is asynchronous, so while
    the device runs batch k, the host does SpMV + limb packing for batch
    k+1 and transcript hashing / assembly for batch k-1 — the three stages
    of ``prove_r1cs_batched`` pipelined with no extra machinery (the
    materializing ``np.asarray`` in assembly is the only sync point).

    ``store``: optional ``utils.artifacts.ProofStore`` — each finished proof
    is persisted as it is yielded, making the store the resume log for a
    proof service (restart skips statements it already holds).

    Every batch is seeded independently (fold of the master seed and batch
    index), so a resumed stream regenerates identical proofs.
    """
    if r1cs.domain.kind != "roots":
        raise DomainError(
            "batched device proving requires a roots (NTT) domain; "
            f"got {r1cs.domain.kind} for q={r1cs.modulus}, m={r1cs.m}"
        )
    if r1cs.m > ctx.n or (zk and r1cs.m + 1 > ctx.n):
        raise DomainError(
            f"quotient length (m={r1cs.m}{'+1 for ZK' if zk else ''}) "
            f"exceeds ring degree {ctx.n}"
        )
    q = r1cs.modulus
    pp = _prove_plan(r1cs, ctx)
    d = pp.plan.ctx.d

    def batches():
        buf = []
        for w in witness_iter:
            buf.append(w)
            if len(buf) == batch:
                yield buf
                buf = []
        if buf:
            yield buf

    def dispatch(ws, batch_idx):
        """Host SpMV + async device dispatch for one batch."""
        evs = [r1cs.compute_constraint_evals(w) for w in ws]

        def stack(idx):
            arr = np.array([e[idx] for e in evs], dtype=object)
            return jnp.asarray(to_limbs(arr, d))

        a_e, b_e, c_e = stack(0), stack(1), stack(2)
        batch_seed = (seed ^ (0x9E3779B97F4A7C15 * (batch_idx + 1))) & (
            (1 << 63) - 1
        )
        key = jax.random.PRNGKey(batch_seed & 0x7FFFFFFF)
        blinding = None
        if zk:
            rng = ChaCha20Rng.from_u64(
                (blinding_seed if blinding_seed is not None else seed)
                ^ batch_idx
            )
            blinding = [rng.next_u64() % q for _ in range(len(ws))]
            blind_planes = jnp.asarray(
                to_limbs(np.array(blinding, dtype=object), d)
            )
            out = prove_stage_batch_zk_jit(pp, a_e, b_e, c_e, blind_planes, key)
        else:
            out = prove_stage_batch_jit(pp, a_e, b_e, c_e, key)
        return out, blinding

    prev = None  # (witnesses, device_out, blinding, offset)
    offset = 0
    for batch_idx, ws in enumerate(batches()):
        out, blinding = dispatch(ws, batch_idx)  # async: device starts now
        if prev is not None:
            for proof in _emit(r1cs, prev, zk, store, seed):
                yield proof
        prev = (ws, out, blinding, offset)
        offset += len(ws)
    if prev is not None:
        for proof in _emit(r1cs, prev, zk, store, seed):
            yield proof


def _emit(r1cs, staged, zk, store, seed):
    ws, out, blinding, offset = staged
    proofs = _assemble_proofs(
        r1cs, ws, out, zk=zk, blinding=blinding, batch_offset=offset
    )
    for i, (w, proof) in enumerate(zip(ws, proofs)):
        if store is not None:
            store.save(
                r1cs, r1cs.public_inputs(w), seed, proof,
                label=f"stream-{offset + i}",
            )
        yield proof


def _assemble_proofs(r1cs, witnesses, device_out, zk, blinding,
                     batch_offset: int = 0):
    """Host side: pull device results, derive transcripts, build proofs.

    ``batch_offset`` labels error messages for streamed proving.
    """
    q = r1cs.modulus
    q_pl, a_pl, b_pl, c_pl, comm_pl, valid = device_out
    valid = np.asarray(valid)
    if not valid.all():
        bad = [batch_offset + i for i, v in enumerate(valid) if not v]
        raise InvalidWitnessError(f"witnesses {bad} do not satisfy the R1CS")

    q_host = from_limbs(np.asarray(q_pl))  # (B, m) object ints
    a_host = from_limbs(np.asarray(a_pl))
    b_host = from_limbs(np.asarray(b_pl))
    c_host = from_limbs(np.asarray(c_pl))
    comm_words = from_limbs_u64(np.asarray(comm_pl))  # (B, n) uint64

    proofs = []
    for i in range(len(witnesses)):
        commitment = Commitment(comm_words[i])
        words = commitment.as_words()
        public_inputs = r1cs.public_inputs(witnesses[i])
        ch_a, ch_b = derive_dual(public_inputs, words, q)
        alpha, beta = ch_a.alpha, ch_b.alpha
        qc = [int(v) for v in q_host[i]]
        ac = [int(v) for v in a_host[i]]
        bc = [int(v) for v in b_host[i]]
        cc = [int(v) for v in c_host[i]]
        q_alpha = field.horner_eval(qc, alpha, q)
        q_beta = field.horner_eval(qc, beta, q)
        common = dict(
            challenge_alpha=ch_a,
            challenge_beta=ch_b,
            a_z_alpha=field.horner_eval(ac, alpha, q),
            b_z_alpha=field.horner_eval(bc, alpha, q),
            c_z_alpha=field.horner_eval(cc, alpha, q),
            a_z_beta=field.horner_eval(ac, beta, q),
            b_z_beta=field.horner_eval(bc, beta, q),
            c_z_beta=field.horner_eval(cc, beta, q),
            modulus=q,
        )
        if zk:
            r = blinding[i]
            # Q'(x) = Q(x) + r * Z_H(x); the device committed to Q'
            qp_alpha = field.add_mod(
                q_alpha, field.mul_mod(r, r1cs.eval_vanishing(alpha), q), q
            )
            qp_beta = field.add_mod(
                q_beta, field.mul_mod(r, r1cs.eval_vanishing(beta), q), q
            )
            proofs.append(
                ProofR1csZk(
                    commitment_q_prime=commitment,
                    blinding_factor=r,
                    q_prime_alpha=qp_alpha,
                    q_prime_beta=qp_beta,
                    opening_alpha=EvalOpening(evaluation=qp_alpha),
                    opening_beta=EvalOpening(evaluation=qp_beta),
                    **common,
                )
            )
        else:
            proofs.append(
                ProofR1CS(
                    commitment_q=commitment,
                    q_alpha=q_alpha,
                    q_beta=q_beta,
                    opening_alpha=EvalOpening(evaluation=q_alpha),
                    opening_beta=EvalOpening(evaluation=q_beta),
                    **common,
                )
            )
    return proofs
