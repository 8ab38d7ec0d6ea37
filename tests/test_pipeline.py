"""Batched device proving pipeline vs host golden path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    verify_r1cs,
)
from lambda_snark_tpu.commit.lwe import LweContext
from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext, commit_batch_jit, embed_messages
from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.errors import InvalidWitnessError
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
from lambda_snark_tpu.ops.limb import from_limbs, from_limbs_u64, to_limbs
from lambda_snark_tpu.pipeline import ProvePlan, quotient_batch_jit
from lambda_snark_tpu.prover_batched import prove_r1cs_batched

from test_r1cs import multiplication_gates, mult_witness

Q = NTT_FRIENDLY_MODULUS


@pytest.fixture(scope="module")
def ctx():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=64, k=2, q=Q, sigma=3.19)
    )
    return LweContext(params, context_seed=3)


@pytest.fixture(scope="module")
def dctx(ctx):
    return DeviceCommitContext.from_host(ctx)


def test_device_quotient_matches_host(dctx):
    m = 8
    r1cs = multiplication_gates(m, Q)
    assert r1cs.domain.kind == "roots"
    witnesses = [mult_witness(m, Q, seed=s) for s in range(3)]
    pp = ProvePlan.create(m, Q, dctx)
    evs = [r1cs.compute_constraint_evals(w) for w in witnesses]
    d = pp.plan.ctx.d
    stack = lambda idx: jnp.asarray(
        to_limbs(np.array([e[idx] for e in evs], dtype=object), d)
    )
    q_pl, a_pl, b_pl, c_pl, valid = quotient_batch_jit(
        pp, stack(0), stack(1), stack(2)
    )
    assert np.asarray(valid).all()
    for i, w in enumerate(witnesses):
        want_q = r1cs.compute_quotient_poly(w)
        got_q = [int(v) for v in from_limbs(np.asarray(q_pl)[:, i])]
        # host result is trimmed; device is zero-padded to m
        assert got_q[: len(want_q)] == want_q
        assert all(v == 0 for v in got_q[len(want_q):])
        a_poly, b_poly, c_poly = r1cs.interpolations(w)
        got_a = [int(v) for v in from_limbs(np.asarray(a_pl)[:, i])]
        assert got_a[: len(a_poly)] == a_poly


def test_device_quotient_flags_invalid(dctx):
    m = 4
    r1cs = multiplication_gates(m, Q)
    w_good = mult_witness(m, Q, seed=1)
    w_bad = list(w_good)
    w_bad[-1] = (w_bad[-1] + 1) % Q
    pp = ProvePlan.create(m, Q, dctx)
    evs = [
        r1cs.compute_constraint_evals(w_good),
        # bad witness: evals computed anyway (is_satisfied bypassed)
        r1cs.compute_constraint_evals(w_bad),
    ]
    d = pp.plan.ctx.d
    stack = lambda idx: jnp.asarray(
        to_limbs(np.array([e[idx] for e in evs], dtype=object), d)
    )
    _, _, _, _, valid = quotient_batch_jit(pp, stack(0), stack(1), stack(2))
    assert np.asarray(valid).tolist() == [True, False]


def test_device_commitment_structure(ctx, dctx):
    # deterministic in key, message-sensitive, words in canonical range
    msgs = np.array([[1, 2, 3], [4, 5, 6]], dtype=object)
    planes = embed_messages(dctx, msgs, Q)
    key = jax.random.PRNGKey(7)
    c1, s1, e1 = commit_batch_jit(dctx, planes, key)
    c2, _, _ = commit_batch_jit(dctx, planes, key)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    words = from_limbs_u64(np.asarray(c1))
    assert int(words.max()) < 18446744069414584321
    msgs2 = np.array([[1, 2, 4], [4, 5, 6]], dtype=object)
    c3, _, _ = commit_batch_jit(dctx, embed_messages(dctx, msgs2, Q), key)
    assert not np.array_equal(np.asarray(c1)[:, 0], np.asarray(c3)[:, 0])
    assert np.array_equal(np.asarray(c1)[:, 1], np.asarray(c3)[:, 1])
    # gaussian randomness within tail bound
    assert int(np.abs(np.asarray(s1)).max()) <= 39


def test_prove_r1cs_batched_end_to_end(ctx):
    m = 8
    r1cs = multiplication_gates(m, Q)
    witnesses = [mult_witness(m, Q, seed=s) for s in range(4)]
    proofs = prove_r1cs_batched(r1cs, witnesses, ctx, seed=42)
    assert len(proofs) == 4
    for w, p in zip(witnesses, proofs):
        assert verify_r1cs(p, r1cs.public_inputs(w), r1cs)
    # determinism
    proofs2 = prove_r1cs_batched(r1cs, witnesses, ctx, seed=42)
    assert proofs[0].to_bytes() == proofs2[0].to_bytes()
    # distinct witnesses -> distinct commitments
    assert proofs[0].commitment_q != proofs[1].commitment_q


def test_prove_r1cs_batched_rejects_invalid(ctx):
    m = 4
    r1cs = multiplication_gates(m, Q)
    good = mult_witness(m, Q, seed=2)
    bad = list(good)
    bad[1] = (bad[1] + 1) % Q
    with pytest.raises(InvalidWitnessError):
        prove_r1cs_batched(r1cs, [good, bad], ctx, seed=1)


def test_prove_r1cs_batched_zk(ctx):
    from lambda_snark_tpu import ProofR1csZk, verify_r1cs_zk

    m = 8
    r1cs = multiplication_gates(m, Q)
    witnesses = [mult_witness(m, Q, seed=s) for s in range(3)]
    proofs = prove_r1cs_batched(r1cs, witnesses, ctx, seed=11, zk=True,
                                blinding_seed=13)
    for w, p in zip(witnesses, proofs):
        assert isinstance(p, ProofR1csZk)
        assert verify_r1cs_zk(p, r1cs.public_inputs(w), r1cs)
    # distinct blinding per proof in the batch
    assert len({p.blinding_factor for p in proofs}) == 3
    # deterministic
    proofs2 = prove_r1cs_batched(r1cs, witnesses, ctx, seed=11, zk=True,
                                 blinding_seed=13)
    assert proofs[0].to_bytes() == proofs2[0].to_bytes()
    # ZK batched requires n >= m+1
    import pytest as _pytest
    from lambda_snark_tpu.core.errors import DomainError
    r64 = multiplication_gates(64, Q)  # == ring degree n=64
    w64 = [mult_witness(64, Q, seed=1)]
    with _pytest.raises(DomainError):
        prove_r1cs_batched(r64, w64, ctx, seed=1, zk=True)
