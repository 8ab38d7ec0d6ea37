"""Streamed batched proving: host/device overlap + ProofStore resume log."""

import random

import pytest

from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS, ROOTS_OF_UNITY_45BIT
from lambda_snark_tpu.prover_batched import prove_r1cs_stream
from lambda_snark_tpu.utils.artifacts import ProofStore, statement_digest
from lambda_snark_tpu.verifier import verify_r1cs, verify_r1cs_zk

Q = NTT_FRIENDLY_MODULUS
M = 8


def _mult_gates_circuit():
    """m multiplication gates over the roots domain (zk_overhead structure)."""
    from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

    b = CircuitBuilder(Q)
    one = b.alloc_var()
    xs = [b.alloc_var() for _ in range(M)]
    ys = [b.alloc_var() for _ in range(M)]
    zs = [b.alloc_var() for _ in range(M)]
    b.set_public_inputs(1)
    for x, y, z in zip(xs, ys, zs):
        b.mul_gate(x, y, z)
    return b.build()


def _witnesses(count, seed=0):
    rng = random.Random(seed)
    out = []
    for _ in range(count):
        xs = [rng.randrange(1, Q) for _ in range(M)]
        ys = [rng.randrange(1, Q) for _ in range(M)]
        zs = [(x * y) % Q for x, y in zip(xs, ys)]
        out.append([1] + xs + ys + zs)
    return out


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(16, 1, Q, 3.19)))


def test_stream_yields_verifying_proofs_in_order(ctx):
    r1cs = _mult_gates_circuit()
    ws = _witnesses(7)
    proofs = list(prove_r1cs_stream(r1cs, iter(ws), ctx, seed=5, batch=3))
    assert len(proofs) == 7
    for w, p in zip(ws, proofs):
        assert verify_r1cs(p, r1cs.public_inputs(w), r1cs)


def test_stream_deterministic(ctx):
    r1cs = _mult_gates_circuit()
    ws = _witnesses(5, seed=2)
    run1 = [p.to_bytes() for p in prove_r1cs_stream(r1cs, iter(ws), ctx, seed=9, batch=2)]
    run2 = [p.to_bytes() for p in prove_r1cs_stream(r1cs, iter(ws), ctx, seed=9, batch=2)]
    assert run1 == run2
    # different seed -> different commitments
    run3 = [p.to_bytes() for p in prove_r1cs_stream(r1cs, iter(ws), ctx, seed=10, batch=2)]
    assert run1 != run3


def test_stream_zk(ctx):
    r1cs = _mult_gates_circuit()
    ws = _witnesses(4, seed=3)
    proofs = list(
        prove_r1cs_stream(r1cs, iter(ws), ctx, seed=5, batch=2, zk=True)
    )
    for w, p in zip(ws, proofs):
        assert verify_r1cs_zk(p, r1cs.public_inputs(w), r1cs)


def test_stream_rejects_invalid_with_global_index(ctx):
    from lambda_snark_tpu.core.errors import InvalidWitnessError

    r1cs = _mult_gates_circuit()
    ws = _witnesses(6, seed=4)
    ws[4][-1] = (ws[4][-1] + 1) % Q  # corrupt witness index 4 (batch 2)
    with pytest.raises(InvalidWitnessError) as ei:
        list(prove_r1cs_stream(r1cs, iter(ws), ctx, seed=5, batch=2))
    assert "[4]" in str(ei.value)


def test_stream_proof_store_resume(ctx, tmp_path):
    r1cs = _mult_gates_circuit()
    ws = _witnesses(5, seed=6)
    store = ProofStore(str(tmp_path))
    proofs = list(
        prove_r1cs_stream(r1cs, iter(ws), ctx, seed=7, batch=2, store=store)
    )
    # every statement is in the resume log
    for i, w in enumerate(ws):
        key = statement_digest(
            r1cs, r1cs.public_inputs(w), 7, f"stream-{i}"
        )
        assert store.contains(key)
        assert store.load(key).to_bytes() == proofs[i].to_bytes()
    # integrity sweep accepts them all
    assert all(store.verify_all(r1cs).values())
