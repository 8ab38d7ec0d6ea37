"""Sharded proof service on a virtual CPU mesh: streaming, resume, order."""

import numpy as np
import pytest

from lambda_snark_tpu import Params, Profile, SecurityLevel
from lambda_snark_tpu.commit.lwe import LweContext
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
from lambda_snark_tpu.parallel.mesh import make_mesh
from lambda_snark_tpu.parallel.service import ShardedProofService
from lambda_snark_tpu.utils.artifacts import ProofStore
from lambda_snark_tpu.verifier import verify_r1cs

from test_r1cs import multiplication_gates, mult_witness

Q = NTT_FRIENDLY_MODULUS
M = 64  # = ring degree for the sharded path


@pytest.fixture(scope="module")
def host_ctx():
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=M, k=2, q=Q, sigma=3.19)
    )
    return LweContext(params, context_seed=5)


@pytest.fixture(scope="module")
def circuit():
    r1cs = multiplication_gates(M, Q)
    witnesses = [mult_witness(M, Q, seed=s) for s in range(6)]
    return r1cs, witnesses


def test_service_proves_stream_in_order(host_ctx, circuit):
    r1cs, witnesses = circuit
    mesh = make_mesh([2, 2], ["dp", "sp"])
    svc = ShardedProofService(r1cs, host_ctx, mesh, batch=4)
    got = list(svc.prove_stream(witnesses, seed=21))
    assert [i for i, _p in got] == list(range(len(witnesses)))
    for (i, proof), w in zip(got, witnesses):
        assert verify_r1cs(proof, r1cs.public_inputs(w), r1cs)


def test_service_resume_skips_stored(host_ctx, circuit, tmp_path):
    r1cs, witnesses = circuit
    mesh = make_mesh([2, 2], ["dp", "sp"])
    store = ProofStore(str(tmp_path))
    svc = ShardedProofService(r1cs, host_ctx, mesh, store=store, batch=2)
    # first run proves only the first 3 statements (simulate interruption)
    first = []
    for i, proof in svc.prove_stream(witnesses, seed=8):
        first.append((i, proof.to_bytes()))
        if i == 2:
            break
    assert len(store.keys()) >= 3
    proven_before = len(store.keys())
    # resume over the full stream: stored proofs come back byte-identical
    svc2 = ShardedProofService(r1cs, host_ctx, mesh, store=store, batch=2)
    resumed = list(svc2.prove_stream(witnesses, seed=8))
    assert [i for i, _p in resumed] == list(range(len(witnesses)))
    for i, data in first:
        assert resumed[i][1].to_bytes() == data
    for (i, proof), w in zip(resumed, witnesses):
        assert verify_r1cs(proof, r1cs.public_inputs(w), r1cs)
    assert len(store.keys()) == len(witnesses)
    assert len(store.keys()) > proven_before


def test_service_tail_batch_padding(host_ctx, circuit):
    """A tail batch smaller than dp is padded internally and still proves."""
    r1cs, witnesses = circuit
    mesh = make_mesh([4, 2], ["dp", "sp"])
    svc = ShardedProofService(r1cs, host_ctx, mesh, batch=4)
    got = list(svc.prove_stream(witnesses[:5], seed=3))  # 4 + 1 tail
    assert len(got) == 5
    for (i, proof), w in zip(got, witnesses[:5]):
        assert verify_r1cs(proof, r1cs.public_inputs(w), r1cs)
