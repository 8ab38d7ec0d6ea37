"""Aggregated succinct proofs (proof/aggregate.py, wire kind 8).

One shared FRI for a statement batch: completeness, per-statement binding
(any tampered statement kills the whole proof), size advantage over separate
succinct proofs, ZK variant, wire round-trip, parameter policy.
"""

import dataclasses

import pytest

from lambda_snark_tpu import (
    AggregatedProofR1CS,
    Params,
    Profile,
    SecurityLevel,
    deserialize_any,
    prove_r1cs_succinct_aggregate,
    prove_r1cs_succinct_batch,
    setup,
    verify_r1cs_succinct_aggregate,
)
from lambda_snark_tpu.core.errors import (
    DomainError,
    InvalidDimensionsError,
    SerializationError,
)
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS, NTT_MODULUS
from lambda_snark_tpu.proof.fri import FriParams

from test_succinct import FAST, mult_circuit, mult_witness

GL = NTT_MODULUS


@pytest.fixture(scope="module")
def ctx_gl():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, GL, 3.19)))


@pytest.fixture(scope="module")
def instance(ctx_gl):
    r1cs = mult_circuit(16, GL)
    witnesses = [mult_witness(16, GL, seed=50 + i) for i in range(4)]
    seeds = [1, 2, 3, 4]
    proof = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=False
    )
    return r1cs, witnesses, seeds, proof


def test_aggregate_completeness(instance):
    r1cs, witnesses, _seeds, proof = instance
    publics = [[1]] * len(witnesses)
    assert verify_r1cs_succinct_aggregate(proof, publics, r1cs, min_params=FAST)


def test_aggregate_smaller_than_separate():
    # large enough that committed fold layers exist (m=256 -> 4 layers at
    # final_len=8); the shared layers are where aggregation pays
    m = 256
    ctx = setup(Params(SecurityLevel.BITS128, Profile.ring_b(m, 1, GL, 3.19)))
    r1cs = mult_circuit(m, GL)
    witnesses = [mult_witness(m, GL, seed=90 + i) for i in range(4)]
    seeds = [11, 12, 13, 14]
    agg = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx, seeds, fri_params=FAST, device_lde=False
    )
    separate = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx, seeds, fri_params=FAST, device_lde=False
    )
    publics = [[1]] * len(witnesses)
    assert verify_r1cs_succinct_aggregate(agg, publics, r1cs, min_params=FAST)
    agg_bytes = len(agg.to_bytes())
    sep_bytes = sum(len(p.to_bytes()) for p in separate)
    # the shared fold layers must buy a real reduction
    assert agg_bytes < 0.8 * sep_bytes, (agg_bytes, sep_bytes)


def test_aggregate_roundtrip(instance):
    r1cs, witnesses, _seeds, proof = instance
    data = proof.to_bytes()
    rt = deserialize_any(data)
    assert isinstance(rt, AggregatedProofR1CS)
    assert rt.to_bytes() == data
    publics = [[1]] * len(witnesses)
    assert verify_r1cs_succinct_aggregate(rt, publics, r1cs, min_params=FAST)
    with pytest.raises(SerializationError):
        AggregatedProofR1CS.from_bytes(data[: len(data) // 2])


def test_aggregate_tamper_rejected(instance):
    r1cs, witnesses, _seeds, proof = instance
    publics = [[1]] * len(witnesses)
    # tamper one statement's claimed evaluation
    st = proof.statements[2]
    bad_st = dataclasses.replace(
        st, evals=tuple((v + (i == 3)) % GL for i, v in enumerate(st.evals))
    )
    bad = dataclasses.replace(
        proof,
        statements=proof.statements[:2] + (bad_st,) + proof.statements[3:],
    )
    assert not verify_r1cs_succinct_aggregate(bad, publics, r1cs, min_params=FAST)
    # tamper one statement's Merkle root
    bad_st2 = dataclasses.replace(st, input_root=bytes(32))
    bad2 = dataclasses.replace(
        proof,
        statements=proof.statements[:2] + (bad_st2,) + proof.statements[3:],
    )
    assert not verify_r1cs_succinct_aggregate(bad2, publics, r1cs, min_params=FAST)
    # wrong public inputs for one statement
    assert not verify_r1cs_succinct_aggregate(
        proof, [[1], [1], [2], [1]], r1cs, min_params=FAST
    )
    # statement count mismatch
    assert not verify_r1cs_succinct_aggregate(
        proof, [[1]] * 3, r1cs, min_params=FAST
    )


def test_aggregate_param_floor(instance):
    r1cs, witnesses, _seeds, proof = instance
    publics = [[1]] * len(witnesses)
    strong = FriParams(log_blowup=3, num_queries=proof.num_queries + 1)
    assert not verify_r1cs_succinct_aggregate(
        proof, publics, r1cs, min_params=strong
    )


def test_aggregate_zk(ctx_gl):
    r1cs = mult_circuit(16, GL)
    witnesses = [mult_witness(16, GL, seed=60 + i) for i in range(2)]
    proof = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx_gl, [5, 6], zk=True, fri_params=FAST,
        blinding_seeds=[7, 8], device_lde=False,
    )
    assert proof.mask_len == 2 * FAST.num_queries + 8
    assert verify_r1cs_succinct_aggregate(
        proof, [[1], [1]], r1cs, min_params=FAST
    )
    # deterministic given the seeds
    again = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx_gl, [5, 6], zk=True, fri_params=FAST,
        blinding_seeds=[7, 8], device_lde=False,
    )
    assert again.to_bytes() == proof.to_bytes()


def test_aggregate_input_validation(ctx_gl):
    r1cs = mult_circuit(16, GL)
    witnesses = [mult_witness(16, GL, seed=70)]
    with pytest.raises(InvalidDimensionsError):
        prove_r1cs_succinct_aggregate(r1cs, [], ctx_gl, [], fri_params=FAST)
    with pytest.raises(InvalidDimensionsError):
        prove_r1cs_succinct_aggregate(
            r1cs, witnesses, ctx_gl, [1, 2], fri_params=FAST
        )
    q45 = NTT_FRIENDLY_MODULUS
    ctx45 = setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, q45, 3.19)))
    r45 = mult_circuit(8, q45)
    with pytest.raises(DomainError):
        prove_r1cs_succinct_aggregate(
            r45, [mult_witness(8, q45)], ctx45, [1], fri_params=FAST
        )


def test_aggregate_single_statement(ctx_gl):
    r1cs = mult_circuit(16, GL)
    w = mult_witness(16, GL, seed=80)
    proof = prove_r1cs_succinct_aggregate(
        r1cs, [w], ctx_gl, [9], fri_params=FAST, device_lde=False
    )
    assert verify_r1cs_succinct_aggregate(proof, [[1]], r1cs, min_params=FAST)


def test_aggregate_device_host_same_bytes(ctx_gl):
    """The device-resident aggregate path (batched DEEP + statement sum +
    single-dispatch shared FRI) emits bytes identical to the host path."""
    r1cs = mult_circuit(16, GL)
    witnesses = [mult_witness(16, GL, seed=80 + i) for i in range(3)]
    seeds = [5, 6, 7]

    dev = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=True
    )
    host = prove_r1cs_succinct_aggregate(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=False
    )
    assert dev.to_bytes() == host.to_bytes()
    assert verify_r1cs_succinct_aggregate(
        dev, [r1cs.public_inputs(w) for w in witnesses], r1cs,
        min_params=FAST,
    )
