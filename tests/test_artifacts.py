"""Proof store: persistence, resume, integrity sweep."""

import pytest

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    prove_r1cs,
    prove_r1cs_zk,
    setup,
)
from lambda_snark_tpu.utils.artifacts import (
    ProofStore,
    circuit_digest,
    statement_digest,
)

from test_r1cs import mult_gate_r1cs

Q = 17592186044417


@pytest.fixture(scope="module")
def ctx():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19)))


def test_store_roundtrip_and_resume(tmp_path, ctx):
    r1cs = mult_gate_r1cs()
    witness = [1, 7, 13, 91]
    public = r1cs.public_inputs(witness)
    store = ProofStore(str(tmp_path / "proofs"))

    proof = prove_r1cs(r1cs, witness, ctx, seed=1)
    key = store.save(r1cs, public, 1, proof)
    assert store.contains(key)
    loaded = store.load(key)
    assert loaded.to_bytes() == proof.to_bytes()

    zk = prove_r1cs_zk(r1cs, witness, ctx, seed=2, blinding_seed=3)
    store.save(r1cs, public, 2, zk)

    # integrity sweep verifies both kinds
    results = store.verify_all(r1cs)
    assert len(results) == 2 and all(results.values())

    # resume: statement (public, seed=1/2) already proven; seed=3 missing
    missing = store.missing_statements(
        r1cs, [(public, 1), (public, 2), (public, 3)]
    )
    assert missing == [2]

    # a second store instance sees the manifest (durable)
    store2 = ProofStore(str(tmp_path / "proofs"))
    assert store2.keys() == store.keys()


def test_digests_bind_circuit_and_statement():
    r1cs = mult_gate_r1cs()
    d1 = circuit_digest(r1cs)
    r2 = mult_gate_r1cs(modulus=17592186044423)
    assert d1 != circuit_digest(r2)
    s1 = statement_digest(r1cs, [1, 7], 1)
    assert s1 != statement_digest(r1cs, [1, 8], 1)
    assert s1 != statement_digest(r1cs, [1, 7], 2)


def test_store_labels_disambiguate_batches(tmp_path, ctx):
    # batch members sharing (circuit, publics, seed) must not collide
    r1cs = mult_gate_r1cs()
    store = ProofStore(str(tmp_path / "p"))
    w = [1, 7, 13, 91]
    public = r1cs.public_inputs(w)
    p1 = prove_r1cs(r1cs, w, ctx, seed=1)
    p2 = prove_r1cs(r1cs, w, ctx, seed=1)
    k1 = store.save(r1cs, public, 1, p1, label="0")
    k2 = store.save(r1cs, public, 1, p2, label="1")
    assert k1 != k2 and len(store.keys()) == 2
    missing = store.missing_statements(
        r1cs, [(public, 1), (public, 1), (public, 1)], labels=["0", "1", "2"]
    )
    assert missing == [2]
