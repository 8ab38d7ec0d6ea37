"""Batched succinct proving (proof/succinct_batch.py).

The contract is byte-exactness: the batch prover must emit proofs identical
to the sequential ``prove_r1cs_succinct`` for the same seeds — every batched
stage is exact modular arithmetic, so any divergence is a bug.
"""

import numpy as np
import pytest

from lambda_snark_tpu import (
    Params,
    Profile,
    SecurityLevel,
    prove_r1cs_succinct,
    setup,
    verify_r1cs_succinct,
)
from lambda_snark_tpu.core.errors import (
    InvalidDimensionsError,
    InvalidWitnessError,
)
from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS, NTT_MODULUS
from lambda_snark_tpu.ops import goldilocks_np as glnp
from lambda_snark_tpu.proof.fri import FriParams
from lambda_snark_tpu.proof.succinct_batch import (
    _gl_eval_batch,
    _spmv_batch,
    prove_r1cs_succinct_batch,
)

from test_succinct import FAST, mult_circuit, mult_witness

GL = NTT_MODULUS


@pytest.fixture(scope="module")
def ctx_gl():
    return setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, GL, 3.19)))


@pytest.fixture(scope="module")
def batch_instance():
    r1cs = mult_circuit(16, GL)
    witnesses = [mult_witness(16, GL, seed=i) for i in range(3)]
    return r1cs, witnesses


def test_batched_ntt_matches_single_rows():
    ntt = glnp.goldilocks_ntt(64)
    rng = np.random.default_rng(0)
    x = rng.integers(0, glnp.GOLDILOCKS, size=(5, 64), dtype=np.uint64)
    fwd = ntt.forward(x)
    for i in range(5):
        assert np.array_equal(fwd[i], ntt.forward(x[i]))
    assert np.array_equal(ntt.inverse(fwd), x)
    neg = ntt.forward_negacyclic(x)
    for i in range(5):
        assert np.array_equal(neg[i], ntt.forward_negacyclic(x[i]))


def test_spmv_batch_matches_mul_vec(batch_instance):
    r1cs, witnesses = batch_instance
    z = np.array([[v % GL for v in w] for w in witnesses], dtype=np.uint64)
    for mat in (r1cs.a, r1cs.b, r1cs.c):
        got = _spmv_batch(mat, z, GL)
        for i, w in enumerate(witnesses):
            assert got[i].tolist() == mat.mul_vec(w, GL)


def test_eval_batch_matches_scalar():
    from lambda_snark_tpu.proof.succinct import _gl_poly_eval

    rng = np.random.default_rng(1)
    polys = rng.integers(0, glnp.GOLDILOCKS, size=(4, 23), dtype=np.uint64)
    points = rng.integers(1, glnp.GOLDILOCKS, size=4, dtype=np.uint64)
    got = _gl_eval_batch(polys, points)
    for i in range(4):
        assert int(got[i]) == _gl_poly_eval(polys[i], int(points[i]))


def test_batch_bytes_equal_sequential(ctx_gl, batch_instance):
    r1cs, witnesses = batch_instance
    seeds = [11, 12, 13]
    batch = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=False
    )
    for w, seed, proof in zip(witnesses, seeds, batch):
        single = prove_r1cs_succinct(r1cs, w, ctx_gl, seed, fri_params=FAST)
        assert proof.to_bytes() == single.to_bytes()
        assert verify_r1cs_succinct(proof, [1], r1cs, min_params=FAST)


def test_batch_device_lde_same_bytes(ctx_gl, batch_instance):
    r1cs, witnesses = batch_instance
    seeds = [21, 22, 23]
    host = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=False
    )
    dev = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=True
    )
    assert [p.to_bytes() for p in host] == [p.to_bytes() for p in dev]


def test_batch_pipelined_same_bytes(ctx_gl, batch_instance):
    """Software-pipelined chunking must not change a single proof byte —
    including an uneven tail chunk (3 statements, chunk=2)."""
    r1cs, witnesses = batch_instance
    seeds = [21, 22, 23]
    dev = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=True
    )
    piped = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, fri_params=FAST, device_lde=True,
        pipeline_chunk=2,
    )
    assert [p.to_bytes() for p in dev] == [p.to_bytes() for p in piped]


def test_batch_zk_bytes_equal_sequential(ctx_gl, batch_instance):
    r1cs, witnesses = batch_instance
    seeds = [31, 32, 33]
    blind = [101, 102, 103]
    batch = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx_gl, seeds, zk=True, fri_params=FAST,
        blinding_seeds=blind, device_lde=False,
    )
    for w, seed, bs, proof in zip(witnesses, seeds, blind, batch):
        single = prove_r1cs_succinct(
            r1cs, w, ctx_gl, seed, zk=True, fri_params=FAST, blinding_seed=bs
        )
        assert proof.to_bytes() == single.to_bytes()
        assert proof.mask_len > 0
        assert verify_r1cs_succinct(proof, [1], r1cs, min_params=FAST)


def test_batch_rejects_bad_witness(ctx_gl, batch_instance):
    r1cs, witnesses = batch_instance
    bad = list(witnesses[1])
    bad[1] = (bad[1] + 1) % GL
    with pytest.raises(InvalidWitnessError, match="witness 1"):
        prove_r1cs_succinct_batch(
            r1cs, [witnesses[0], bad], ctx_gl, [1, 2], fri_params=FAST,
            device_lde=False,
        )


def test_batch_seed_count_mismatch(ctx_gl, batch_instance):
    r1cs, witnesses = batch_instance
    with pytest.raises(InvalidDimensionsError):
        prove_r1cs_succinct_batch(
            r1cs, witnesses, ctx_gl, [1, 2], fri_params=FAST, device_lde=False
        )
    with pytest.raises(InvalidDimensionsError):
        prove_r1cs_succinct_batch(
            r1cs, witnesses, ctx_gl, [1, 2, 3], zk=True, fri_params=FAST,
            device_lde=False,
        )


def test_batch_fallback_non_goldilocks():
    q45 = NTT_FRIENDLY_MODULUS
    ctx = setup(Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, q45, 3.19)))
    r1cs = mult_circuit(8, q45)
    witnesses = [mult_witness(8, q45, seed=i) for i in range(2)]
    batch = prove_r1cs_succinct_batch(
        r1cs, witnesses, ctx, [7, 8], fri_params=FAST
    )
    for w, seed, proof in zip(witnesses, [7, 8], batch):
        single = prove_r1cs_succinct(r1cs, w, ctx, seed, fri_params=FAST)
        assert proof.to_bytes() == single.to_bytes()
        assert verify_r1cs_succinct(proof, [1], r1cs, min_params=FAST)


def test_batch_empty(ctx_gl, batch_instance):
    r1cs, _ = batch_instance
    assert prove_r1cs_succinct_batch(r1cs, [], ctx_gl, [], fri_params=FAST) == []


# --- streaming + store resume ---------------------------------------------------


def test_stream_partition_invariant(ctx_gl, batch_instance):
    from lambda_snark_tpu import prove_r1cs_succinct_stream

    r1cs, _ = batch_instance
    witnesses = [mult_witness(16, GL, seed=10 + i) for i in range(5)]
    by2 = list(
        prove_r1cs_succinct_stream(
            r1cs, witnesses, ctx_gl, seed=99, batch=2, fri_params=FAST,
            device_lde=False,
        )
    )
    by5 = list(
        prove_r1cs_succinct_stream(
            r1cs, witnesses, ctx_gl, seed=99, batch=5, fri_params=FAST,
            device_lde=False,
        )
    )
    assert [i for i, _ in by2] == [0, 1, 2, 3, 4]
    assert [p.to_bytes() for _, p in by2] == [p.to_bytes() for _, p in by5]
    for _, p in by2:
        assert verify_r1cs_succinct(p, [1], r1cs, min_params=FAST)


def test_stream_store_resume(tmp_path, ctx_gl, batch_instance):
    from lambda_snark_tpu import prove_r1cs_succinct_stream
    from lambda_snark_tpu.utils.artifacts import ProofStore

    r1cs, _ = batch_instance
    witnesses = [mult_witness(16, GL, seed=20 + i) for i in range(4)]
    store = ProofStore(str(tmp_path / "proofs"))
    first = list(
        prove_r1cs_succinct_stream(
            r1cs, witnesses[:2], ctx_gl, seed=7, batch=2, fri_params=FAST,
            store=store, device_lde=False,
        )
    )
    assert len(store.keys()) == 2
    # resumed run over the full stream: first two served from the store
    resumed = list(
        prove_r1cs_succinct_stream(
            r1cs, witnesses, ctx_gl, seed=7, batch=2, fri_params=FAST,
            store=store, device_lde=False,
        )
    )
    assert len(resumed) == 4
    for (i0, p0), (i1, p1) in zip(first, resumed[:2]):
        assert (i0, p0.to_bytes()) == (i1, p1.to_bytes())
    # integrity sweep covers the succinct kind
    results = store.verify_all(r1cs)
    assert len(results) == 4 and all(results.values())


def test_stream_zk_deterministic(ctx_gl, batch_instance):
    from lambda_snark_tpu import prove_r1cs_succinct_stream

    r1cs, _ = batch_instance
    witnesses = [mult_witness(16, GL, seed=30 + i) for i in range(2)]
    run = lambda: [
        p.to_bytes()
        for _, p in prove_r1cs_succinct_stream(
            r1cs, witnesses, ctx_gl, seed=1, batch=2, zk=True,
            fri_params=FAST, device_lde=False,
        )
    ]
    a, b = run(), run()
    assert a == b


# --- CLI prove-stream -------------------------------------------------------------


def _mult_circuit_json(m):
    cons = []
    for i in range(m):
        cons.append(
            {
                "A": [{"row": i, "col": 1 + i, "value": 1}],
                "B": [{"row": i, "col": 1 + m + i, "value": 1}],
                "C": [{"row": i, "col": 1 + 2 * m + i, "value": 1}],
            }
        )
    return {"m": m, "n": 1 + 3 * m, "l": 1, "modulus": GL, "constraints": cons}


def test_cli_prove_stream(tmp_path):
    import json

    from lambda_snark_tpu.cli import main as cli_main

    cpath = tmp_path / "circuit.json"
    wpath = tmp_path / "witnesses.json"
    cpath.write_text(json.dumps(_mult_circuit_json(4)))
    wits = [mult_witness(4, GL, seed=40 + i) for i in range(3)]
    wpath.write_text(json.dumps(wits))
    base = ["--ring-degree", "64", "--seed", "5"]
    # succinct mode with store + out-dir
    rc = cli_main(base + [
        "prove-stream", "--circuit", str(cpath), "--witnesses", str(wpath),
        "--succinct", "--batch", "2",
        "--store", str(tmp_path / "store"),
        "--out-dir", str(tmp_path / "proofs"),
    ])
    assert rc == 0
    assert sorted(p.name for p in (tmp_path / "proofs").iterdir()) == [
        "0.proof", "1.proof", "2.proof",
    ]
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath),
        "--proof", str(tmp_path / "proofs" / "1.proof"), "--public", "1",
    ])
    assert rc == 0
    # base (non-succinct) batched stream mode
    rc = cli_main(base + [
        "prove-stream", "--circuit", str(cpath), "--witnesses", str(wpath),
        "--batch", "2", "--out-dir", str(tmp_path / "base_proofs"),
    ])
    assert rc == 0
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath),
        "--proof", str(tmp_path / "base_proofs" / "2.proof"), "--public", "1",
    ])
    assert rc == 0


def test_embed_rejects_silent_numpy_wrap():
    """Signed numpy inputs must embed as v % q, never as the silent
    mod-2^64 wrap (np.asarray(int64, uint64) wraps without raising and
    -2^33 wraps to a value BELOW the Goldilocks modulus)."""
    from lambda_snark_tpu.proof.succinct_batch import _embed_and_eval
    from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

    b = CircuitBuilder(GL)
    b.alloc_var()
    xs = b.alloc_vars(2)
    ys = b.alloc_vars(2)
    b.set_public_inputs(1)
    for x, y in zip(xs, ys):
        b.mul_gate(x, x, y)
    r1cs = b.build()
    # -2^33 is int64-representable AND its silent 2^64-wrap
    # (2^64 - 2^33) is still below the Goldilocks modulus — the exact
    # trap: the wrapped value passes a < q guard but differs from v % q
    neg = -(2**33)
    a_val = neg % GL
    w_canon = [1, a_val, 5, a_val * a_val % GL, 25]
    ref = _embed_and_eval(r1cs, [w_canon])
    # Python-int negative representative
    got = _embed_and_eval(r1cs, [[1, neg, 5, a_val * a_val % GL, 25]])
    for a, g in zip(ref, got):
        assert np.array_equal(a, g)
    # np.int64 scalar inside a list (silently wraps under a raw uint64 cast)
    got2 = _embed_and_eval(
        r1cs, [[1, np.int64(neg), 5, a_val * a_val % GL, 25]]
    )
    for a, g in zip(ref, got2):
        assert np.array_equal(a, g)
    # int64 ndarray witness (the np.asarray(..., uint64) wrap case)
    got3 = _embed_and_eval(
        r1cs,
        [np.array([1, neg, 5, a_val * a_val % GL, 25], dtype=np.int64)],
    )
    for a, g in zip(ref, got3):
        assert np.array_equal(a, g)
