"""End-to-end batched proving walkthrough.

Builds a 64-gate circuit over the 45-bit NTT-friendly prime, proves a batch
of witnesses on the device pipeline (plain + ZK), stores the proofs in a
content-addressed ProofStore, and re-verifies everything — the serving-shaped
workflow of this framework.

Run:  python examples/batch_proving.py        (CPU works; TPU if available)

Note: the first run spends a few minutes in XLA compilation for the fresh
shapes; subsequent runs with the persistent compile cache are fast.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lambda_snark_tpu as ls
from lambda_snark_tpu.circuits.examples import (
    multiplication_gates_circuit,
    multiplication_gates_witness,
)
from lambda_snark_tpu.utils.artifacts import ProofStore


def main() -> None:
    q = ls.NTT_FRIENDLY_MODULUS
    m, batch = 64, 8
    r1cs = multiplication_gates_circuit(m, q)
    witnesses = [multiplication_gates_witness(m, q, seed=s) for s in range(batch)]
    params = ls.Params(
        ls.SecurityLevel.BITS128, ls.Profile.ring_b(n=128, k=2, q=q, sigma=3.19)
    )
    ctx = ls.setup(params, context_seed=1)

    t0 = time.time()
    proofs = ls.prove_r1cs_batched(r1cs, witnesses, ctx, seed=42)
    print(f"proved {batch} statements in {time.time() - t0:.2f}s "
          f"(m={m} gates each, device pipeline)")

    store = ProofStore(os.path.join(tempfile.mkdtemp(), "proofs"))
    for i, (w, p) in enumerate(zip(witnesses, proofs)):
        store.save(r1cs, r1cs.public_inputs(w), 42, p, label=str(i))
    results = store.verify_all(r1cs)
    assert all(results.values())
    print(f"stored + re-verified {len(results)} proofs "
          f"({sum(e['size_bytes'] for e in store._manifest.values())} bytes total)")

    zk = ls.prove_r1cs_batched(r1cs, witnesses[:2], ctx, seed=43, zk=True)
    ok = all(
        ls.verify_r1cs_zk(p, r1cs.public_inputs(w), r1cs)
        for w, p in zip(witnesses, zk)
    )
    print(f"zero-knowledge batch verifies: {ok}")

    compact = ls.prove_r1cs_compact(r1cs, witnesses[0], ctx, seed=44)
    print(f"compact proof: {len(compact.to_bytes())} bytes, verifies="
          f"{ls.verify_r1cs_compact(compact, r1cs.public_inputs(witnesses[0]), r1cs)}")


if __name__ == "__main__":
    main()
