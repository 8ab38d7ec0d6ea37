"""Streamed + sharded proving walkthrough.

Demonstrates the two serving shapes added on top of batched proving:

1. ``prove_r1cs_stream`` — host/device-overlapped streaming: while the
   device proves batch k, the host prepares batch k+1 and assembles
   transcripts for batch k-1; proofs land in a ProofStore as they finish.
2. ``ShardedProofService`` — the same stream sharded over a (dp, sp)
   device mesh with the store as a resume log: interrupt the loop, start
   a new service over the same store, and watch it skip what's done.

Run:  python examples/proof_service.py      (CPU: uses a virtual 4-device
mesh via XLA_FLAGS; real TPU pods work unchanged)
"""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

import jax

jax.config.update("jax_platforms", "cpu")

import lambda_snark_tpu as ls
from lambda_snark_tpu.commit.lwe import LweContext
from lambda_snark_tpu.parallel.mesh import make_mesh
from lambda_snark_tpu.parallel.service import ShardedProofService
from lambda_snark_tpu.utils.artifacts import ProofStore

Q = 17592169062401  # 45-bit NTT-friendly prime
M = 64


def build_circuit():
    b = ls.CircuitBuilder(Q)
    b.alloc_var()  # constant-one slot
    xs = [b.alloc_var() for _ in range(M)]
    ys = [b.alloc_var() for _ in range(M)]
    zs = [b.alloc_var() for _ in range(M)]
    b.set_public_inputs(1)
    for x, y, z in zip(xs, ys, zs):
        b.mul_gate(x, y, z)
    return b.build()


def witnesses(count, seed=0):
    rng = random.Random(seed)
    out = []
    for _ in range(count):
        xv = [rng.randrange(1, Q) for _ in range(M)]
        yv = [rng.randrange(1, Q) for _ in range(M)]
        out.append([1] + xv + yv + [(a * b) % Q for a, b in zip(xv, yv)])
    return out


def main():
    r1cs = build_circuit()
    ws = witnesses(6)
    params = ls.Params(
        ls.SecurityLevel.BITS128, ls.Profile.ring_b(n=M, k=2, q=Q, sigma=3.19)
    )
    ctx = ls.setup(params, context_seed=7)

    # 1. streamed proving on one device
    store_dir = tempfile.mkdtemp(prefix="lsnark_svc_")
    store = ProofStore(store_dir)
    print("streaming proofs (single device, overlapped)...")
    for i, proof in enumerate(
        ls.prove_r1cs_stream(r1cs, iter(ws[:4]), ctx, seed=11, batch=2,
                             store=store)
    ):
        ok = ls.verify_r1cs(proof, r1cs.public_inputs(ws[i]), r1cs)
        print(f"  proof {i}: {len(proof.to_bytes())} B, verify={ok}")

    # 2. sharded service with resume over a fresh store
    mesh = make_mesh([2, 2], ["dp", "sp"])
    svc_dir = tempfile.mkdtemp(prefix="lsnark_svc2_")
    svc_store = ProofStore(svc_dir)
    svc = ShardedProofService(r1cs, ctx, mesh, store=svc_store, batch=2)
    print("sharded service, first pass (interrupt after 3)...")
    for i, proof in svc.prove_stream(ws, seed=21):
        print(f"  proved {i}")
        if i == 2:
            break
    print(f"store now holds {len(svc_store.keys())} proofs; resuming...")
    svc2 = ShardedProofService(r1cs, ctx, mesh, store=svc_store, batch=2)
    for i, proof in svc2.prove_stream(ws, seed=21):
        src = "store" if i <= 2 else "proved"
        ok = ls.verify_r1cs(proof, r1cs.public_inputs(ws[i]), r1cs)
        print(f"  {src} {i}: verify={ok}")
    print(f"done: {len(svc_store.keys())} proofs in {svc_dir}")


if __name__ == "__main__":
    main()
