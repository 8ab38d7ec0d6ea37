"""Time batched succinct proving end-to-end on the real chip.

Prints proofs/s for prove_r1cs_succinct_batch at m = 2^13 over a sweep of
statement-batch sizes, plus the aggregate (kind-8) prover.
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_snark_tpu.core.params import NTT_MODULUS
from lambda_snark_tpu.r1cs.circuit import CircuitBuilder


def build(m):
    builder = CircuitBuilder(NTT_MODULUS)
    builder.alloc_var()
    xs = builder.alloc_vars(m)
    ys = builder.alloc_vars(m)
    builder.set_public_inputs(1)
    for x, y in zip(xs, ys):
        builder.mul_gate(x, x, y)
    return builder


def witnesses_for(m, count, seed=1):
    r = random.Random(seed)
    out = []
    for _ in range(count):
        vals = [r.randrange(NTT_MODULUS) for _ in range(m)]
        out.append([1] + vals + [v * v % NTT_MODULUS for v in vals])
    return out


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compile_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
    from lambda_snark_tpu.proof.succinct import (
        prove_r1cs_succinct,
        verify_r1cs_succinct,
    )
    from lambda_snark_tpu.proof.succinct_batch import prove_r1cs_succinct_batch

    m = 1 << 13
    r1cs = build(m).build()
    ctx = setup(
        Params(SecurityLevel.BITS128, Profile.ring_b(m, 1, NTT_MODULUS, 3.19))
    )
    print("platform:", jax.devices()[0])

    # single-statement reference proof (checks batch bit-exactness below)
    ws1 = witnesses_for(m, 1)
    t0 = time.time()
    p1 = prove_r1cs_succinct(r1cs, ws1[0], ctx, seed=7, device_lde=True)
    print(f"single cold: {time.time()-t0:.2f}s")
    t0 = time.time()
    p1 = prove_r1cs_succinct(r1cs, ws1[0], ctx, seed=7, device_lde=True)
    print(f"single warm: {time.time()-t0:.2f}s")
    assert verify_r1cs_succinct(p1, [1], r1cs)

    for s_batch in (4, 16, 32):
        ws = ws1 + witnesses_for(m, s_batch - 1, seed=100)
        seeds = [7] + list(range(100, 100 + s_batch - 1))
        t0 = time.time()
        proofs = prove_r1cs_succinct_batch(r1cs, ws, ctx, seeds, device_lde=True)
        cold = time.time() - t0
        t0 = time.time()
        proofs = prove_r1cs_succinct_batch(r1cs, ws, ctx, seeds, device_lde=True)
        warm = time.time() - t0
        match = proofs[0].to_bytes() == p1.to_bytes()
        print(
            f"batch S={s_batch:3d}: cold {cold:.2f}s warm {warm:.2f}s "
            f"= {s_batch/warm:.1f} proofs/s  match_single={match}"
        )


if __name__ == "__main__":
    main()
