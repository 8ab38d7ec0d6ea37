"""Stage-level profile of the warm succinct prover on the real chip.

Times each stage of prove_r1cs_succinct (device-resident FRI path) at
m = 2^13 Goldilocks: host quotient/interpolation, device LDE, Merkle
commit, LWE commit, transcript, evaluations, DEEP combine, FRI chain.
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
from lambda_snark_tpu.core.params import NTT_MODULUS
from lambda_snark_tpu.proof.succinct import prove_r1cs_succinct, verify_r1cs_succinct
from lambda_snark_tpu.r1cs.circuit import CircuitBuilder


def build(m):
    builder = CircuitBuilder(NTT_MODULUS)
    builder.alloc_var()
    xs = builder.alloc_vars(m)
    ys = builder.alloc_vars(m)
    builder.set_public_inputs(1)
    for x, y in zip(xs, ys):
        builder.mul_gate(x, x, y)
    r = random.Random(1)
    vals = [r.randrange(NTT_MODULUS) for _ in range(m)]
    w = [1] + vals + [v * v % NTT_MODULUS for v in vals]
    return builder.build(), w


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compile_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    m = 1 << 13
    r1cs, w = build(m)
    ctx = setup(
        Params(SecurityLevel.BITS128, Profile.ring_b(m, 1, NTT_MODULUS, 3.19))
    )

    # instrument by monkey-patching the stage functions
    import lambda_snark_tpu.proof.succinct as S
    import lambda_snark_tpu.proof.fri_device as FD
    import lambda_snark_tpu.proof.fri as FR
    from lambda_snark_tpu.commit import lwe as LWE

    times = {}

    def wrap(mod, name, label):
        orig = getattr(mod, name)

        def wrapped(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            times[label] = times.get(label, 0.0) + (time.time() - t0)
            return out

        setattr(mod, name, wrapped)
        return orig

    # succinct.py uses `from . import fri_device` and
    # `from .fri import lde_batch_device_planes` INSIDE the function body, so
    # both re-read the patched module attributes at call time — patching the
    # fri/fri_device module attrs below is sufficient. Patches are process-
    # lifetime by design (the script only profiles and exits).
    wrap(S, "_gl_quotient_and_interpolations", "quotient+interp(host)")
    wrap(FR, "lde_batch_device_planes", "lde(device)")
    wrap(FD, "commit_planes_dev", "merkle commit(device)")
    wrap(LWE, "commit", "lwe commit(host)")
    wrap(S, "_gl_poly_eval", "poly evals(host)")
    wrap(FD, "deep_combine_device", "deep combine(device)")
    wrap(FD, "fri_prove_device", "fri chain(device)")

    for tag in ("cold", "warm", "warm2"):
        times.clear()
        t0 = time.time()
        proof = prove_r1cs_succinct(r1cs, w, ctx, seed=7, device_lde=True)
        total = time.time() - t0
        print(f"--- {tag}: total {total:.3f}s")
        acc = 0.0
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"    {k:28s} {v:.3f}s")
            acc += v
        print(f"    {'(unaccounted)':28s} {total-acc:.3f}s")

    t0 = time.time()
    ok = verify_r1cs_succinct(proof, [1], r1cs)
    print(f"verify: {time.time()-t0:.3f}s ok={ok}")


if __name__ == "__main__":
    main()
