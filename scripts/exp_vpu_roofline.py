"""Real-TPU: attribute the packed MXU-NTT's time to MXU vs VPU vs HBM.

VERDICT round 3 item 4: driver-measured MFU is ~24% of int8 peak and ~14%
of HBM — the kernel is bound by *neither* stated resource, so the roofline
model must name the true one. Hypothesis: the VPU epilogues (balanced-digit
extraction, bucket recombination, packed twiddle mulmod) dominate.

This times, on one radix-128 leaf level at the m=2^20 shape (plain-XLA
forms of the same math the Pallas kernel runs — tiling-independent):

  full     : extract -> T^2 int8 matmuls -> recombine -> twiddle -> pack
  epilogue : extract -> (reuse first bucket, no matmuls) -> recombine
             -> twiddle -> pack        [VPU + HBM only]
  matmul   : extract -> T^2 matmuls -> sum buckets raw  [MXU + extract]

full - epilogue ~ MXU contribution; epilogue alone ~ the VPU floor the
roofline must use. Prints one JSON line for BENCH_NOTES.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, _rand_planes, measure_marginal


def main():
    m_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lambda_snark_tpu.core import field
    from lambda_snark_tpu.core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
    from lambda_snark_tpu.ops.limb import modulus_ctx
    from lambda_snark_tpu.ops import modarith, ntt_mxu

    m = 1 << m_log2
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    plan = ntt_mxu.mxu_ntt_plan(m, omega)
    ctx = modulus_ctx(q)
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(_rand_planes(rng, ctx.d, 1, m, ctx.q_digits[-1]))
    x2 = jax.jit(ntt_mxu.pack_planes_jnp)(x4)
    rows = m // 128
    x2r = jnp.reshape(x2, (2, rows, 128))

    # walk the plan tree to a 128-leaf DftMatmulPlan
    node = plan
    while getattr(node, "leaf", None) is None:
        node = node.plan_r
    w_bal = jnp.asarray(node.leaf.w_subs_bal)

    out = {"m": m, "platform": str(jax.devices()[0])}

    def full(v):
        return ntt_mxu._leaf_math_packed(v, w_bal, None, True)

    def epilogue(v):
        subs = modarith.cpu_fusion_barrier(
            ntt_mxu._extract_balanced_packed(v)
        )
        # skip the matmuls: synthesize buckets from the extracted digits
        # (same count/dtype as the real bucket list -> same recombine work)
        buckets = [
            (subs[i % len(subs)].astype(jnp.int32) << jnp.int32(8))
            for i in range(2 * ntt_mxu._TB - 1)
        ]
        acc = ntt_mxu._recombine_goldilocks_bal(buckets)
        return ntt_mxu.pack_planes_jnp(acc)

    def matmul_only(v):
        subs = modarith.cpu_fusion_barrier(
            ntt_mxu._extract_balanced_packed(v)
        )
        buckets = ntt_mxu._buckets_bal(subs, w_bal)
        s = buckets[0]
        for b in buckets[1:]:
            s = s + b
        # chainable output: same (2, rows, 128) uint32 shape as the input
        su = s.astype(jnp.uint32)
        return jnp.stack([su & jnp.uint32(0xFFFF), su >> jnp.uint32(16)])

    for name, fn in (("full", full), ("epilogue", epilogue),
                     ("matmul_only", matmul_only)):
        per = measure_marginal(fn, x2r, k_large=129, iters=6)
        out[f"{name}_us"] = round(per * 1e6, 1)
        print(f"# {name}: {per*1e6:.1f} us/level", flush=True)

    out["mxu_share_us"] = round(out["full_us"] - out["epilogue_us"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
