"""Real-TPU experiment: fused-Pallas MXU-NTT vs XLA-MXU vs butterfly four-step.

Usage: python scripts/exp_mxu_fused.py [m_log2]
Prints one JSON dict with per-transform seconds for each path (same process,
same methodology: bench.measure_marginal).
"""

import json
import os
import sys
import time

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
    from lambda_snark_tpu.ops import ntt_large, ntt_mxu

    m = 1 << m_log2
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    ctx = modulus_ctx(q)
    rng = np.random.default_rng(0)
    x = jnp.asarray(_rand_planes(rng, ctx.d, 1, m, ctx.q_digits[-1]))

    out = {"m": m, "platform": str(jax.devices()[0])}

    plan = ntt_mxu.mxu_ntt_plan(m, omega)
    fsp = ntt_large.four_step_plan(m, q, omega)

    def run(name, fn):
        t0 = time.time()
        per = measure_marginal(fn, x, k_large=17, iters=4)
        out[name + "_s"] = per
        out[name + "_wall_s"] = round(time.time() - t0, 1)
        print(f"# {name}: {per*1e6:.1f} us/transform", flush=True)

    x2 = jax.jit(ntt_mxu.pack_planes_jnp)(x)

    # on-device bit-exactness: packed pipeline == unpacked fused pipeline
    want = np.asarray(jax.jit(lambda v: ntt_mxu._apply(plan, v, True))(x))
    got = np.asarray(
        jax.jit(
            lambda v: ntt_mxu.unpack_planes_jnp(ntt_mxu._apply_packed(plan, v))
        )(x2)
    )
    out["packed_bitexact"] = bool((want == got).all())
    print(f"# packed bit-exact vs fused: {out['packed_bitexact']}", flush=True)

    def run_packed(name, fn, inp):
        t0 = time.time()
        per = measure_marginal(fn, inp, k_large=17, iters=4)
        out[name + "_s"] = per
        out[name + "_wall_s"] = round(time.time() - t0, 1)
        print(f"# {name}: {per*1e6:.1f} us/transform", flush=True)

    run_packed("mxu_packed", lambda v: ntt_mxu._apply_packed(plan, v), x2)
    run("mxu_fused", lambda v: ntt_mxu._apply(plan, v, True))
    run("butterfly_fourstep", lambda v: ntt_large._forward(fsp, v))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
