"""Real-TPU: packed m=2^20 pipeline breakdown — leaves vs transposes.

Times (a) the full packed transform, (b) the three leaf kernels chained on
fixed layouts without the inter-level transposes/reshapes. The difference
is what transpose fusion (ROADMAP #4) could recover.
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
    from lambda_snark_tpu.ops import ntt_mxu

    m = 1 << m_log2
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    plan = ntt_mxu.mxu_ntt_plan(m, omega)
    ctx = modulus_ctx(q)
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(_rand_planes(rng, ctx.d, 1, m, ctx.q_digits[-1]))
    x2 = jax.jit(ntt_mxu.pack_planes_jnp)(x4)

    out = {"m": m, "platform": str(jax.devices()[0])}

    def run(name, fn, inp):
        # inline measure_marginal with raw pair debugging
        from jax import lax

        def chained(k):
            @jax.jit
            def r(v):
                return lax.fori_loop(0, k, lambda _, acc: fn(acc), v)
            return r

        def materialize(y):
            leaf = jax.tree_util.tree_leaves(y)[0]
            np.asarray(leaf[(0,) * leaf.ndim])

        t0 = time.time()
        run_s, run_l = chained(1), chained(33)
        materialize(run_s(inp)); materialize(run_l(inp))
        diffs = []
        for _ in range(6):
            ts = time.time(); materialize(run_s(inp)); ts = time.time() - ts
            tl = time.time(); materialize(run_l(inp)); tl = time.time() - tl
            diffs.append(tl - ts)
            print(f"#   {name} pair: small {ts*1e3:.1f} ms, large {tl*1e3:.1f} ms",
                  flush=True)
        best = min(d for d in diffs if d > 0) if any(d > 0 for d in diffs) else 0
        per = best / 32
        out[name + "_s"] = per
        print(f"# {name}: {per*1e6:.1f} us (wall {time.time()-t0:.0f}s)",
              flush=True)

    run("full_packed", lambda v: ntt_mxu._apply_packed(plan, v), x2)

    # leaves only: same kernels, fixed layouts, no transposes between
    leaf_r = plan.plan_r.leaf           # 128-point
    inner = plan.plan_c                 # 8192 plan: r=64, c=128
    leaf_c1 = inner.plan_r.leaf         # 64-point
    leaf_c2 = inner.plan_c.leaf         # 128-point
    rows1 = m // leaf_r.b

    def leaves_only(v):
        y = ntt_mxu._leaf_packed(leaf_r, v.reshape(2, rows1, leaf_r.b),
                                 plan.tw_packed)
        z = ntt_mxu._leaf_packed(leaf_c1,
                                 y.reshape(2, m // leaf_c1.b, leaf_c1.b),
                                 inner.tw_packed)
        w = ntt_mxu._leaf_packed(leaf_c2,
                                 z.reshape(2, m // leaf_c2.b, leaf_c2.b),
                                 None)
        return w.reshape(v.shape)

    run("leaves_only", leaves_only, x2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
