"""Real-TPU experiment: prove-stage component breakdown at production shape.

Times quotient (fused + xla), Gaussian sampling, and ring commitment
separately, same process. Usage: exp_prove_parts.py [m] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, measure_marginal


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lambda_snark_tpu import Params, Profile, SecurityLevel
    from lambda_snark_tpu.commit.lwe import LweContext
    from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext, commit_batch
    from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
    from lambda_snark_tpu.ops import modarith
    from lambda_snark_tpu.ops.limb import modulus_ctx
    from lambda_snark_tpu.ops.quotient_pallas import quotient_batch_fused
    from lambda_snark_tpu.pipeline import ProvePlan, quotient_batch

    q = NTT_FRIENDLY_MODULUS
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=m, k=2, q=q, sigma=3.19)
    )
    ctx = LweContext(params, context_seed=1)
    dctx = DeviceCommitContext.from_host(ctx)
    pp = ProvePlan.create(m, q, dctx, fused=False)
    ctxq = modulus_ctx(q)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    out = {"m": m, "batch": batch, "platform": str(jax.devices()[0])}

    def planes(d=3):
        pl_ = rng.integers(0, 1 << 16, size=(d, batch, m), dtype=np.uint32)
        pl_[d - 1] %= ctxq.q_digits[-1]
        return jnp.asarray(pl_)

    a_e, b_e = planes(), planes()
    c_e = jax.jit(lambda a, b: modarith.mul_mod(ctxq, a, b))(a_e, b_e)

    def run(name, fn, inp):
        t0 = time.time()
        per = measure_marginal(fn, inp, k_large=9, iters=4)
        out[name + "_s"] = per
        print(f"# {name}: {per*1e3:.3f} ms/batch (wall {time.time()-t0:.0f}s)",
              flush=True)

    def q_fused(carry):
        a, b, c = carry
        qc, ap, bp, cp, _v = quotient_batch_fused(pp.qplan, a, b, c)
        return (qc, ap, bp)

    def q_xla(carry):
        a, b, c = carry
        qc, ap, bp, cp, _v = quotient_batch(pp, a, b, c)
        return (qc, ap, bp)

    from lambda_snark_tpu.core.params import ROOTS_OF_UNITY_45BIT
    from lambda_snark_tpu.ops.ntt_mxu_q45 import (
        q45_quotient_plan, quotient_batch_mxu,
    )

    qp_mxu = q45_quotient_plan(m, ROOTS_OF_UNITY_45BIT[2 * m])

    def q_mxu(carry):
        a, b, c = carry
        qc, ap, bp, cp, _v = quotient_batch_mxu(qp_mxu, a, b, c)
        return (qc, ap, bp)

    # on-device bit-exactness at production shape
    want = [np.asarray(t) for t in jax.jit(
        lambda a, b, c: quotient_batch(pp, a, b, c)[:4]
    )(a_e, b_e, c_e)]
    got = [np.asarray(t) for t in jax.jit(
        lambda a, b, c: quotient_batch_mxu(qp_mxu, a, b, c)[:4]
    )(a_e, b_e, c_e)]
    ok = all((w == g).all() for w, g in zip(want, got))
    out["mxu_quotient_bitexact"] = bool(ok)
    print(f"# mxu quotient bit-exact: {ok}", flush=True)

    run("quotient_mxu", q_mxu, (a_e, b_e, c_e))
    run("quotient_fused", q_fused, (a_e, b_e, c_e))
    run("quotient_xla", q_xla, (a_e, b_e, c_e))

    # commitment alone: message planes (Dp, B, n)
    msg = jnp.concatenate(
        [a_e, jnp.zeros((1, batch, m), jnp.uint32)], axis=0
    )

    def commit_step(msgp):
        c_planes, _s, _e = commit_batch(dctx, msgp, key)
        return c_planes[:4, :, :m]

    run("commit", commit_step, msg)

    from lambda_snark_tpu.ops.ring_mxu import RingMxuPlan, commit_batch_mxu

    rplan = RingMxuPlan.create(ctx)

    def commit_mxu_step(msgp):
        c_planes, _s, _e = commit_batch_mxu(rplan, dctx, msgp, key)
        return c_planes[:4, :, :m]

    want = np.asarray(jax.jit(commit_step)(msg))
    got = np.asarray(jax.jit(commit_mxu_step)(msg))
    out["commit_mxu_bitexact"] = bool((want == got).all())
    print(f"# commit mxu bit-exact: {out['commit_mxu_bitexact']}", flush=True)
    run("commit_mxu", commit_mxu_step, msg)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
