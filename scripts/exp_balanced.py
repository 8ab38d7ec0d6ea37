"""Real-TPU experiment: balanced base-256 vs 7-bit subdigit MXU pipelines.

Same-run A/B of the three production MXU paths:
  1. Goldilocks packed NTT m=2^20 (ntt_mxu, 64 vs 100 int8 matmuls/leaf)
  2. q45 quotient chain m=4096 batch 256 (ntt_mxu_q45, 36 vs 49)
  3. ring commitment n=4096 batch 256 (ring_mxu, 64 vs 100)
plus on-device bit-exactness of each balanced path vs its 7-bit twin.

Usage: python scripts/exp_balanced.py [section ...]  (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, _rand_planes, measure_marginal


def main():
    sections = set(sys.argv[1:]) or {"ntt", "q45", "ring"}
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lambda_snark_tpu.core import field
    from lambda_snark_tpu.core.params import (
        NTT_FRIENDLY_MODULUS,
        NTT_MODULUS,
        NTT_PRIMITIVE_ROOT,
    )
    from lambda_snark_tpu.ops import modarith, ntt_mxu, ntt_mxu_q45
    from lambda_snark_tpu.ops.limb import modulus_ctx

    out = {"platform": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    if "ntt" in sections:
        m = 1 << 20
        q = NTT_MODULUS
        omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
        plan = ntt_mxu.mxu_ntt_plan(m, omega)
        ctx = modulus_ctx(q)
        x4 = jnp.asarray(_rand_planes(rng, ctx.d, 1, m, ctx.q_digits[-1]))
        x2 = jax.jit(ntt_mxu.pack_planes_jnp)(x4)
        want = np.asarray(
            jax.jit(lambda v: ntt_mxu._apply_packed(plan, v, False))(x2)
        )
        got = np.asarray(
            jax.jit(lambda v: ntt_mxu._apply_packed(plan, v, True))(x2)
        )
        out["ntt_m2pow20_bitexact"] = bool((want == got).all())
        print(f"# ntt bit-exact: {out['ntt_m2pow20_bitexact']}", flush=True)
        for name, bal in (("bal", True), ("7bit", False)):
            t0 = time.time()
            per = measure_marginal(
                lambda v, b=bal: ntt_mxu._apply_packed(plan, v, b),
                x2, k_large=65, iters=6,
            )
            out[f"ntt_m2pow20_{name}_s"] = per
            out[f"ntt_m2pow20_{name}_gbutterfly_s"] = (
                (m // 2) * 20 / per / 1e9
            )
            out[f"ntt_{name}_wall_s"] = round(time.time() - t0, 1)
            print(f"# ntt {name}: {per*1e6:.1f} us/transform", flush=True)

    if "q45" in sections:
        m, batch = 4096, 256
        q = NTT_FRIENDLY_MODULUS
        ctx3 = modulus_ctx(q)
        psi = field.mod_pow(3, (q - 1) // (2 * m), q)
        qp = ntt_mxu_q45.q45_quotient_plan(m, psi)

        def planes3():
            pl_ = rng.integers(0, 1 << 16, size=(3, batch, m), dtype=np.uint32)
            pl_[2] %= ctx3.q_digits[-1]
            return jnp.asarray(pl_)

        a_e, b_e = planes3(), planes3()
        c_e = jax.jit(lambda a, b: modarith.mul_mod(ctx3, a, b))(a_e, b_e)
        w_parts = jax.jit(
            lambda a, b, c: ntt_mxu_q45.quotient_batch_mxu(qp, a, b, c, False)
        )(a_e, b_e, c_e)
        g_parts = jax.jit(
            lambda a, b, c: ntt_mxu_q45.quotient_batch_mxu(qp, a, b, c, True)
        )(a_e, b_e, c_e)
        out["q45_bitexact"] = bool(
            all((np.asarray(g) == np.asarray(w)).all()
                for g, w in zip(g_parts, w_parts))
        )
        print(f"# q45 bit-exact: {out['q45_bitexact']}", flush=True)

        def q_step(bal):
            def step(carry):
                a, b, c = carry
                qq, ap, bp, _cp, _v = ntt_mxu_q45.quotient_batch_mxu(
                    qp, a, b, c, bal
                )
                return (qq, ap, bp)
            return step

        for name, bal in (("bal", True), ("7bit", False)):
            per = measure_marginal(
                q_step(bal), (a_e, b_e, c_e), k_large=17, iters=5
            )
            out[f"q45_quotient_m4096_b256_{name}_s"] = per
            print(f"# q45 quotient {name}: {per*1e3:.2f} ms/batch", flush=True)

    if "ring" in sections:
        from lambda_snark_tpu import Params, Profile, SecurityLevel
        from lambda_snark_tpu.commit.lwe import LweContext
        from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext
        from lambda_snark_tpu.ops.ring_mxu import (
            RingMxuPlan,
            pack_planes_jnp,
            ring_chain_mxu,
            unpack_planes_jnp,
        )

        n, k, batch = 4096, 2, 256
        q = NTT_FRIENDLY_MODULUS
        params = Params(
            SecurityLevel.BITS128, Profile.ring_b(n=n, k=k, q=q, sigma=3.19)
        )
        host = LweContext(params, context_seed=1)
        plan = RingMxuPlan.create(host)
        ctx4 = modulus_ctx(NTT_MODULUS)
        s2 = jnp.stack([
            jax.jit(pack_planes_jnp)(jnp.asarray(
                _rand_planes(rng, 4, batch, n, ctx4.q_digits[-1])
            ))
            for _ in range(k)
        ])
        me2 = jax.jit(pack_planes_jnp)(jnp.asarray(
            _rand_planes(rng, 4, batch, n, ctx4.q_digits[-1])
        ))
        want = np.asarray(ring_chain_mxu(plan, s2, me2, False))
        got = np.asarray(ring_chain_mxu(plan, s2, me2, True))
        out["ring_bitexact"] = bool((want == got).all())
        print(f"# ring bit-exact: {out['ring_bitexact']}", flush=True)

        def r_step(bal):
            def step(carry):
                s2_c, me2_c = carry
                c2 = ring_chain_mxu(plan, s2_c, me2_c, bal)
                # feed the commitment back in to keep the chain live
                return (s2_c.at[0].set(c2), me2_c)
            return step

        for name, bal in (("bal", True), ("7bit", False)):
            per = measure_marginal(
                r_step(bal), (s2, me2), k_large=17, iters=5
            )
            out[f"ring_commit_n4096_b256_{name}_s"] = per
            print(f"# ring commit {name}: {per*1e3:.2f} ms/batch", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
