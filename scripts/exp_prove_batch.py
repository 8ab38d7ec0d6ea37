"""Real-TPU experiment: prove-stage throughput vs batch size.

Usage: python scripts/exp_prove_batch.py [m] [batches...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, measure_marginal


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batches = [int(v) for v in sys.argv[2:]] or [16, 64, 256]
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lambda_snark_tpu import Params, Profile, SecurityLevel
    from lambda_snark_tpu.commit.lwe import LweContext
    from lambda_snark_tpu.commit.lwe_jax import DeviceCommitContext
    from lambda_snark_tpu.core.params import NTT_FRIENDLY_MODULUS
    from lambda_snark_tpu.ops import modarith
    from lambda_snark_tpu.ops.limb import modulus_ctx
    from lambda_snark_tpu.pipeline import ProvePlan, prove_stage_batch

    q = NTT_FRIENDLY_MODULUS
    n_ring = m
    params = Params(
        SecurityLevel.BITS128, Profile.ring_b(n=n_ring, k=2, q=q, sigma=3.19)
    )
    ctx = LweContext(params, context_seed=1)
    dctx = DeviceCommitContext.from_host(ctx)
    pp_fused = ProvePlan.create(m, q, dctx, fused=True)
    pp_xla = ProvePlan.create(m, q, dctx, fused=False)
    ctxq = modulus_ctx(q)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(0)
    out = {"m": m, "platform": str(jax.devices()[0])}

    for batch in batches:
        def planes():
            pl_ = rng.integers(0, 1 << 16, size=(3, batch, m), dtype=np.uint32)
            pl_[2] %= ctxq.q_digits[-1]
            return jnp.asarray(pl_)

        a_e, b_e = planes(), planes()
        c_e = jax.jit(lambda a, b: modarith.mul_mod(ctxq, a, b))(a_e, b_e)

        for tag, pp in (("fused", pp_fused), ("xla", pp_xla)):
            def step(carry):
                a, b, c = carry
                q_pl, a_pl, b_pl, _c, comm, _v = prove_stage_batch(
                    pp, a, b, c, key
                )
                mixed = modarith.add_mod(ctxq, q_pl, comm[:3, :, :m])
                return (mixed, a_pl, b_pl)

            t0 = time.time()
            per = measure_marginal(step, (a_e, b_e, c_e), k_large=9, iters=4)
            out[f"batch{batch}_{tag}_s"] = per
            out[f"batch{batch}_{tag}_proofs_per_s"] = batch / per
            print(f"# batch {batch} [{tag}]: {per*1e3:.3f} ms -> "
                  f"{batch/per:,.0f} proofs/s (wall {time.time()-t0:.0f}s)",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
