"""Real-TPU experiment: packed balanced MXU-NTT throughput vs batch size.

Per-transform time at m = 2^20 for batch 1 / 2 / 4 (same process): does
batching the leaf matmul rows improve MXU utilization enough to beat the
per-transform batch-1 number?

Usage: python scripts/exp_ntt_batch.py [m_log2]
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
    from lambda_snark_tpu.ops import ntt_mxu
    from lambda_snark_tpu.ops.limb import modulus_ctx

    m = 1 << m_log2
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    plan = ntt_mxu.mxu_ntt_plan(m, omega)
    ctx = modulus_ctx(q)
    rng = np.random.default_rng(0)
    out = {"m": m, "platform": str(jax.devices()[0])}
    for batch in (1, 2, 4):
        x4 = jnp.asarray(_rand_planes(rng, ctx.d, batch, m, ctx.q_digits[-1]))
        x2 = jax.jit(ntt_mxu.pack_planes_jnp)(x4)
        k_large = max(9, 65 // batch)
        per = measure_marginal(
            lambda v: ntt_mxu._apply_packed(plan, v), x2,
            k_large=k_large, iters=6,
        ) / batch
        out[f"batch{batch}_per_transform_s"] = per
        out[f"batch{batch}_gbutterfly_s"] = (m // 2) * m_log2 / per / 1e9
        print(f"# batch {batch}: {per*1e6:.1f} us/transform", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
