"""Benchmark driver: NTT throughput on the real chip.

Prints ONE JSON line:
    {"metric": "ntt_mbutterflies_per_s_chip_m2pow20", "value": ...,
     "unit": "Mbutterflies/s", "vs_baseline": ...}

Metric: radix-2-equivalent butterfly throughput (m/2 * log2 m butterflies
per transform) of the m = 2^20 NTT over the Goldilocks modulus
(the reference's `NTT_MODULUS`; the 45-bit NTT-friendly modulus
17592169062401 tops out at m = 2^13 — its multiplicative group has 2-adicity
13 — so 2^20 is only meaningful over Goldilocks; the q45 kernel is measured
as a secondary metric in BENCH_NOTES.md).

vs_baseline: speedup over the reference's own extrapolated m=2^20 NTT time
of 218 ms (docs/ntt-implementation.md section 6; BASELINE.md "NTT speedup"
row) — the only published large-m number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_M20_SECONDS = 0.218  # reference extrapolated NTT time at m=2^20


def _rand_planes(rng, d, batch, m, q_top_digit):
    """Random field elements as digit planes (top digit < q's top digit)."""
    import numpy as np

    planes = rng.integers(0, 1 << 16, size=(d, batch, m), dtype=np.uint32)
    planes[d - 1] %= max(q_top_digit, 1)
    return planes


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_compile_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_ntt(m_log2: int = 20, batch: int = 1, iters: int = 10):
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lambda_snark_tpu.core import field
    from lambda_snark_tpu.core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
    from lambda_snark_tpu.ops.limb import modulus_ctx
    from lambda_snark_tpu.ops import ntt_large

    from jax import lax

    m = 1 << m_log2
    q = NTT_MODULUS
    omega = field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, q)
    fsp = ntt_large.four_step_plan(m, q, omega)
    ctx = modulus_ctx(q)
    rng = np.random.default_rng(0)
    top = ctx.q_digits[-1]
    x = jnp.asarray(_rand_planes(rng, ctx.d, batch, m, top))

    # Chain `chain` transforms inside ONE jitted call: the sandbox TPU sits
    # behind a relay with ~30 ms per-dispatch latency, so per-transform time
    # must be measured on-device, amortizing the dispatch.
    chain = 32

    @jax.jit
    def chained(v):
        return lax.fori_loop(
            0, chain, lambda _, acc: ntt_large._forward(fsp, acc), v
        )

    t0 = time.time()
    y = chained(x)
    y.block_until_ready()
    compile_s = time.time() - t0
    y = chained(x)
    y.block_until_ready()

    t0 = time.time()
    for _ in range(iters):
        y = chained(y)
        y.block_until_ready()
    elapsed = time.time() - t0
    per_transform = elapsed / (iters * chain * batch)
    butterflies = (m // 2) * m_log2
    mb_s = butterflies / per_transform / 1e6
    return {
        "m": m,
        "batch": batch,
        "chain": chain,
        "compile_s": round(compile_s, 2),
        "per_transform_s": per_transform,
        "mbutterflies_per_s": mb_s,
        "platform": str(jax.devices()[0]),
    }


def main():
    # Default env on the sandbox pins the axon (real TPU) platform; honor it.
    try:
        res = bench_ntt(m_log2=20, batch=1, iters=10)
        value = res["mbutterflies_per_s"]
        vs = REF_M20_SECONDS / res["per_transform_s"]
        line = {
            "metric": "ntt_mbutterflies_per_s_chip_m2pow20",
            "value": round(value, 1),
            "unit": "Mbutterflies/s",
            "vs_baseline": round(vs, 1),
        }
        extra = res
    except Exception as e:  # noqa: BLE001 - always emit the one JSON line
        line = {
            "metric": "ntt_mbutterflies_per_s_chip_m2pow20",
            "value": 0.0,
            "unit": "Mbutterflies/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }
        extra = None
    print(json.dumps(line))
    if extra is not None:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
            "w",
        ) as f:
            json.dump(extra, f, indent=2, default=str)


if __name__ == "__main__":
    main()
