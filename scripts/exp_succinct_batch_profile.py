"""cProfile of the warm batched succinct prover (S statements, m = 2^13)."""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_succinct_batch_timing import build, witnesses_for  # noqa: E402

from lambda_snark_tpu.core.params import NTT_MODULUS  # noqa: E402


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compile_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
    from lambda_snark_tpu.proof.succinct_batch import prove_r1cs_succinct_batch

    m = 1 << 13
    s_batch = int(os.environ.get("S_BATCH", "16"))
    r1cs = build(m).build()
    ctx = setup(
        Params(SecurityLevel.BITS128, Profile.ring_b(m, 1, NTT_MODULUS, 3.19))
    )
    ws = witnesses_for(m, s_batch)
    seeds = list(range(100, 100 + s_batch))
    t0 = time.time()
    prove_r1cs_succinct_batch(r1cs, ws, ctx, seeds, device_lde=True)
    print(f"cold: {time.time()-t0:.1f}s")
    t0 = time.time()
    prove_r1cs_succinct_batch(r1cs, ws, ctx, seeds, device_lde=True)
    print(f"warm: {time.time()-t0:.2f}s")

    prof = cProfile.Profile()
    prof.enable()
    prove_r1cs_succinct_batch(r1cs, ws, ctx, seeds, device_lde=True)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    main()
