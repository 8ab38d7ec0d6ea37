"""Aggregate-proof scaling curve: m x S sweep of kind-8 (ONE shared FRI)
vs kind-7 (per-statement FRI) — bytes/statement and proofs/s.

VERDICT rounds 2-3 asked for the curve behind the mode's amortization
claim; this prints the BENCH_NOTES table from one process (same-run
numbers, comparable across cells). Run on the real chip:

    python scripts/exp_aggregate_curve.py            # full sweep
    SWEEP_M=1024,8192 SWEEP_S=16,64 python scripts/exp_aggregate_curve.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compile_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _succinct_instance
    from lambda_snark_tpu.proof.aggregate import (
        prove_r1cs_succinct_aggregate,
        verify_r1cs_succinct_aggregate,
    )
    from lambda_snark_tpu.proof.succinct_batch import prove_r1cs_succinct_batch

    ms = [int(v) for v in os.environ.get(
        "SWEEP_M", "1024,2048,4096,8192").split(",")]
    ss = [int(v) for v in os.environ.get("SWEEP_S", "16,64").split(",")]

    print("| m | S | kind-8 proofs/s | kind-8 B/stmt | kind-7 proofs/s | "
          "kind-7 B/stmt | bytes ratio |")
    print("|---|---|---|---|---|---|---|")
    for m in ms:
        for s_batch in ss:
            r1cs, witnesses, seeds, ctx = _succinct_instance(m, s_batch)
            # warm both paths (compile), then time
            agg = prove_r1cs_succinct_aggregate(
                r1cs, witnesses, ctx, seeds, device_lde=True
            )
            t0 = time.time()
            agg = prove_r1cs_succinct_aggregate(
                r1cs, witnesses, ctx, seeds, device_lde=True
            )
            t_agg = time.time() - t0
            assert verify_r1cs_succinct_aggregate(
                agg, [[1]] * s_batch, r1cs
            ), f"aggregate verify failed m={m} S={s_batch}"
            batch = prove_r1cs_succinct_batch(
                r1cs, witnesses, ctx, seeds, device_lde=True
            )
            t0 = time.time()
            batch = prove_r1cs_succinct_batch(
                r1cs, witnesses, ctx, seeds, device_lde=True
            )
            t_sep = time.time() - t0
            agg_bytes = len(agg.to_bytes())
            sep_bytes = sum(len(p.to_bytes()) for p in batch)
            print(
                f"| 2^{m.bit_length()-1} | {s_batch} "
                f"| {s_batch / t_agg:.1f} | {agg_bytes / s_batch:.0f} "
                f"| {s_batch / t_sep:.1f} | {sep_bytes / s_batch:.0f} "
                f"| {agg_bytes / sep_bytes:.3f} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
