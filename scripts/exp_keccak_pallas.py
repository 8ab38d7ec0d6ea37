"""Validate + time the Pallas Keccak kernel on the real chip.

Checks bit-exactness of ops/keccak_pallas.py against the XLA path (which is
itself pinned to hashlib in tests/test_keccak.py), then measures Mhash/s for
both backends and for a full Merkle-tree build.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compile_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lambda_snark_tpu.ops import keccak_jax as kj
    from lambda_snark_tpu.ops import keccak_pallas as kp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import measure_marginal

    print("platform:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # --- correctness: leaves + nodes, odd batch shapes -----------------------
    for batch_shape in [(7,), (3, 1000), (1 << 13,)]:
        a0, a1, b0, b1 = (
            jnp.asarray(rng.integers(0, 1 << 32, size=batch_shape, dtype=np.uint64).astype(np.uint32))
            for _ in range(4)
        )
        t0 = time.time()
        d_pal = np.asarray(kp.hash_leaves(a0, a1, b0, b1))
        print(f"leaf pallas {batch_shape}: {time.time()-t0:.1f}s (incl compile)")
        d_ref = np.asarray(jax.jit(kj.hash_leaves)(a0, a1, b0, b1))
        assert (d_pal == d_ref).all(), f"leaf mismatch at {batch_shape}"
        left = jnp.asarray(
            rng.integers(0, 1 << 32, size=(8,) + batch_shape, dtype=np.uint64).astype(np.uint32)
        )
        right = jnp.asarray(
            rng.integers(0, 1 << 32, size=(8,) + batch_shape, dtype=np.uint64).astype(np.uint32)
        )
        t0 = time.time()
        n_pal = np.asarray(kp.hash_nodes(left, right))
        print(f"node pallas {batch_shape}: {time.time()-t0:.1f}s (incl compile)")
        n_ref = np.asarray(jax.jit(kj.hash_nodes)(left, right))
        assert (n_pal == n_ref).all(), f"node mismatch at {batch_shape}"
    print("bit-exact vs XLA path: OK")

    # --- throughput -----------------------------------------------------------
    batch = 1 << 19
    d0 = jnp.asarray(
        rng.integers(0, 1 << 32, size=(8, batch), dtype=np.uint64).astype(np.uint32)
    )
    per = measure_marginal(lambda d: kp.hash_nodes(d, d), d0, k_large=17, iters=5)
    print(f"pallas node hash: {batch/per/1e6:.1f} Mhash/s ({per*1e3:.2f} ms / 2^19)")
    per_x = measure_marginal(
        lambda d: kj.hash_nodes(d, d, True), d0, k_large=5, iters=3
    )
    print(f"XLA    node hash: {batch/per_x/1e6:.1f} Mhash/s ({per_x*1e3:.2f} ms / 2^19)")


if __name__ == "__main__":
    main()
