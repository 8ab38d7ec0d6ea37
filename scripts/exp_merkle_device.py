"""Real-TPU validation + measurement of the device Merkle/Keccak path.

Checks bit-exactness of the batched Keccak-f[1600] kernel on the actual
chip (Mosaic/XLA-TPU lowering differs from CPU), then measures:
- raw SHA3-256 node-hash throughput (marginal-differenced, relay-safe)
- whole-tree build wall time (incl. host<->device transfers) vs hashlib
- end-to-end succinct prove wall time, device vs host hashing

Run: python scripts/exp_merkle_device.py  (axon TPU; ~170 s first contact)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import jax

    bench._enable_compile_cache()
    import hashlib
    import struct

    from lambda_snark_tpu.ops import keccak_jax as kj
    from lambda_snark_tpu.proof import fri
    from lambda_snark_tpu.proof.merkle import MerkleTree

    print("platform:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # 1. bit-exactness on the real chip
    v_lo = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    v_hi = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    t0 = time.time()
    levels = kj.merkle_levels_u64_pairs(v_lo, v_hi, min_rows=1)
    print(f"first tree (compile+run): {time.time() - t0:.1f}s")
    root = kj.digest_words_to_bytes(levels[-1])[0].tobytes()
    host = MerkleTree(
        [struct.pack("<QQ", int(v_lo[i]), int(v_hi[i])) for i in range(256)]
    )
    assert root == host.root, "DEVICE KECCAK MISMATCH vs hashlib"
    print("bit-exactness on device: OK")

    # 2. raw node-hash throughput: digest -> hash_nodes(d, d) chains
    import jax.numpy as jnp

    batch = 1 << 19
    d0 = jnp.asarray(  # lane-major [8 digest words, batch]
        rng.integers(0, 1 << 32, size=(8, batch), dtype=np.uint64).astype(np.uint32)
    )
    per_call = bench.measure_marginal(
        lambda d: kj.hash_nodes(d, d), d0, k_large=17, iters=5
    )
    print(
        f"node-hash throughput: {batch / per_call / 1e6:.1f} Mhash/s "
        f"({per_call / batch * 1e9:.1f} ns/hash, batch {batch})"
    )

    # 3. whole-tree wall time (transfers included) vs hashlib
    for log_half in (16, 18):
        half = 1 << log_half
        vals = rng.integers(0, 1 << 63, size=2 * half, dtype=np.uint64)
        fri.DEVICE_HASH = True
        t0 = time.time()
        tree_dev = fri.commit_codeword(vals)
        t_dev_cold = time.time() - t0
        t0 = time.time()
        tree_dev = fri.commit_codeword(vals)
        t_dev = time.time() - t0
        fri.DEVICE_HASH = False
        t0 = time.time()
        tree_host = fri.commit_codeword(vals)
        t_host = time.time() - t0
        assert tree_dev.root == tree_host.root
        print(
            f"tree half=2^{log_half}: device {t_dev:.3f}s (cold {t_dev_cold:.1f}s) "
            f"vs host {t_host:.3f}s -> {t_host / t_dev:.1f}x"
        )

    # 4. end-to-end succinct prove (Goldilocks), device vs host hashing
    import random

    from lambda_snark_tpu import Params, Profile, SecurityLevel, setup
    from lambda_snark_tpu.core.params import NTT_MODULUS
    from lambda_snark_tpu.proof.succinct import prove_r1cs_succinct, verify_r1cs_succinct
    from lambda_snark_tpu.r1cs.circuit import CircuitBuilder

    m = 1 << 12
    builder = CircuitBuilder(NTT_MODULUS)
    builder.alloc_var()
    xs = builder.alloc_vars(m)
    ys = builder.alloc_vars(m)
    builder.set_public_inputs(1)
    for x, y in zip(xs, ys):
        builder.mul_gate(x, x, y)
    r = random.Random(1)
    vals = [r.randrange(NTT_MODULUS) for _ in range(m)]
    w = [1] + vals + [v * v % NTT_MODULUS for v in vals]
    r1cs = builder.build()
    ctx = setup(
        Params(SecurityLevel.BITS128, Profile.ring_b(m, 1, NTT_MODULUS, 3.19))
    )  # ring degree >= quotient length m

    for dev_hash, dev_lde, tag in (
        (False, False, "host"),
        (True, True, "device (cold)"),
        (True, True, "device"),
    ):
        fri.DEVICE_HASH = dev_hash
        t0 = time.time()
        proof = prove_r1cs_succinct(
            r1cs, w, ctx, seed=7, device_lde=dev_lde
        )
        dt = time.time() - t0
        print(f"succinct prove m=2^12 [{tag}]: {dt:.2f}s")
    fri.DEVICE_HASH = True
    ok = verify_r1cs_succinct(proof, [1], r1cs)
    print("verify:", ok)
    assert ok


if __name__ == "__main__":
    main()
