"""MXU int8-matmul NTT vs golden host NTT (bit-exactness)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import NTT_MODULUS, NTT_PRIMITIVE_ROOT
from lambda_snark_tpu.ops import ntt_mxu
from lambda_snark_tpu.ops.limb import from_limbs, to_limbs
from lambda_snark_tpu.r1cs import poly

P = NTT_MODULUS


def _omega(m):
    return field.mod_pow(NTT_PRIMITIVE_ROOT, (1 << 32) // m, P)


def test_subdigit_extraction_roundtrip():
    rng = random.Random(1)
    vals = [rng.randrange(P) for _ in range(64)] + [0, 1, P - 1]
    planes = jnp.asarray(to_limbs(np.array([vals], dtype=object), 4))
    subs = ntt_mxu._extract_subdigits(planes)
    for idx, v in enumerate(vals):
        got = sum(int(subs[t][0, idx]) << (7 * t) for t in range(ntt_mxu._T))
        assert got == v, idx


@pytest.mark.parametrize("b", [8, 32, 128])
def test_dft_matmul_leaf_vs_golden(b):
    omega = _omega(b)
    plan = ntt_mxu.DftMatmulPlan.create(b, omega)
    rng = random.Random(b)
    rows = 3
    data = [[rng.randrange(P) for _ in range(b)] for _ in range(rows)]
    x = jnp.asarray(to_limbs(np.array(data, dtype=object), 4))
    got = np.asarray(ntt_mxu.dft_matmul_apply(plan, x))
    for r in range(rows):
        want = poly.ntt_forward(data[r], P, omega)
        assert [int(v) for v in from_limbs(got[:, r])] == want, r


@pytest.mark.parametrize("m", [256, 4096])
def test_mxu_four_step_vs_golden(m):
    plan = ntt_mxu.mxu_ntt_plan(m, leaf_size=64)
    rng = random.Random(m)
    data = [rng.randrange(P) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array([data], dtype=object), 4))
    got = np.asarray(ntt_mxu.ntt_forward_mxu(plan, x))
    want = poly.ntt_forward(data, P, _omega(m))
    assert [int(v) for v in from_limbs(got[:, 0])] == want


@pytest.mark.parametrize("b", [64, 128])
def test_fused_pallas_leaf_vs_xla(b):
    """The VMEM-fused leaf (incl. block-diagonal lane packing for B=64)
    must match the XLA bucket path bit-for-bit."""
    omega = _omega(b)
    plan = ntt_mxu.DftMatmulPlan.create(b, omega)
    rng = random.Random(1000 + b)
    rows = 256 // (128 // b)  # lane-packed rows must tile evenly
    data = [[rng.randrange(P) for _ in range(b)] for _ in range(rows)]
    x = jnp.asarray(to_limbs(np.array(data, dtype=object), 4))
    want = np.asarray(ntt_mxu.dft_matmul_apply(plan, x))
    got = np.asarray(ntt_mxu.dft_matmul_apply_pallas(plan, x))
    assert (got == want).all()


@pytest.mark.parametrize("m", [4096])
def test_mxu_four_step_fused_vs_golden(m):
    plan = ntt_mxu.mxu_ntt_plan(m)
    rng = random.Random(70 + m)
    data = [rng.randrange(P) for _ in range(m)]
    x = jnp.asarray(to_limbs(np.array([data] * 2, dtype=object), 4))
    got = np.asarray(ntt_mxu.ntt_forward_mxu(plan, x, fused=True))
    want = poly.ntt_forward(data, P, _omega(m))
    for r in range(2):
        assert [int(v) for v in from_limbs(got[:, r])] == want


@pytest.mark.parametrize("m", [256, 1024])
def test_mxu_packed_pipeline_vs_golden(m):
    """Packed 2-word pipeline (twiddles fused in-leaf) is bit-exact.

    Small sizes only on CPU: XLA-CPU compiles of the packed interpret-mode
    kernel are pathologically slow at production tiles (minutes); the
    m=2^20 packed path is cross-checked against the unpacked fused kernel
    on the real TPU by scripts/exp_mxu_fused.py. m=256 exercises the
    twiddle slice branch (period % tile == 0), m=1024 the pre-tile branch
    (period < tile)."""
    plan = ntt_mxu.mxu_ntt_plan(m)
    rng = random.Random(99 + m)
    data = [rng.randrange(P) for _ in range(m)]
    x4 = jnp.asarray(to_limbs(np.array([data] * 2, dtype=object), 4))
    x2 = ntt_mxu.pack_planes_jnp(x4)
    got2 = np.asarray(ntt_mxu.ntt_forward_mxu_packed(plan, x2))
    got4 = np.asarray(ntt_mxu.unpack_planes_jnp(jnp.asarray(got2)))
    want = poly.ntt_forward(data, P, _omega(m))
    for r in range(2):
        assert [int(v) for v in from_limbs(got4[:, r])] == want


def test_mxu_packed_roundtrip_inverse():
    """packed forward then packed inverse (scale folded in twiddle) == id."""
    m = 256
    fwd = ntt_mxu.mxu_ntt_plan(m)
    inv = ntt_mxu.mxu_intt_plan(m)
    rng = random.Random(12)
    data = [rng.randrange(P) for _ in range(m)]
    x4 = jnp.asarray(to_limbs(np.array([data] * 2, dtype=object), 4))
    x2 = ntt_mxu.pack_planes_jnp(x4)
    f2 = ntt_mxu.ntt_forward_mxu_packed(fwd, x2)
    b2 = np.asarray(ntt_mxu.ntt_forward_mxu_packed(inv, f2))
    b4 = np.asarray(ntt_mxu.unpack_planes_jnp(jnp.asarray(b2)))
    for r in range(2):
        assert [int(v) for v in from_limbs(b4[:, r])] == data


def test_balanced_extraction_exact():
    """Device balanced base-256 digits encode X or X - p exactly (int value
    == X mod p), including every boundary of the representability split."""
    rng = random.Random(5)
    vals = [rng.randrange(P) for _ in range(121)] + [
        0, 1, P - 1, P - 2, ntt_mxu._MAXB, ntt_mxu._MAXB + 1,
        ntt_mxu._MAXB - 1, 1 << 63, (1 << 63) - 1, (1 << 32), (1 << 32) - 1,
        P - (1 << 32),
    ]
    x4 = jnp.asarray(to_limbs(np.array([vals], dtype=object), 4))
    x2 = ntt_mxu.pack_planes_jnp(x4)
    subs = ntt_mxu._extract_balanced_packed(x2)
    for idx, v in enumerate(vals):
        got = sum(int(subs[t][0, idx]) << (8 * t) for t in range(ntt_mxu._TB))
        assert got % P == v, (idx, v, got)
        # the representative itself must be the canonical-range one
        assert got == (v if v <= ntt_mxu._MAXB else v - P), (idx, v)


def test_balanced_w_digits_exact():
    rng = random.Random(6)
    vals = np.array(
        [[rng.randrange(P) for _ in range(9)] + [0, 1, P - 1, ntt_mxu._MAXB,
                                                 ntt_mxu._MAXB + 1]],
        dtype=object,
    )
    subs = ntt_mxu._subdigit_planes_balanced_host(vals)
    for idx in range(vals.shape[1]):
        got = sum(int(subs[t, 0, idx]) << (8 * t) for t in range(ntt_mxu._TB))
        assert got % P == int(vals[0, idx])


@pytest.mark.parametrize("m", [256, 1024])
def test_mxu_packed_balanced_matches_7bit(m):
    """The balanced (8x8 matmul) and 7-bit (10x10) packed pipelines must be
    bit-identical; production routes to balanced (PACKED_BALANCED)."""
    plan = ntt_mxu.mxu_ntt_plan(m)
    rng = random.Random(42 + m)
    data = [rng.randrange(P) for _ in range(m - 2)] + [0, P - 1]
    x4 = jnp.asarray(to_limbs(np.array([data] * 2, dtype=object), 4))
    x2 = ntt_mxu.pack_planes_jnp(x4)
    got_bal = np.asarray(ntt_mxu.ntt_forward_mxu_packed(plan, x2, True))
    got_7 = np.asarray(ntt_mxu.ntt_forward_mxu_packed(plan, x2, False))
    assert (got_bal == got_7).all()


def test_pack_unpack_roundtrip():
    rng = random.Random(3)
    vals = [rng.randrange(P) for _ in range(256)] + [0, 1, P - 1]
    x4 = jnp.asarray(to_limbs(np.array([vals], dtype=object), 4))
    back = np.asarray(ntt_mxu.unpack_planes_jnp(ntt_mxu.pack_planes_jnp(x4)))
    assert (back == np.asarray(x4)).all()


def test_mxu_boundary_values():
    b = 16
    plan = ntt_mxu.DftMatmulPlan.create(b, _omega(b))
    data = [P - 1] * b
    x = jnp.asarray(to_limbs(np.array([data], dtype=object), 4))
    got = [int(v) for v in from_limbs(np.asarray(ntt_mxu.dft_matmul_apply(plan, x))[:, 0])]
    want = poly.ntt_forward(data, P, _omega(b))
    assert got == want


def test_fold_columns_goldilocks_direct_extremes():
    """Direct check of the digit-level weight fold (round-4 rewrite)
    against Python-int reduction, incl. maxed-out column accumulators."""
    import jax
    import jax.numpy as jnp

    from lambda_snark_tpu.ops import ntt_mxu
    from lambda_snark_tpu.ops.limb import from_limbs_u64

    p = 18446744069414584321
    rng = np.random.default_rng(7)
    zero = jnp.zeros((4, 8), jnp.uint32)
    fold = jax.jit(
        lambda cs: ntt_mxu._fold_columns_goldilocks(list(cs), zero)
    )
    for trial in range(12):
        if trial == 0:
            cols_np = np.full((11, 4, 8), (1 << 21) - 1, dtype=np.uint32)
        elif trial == 1:
            cols_np = np.zeros((11, 4, 8), dtype=np.uint32)
        elif trial == 2:
            cols_np = np.full((11, 4, 8), 0xFFFF, dtype=np.uint32)
        else:
            cols_np = rng.integers(0, 1 << 21, size=(11, 4, 8), dtype=np.uint32)
        out = np.asarray(fold(tuple(jnp.asarray(c) for c in cols_np)))
        got = from_limbs_u64(out)
        for idx in np.ndindex(4, 8):
            want = sum(int(cols_np[j][idx]) << (16 * j) for j in range(11)) % p
            assert int(got[idx]) == want, (trial, idx)
