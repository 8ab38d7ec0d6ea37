"""Property-based suite (16 properties x 100 cases).

Parity with the reference proptest coverage (``TESTING.md:14-25``): algebraic
laws of the field/polynomial layer, constraint linearity, quotient existence,
transcript determinism, commitment homomorphism. Cases are seeded random
draws (deterministic, reproducible).
"""

import random

import pytest

from lambda_snark_tpu import (
    Challenge,
    Params,
    Profile,
    SecurityLevel,
)
from lambda_snark_tpu.commit import lwe
from lambda_snark_tpu.core import field
from lambda_snark_tpu.core.params import (
    NTT_FRIENDLY_MODULUS,
    ROOTS_OF_UNITY_45BIT,
)
from lambda_snark_tpu.r1cs import poly
from lambda_snark_tpu.r1cs.domain import Domain
from lambda_snark_tpu.r1cs.sparse import SparseMatrix

CASES = 100
Q = 17592186044423


def _rng(tag):
    return random.Random(hash(tag) & 0xFFFFFFFF)


def _rand_poly(rng, deg, q):
    return [rng.randrange(q) for _ in range(deg + 1)]


def test_prop_add_mod_group_laws():
    rng = _rng("add")
    for _ in range(CASES):
        a, b, c = (rng.randrange(Q) for _ in range(3))
        assert field.add_mod(a, b, Q) == field.add_mod(b, a, Q)
        assert field.add_mod(field.add_mod(a, b, Q), c, Q) == field.add_mod(
            a, field.add_mod(b, c, Q), Q
        )
        assert field.sub_mod(field.add_mod(a, b, Q), b, Q) == a


def test_prop_mul_distributes():
    rng = _rng("mul")
    for _ in range(CASES):
        a, b, c = (rng.randrange(Q) for _ in range(3))
        lhs = field.mul_mod(a, field.add_mod(b, c, Q), Q)
        rhs = field.add_mod(field.mul_mod(a, b, Q), field.mul_mod(a, c, Q), Q)
        assert lhs == rhs


def test_prop_pow_homomorphism():
    rng = _rng("pow")
    for _ in range(CASES):
        a = rng.randrange(1, Q)
        e1, e2 = rng.randrange(1 << 20), rng.randrange(1 << 20)
        assert field.mul_mod(
            field.mod_pow(a, e1, Q), field.mod_pow(a, e2, Q), Q
        ) == field.mod_pow(a, e1 + e2, Q)


def test_prop_inverse_roundtrip():
    rng = _rng("inv")
    for _ in range(CASES):
        a = rng.randrange(1, Q)
        inv = field.mod_inverse(a, Q)
        assert inv is not None and field.mul_mod(a, inv, Q) == 1


def test_prop_poly_eval_additive():
    rng = _rng("peval")
    for _ in range(CASES):
        f = _rand_poly(rng, rng.randrange(1, 8), Q)
        g = _rand_poly(rng, rng.randrange(1, 8), Q)
        x = rng.randrange(Q)
        lhs = poly.poly_eval(poly.poly_add(f, g, Q), x, Q)
        rhs = field.add_mod(poly.poly_eval(f, x, Q), poly.poly_eval(g, x, Q), Q)
        assert lhs == rhs


def test_prop_poly_mul_evaluation():
    rng = _rng("pmul")
    for _ in range(CASES):
        f = _rand_poly(rng, rng.randrange(1, 6), Q)
        g = _rand_poly(rng, rng.randrange(1, 6), Q)
        x = rng.randrange(Q)
        lhs = poly.poly_eval(poly.poly_mul(f, g, Q), x, Q)
        rhs = field.mul_mod(poly.poly_eval(f, x, Q), poly.poly_eval(g, x, Q), Q)
        assert lhs == rhs


def test_prop_constraint_linearity():
    rng = _rng("lin")
    for _ in range(CASES):
        m, n = rng.randrange(1, 5), rng.randrange(2, 6)
        dense = [[rng.randrange(3) for _ in range(n)] for _ in range(m)]
        mat = SparseMatrix.from_dense(dense)
        z1 = [rng.randrange(Q) for _ in range(n)]
        z2 = [rng.randrange(Q) for _ in range(n)]
        zsum = [field.add_mod(a, b, Q) for a, b in zip(z1, z2)]
        got = mat.mul_vec(zsum, Q)
        want = [
            field.add_mod(a, b, Q)
            for a, b in zip(mat.mul_vec(z1, Q), mat.mul_vec(z2, Q))
        ]
        assert got == want


def test_prop_quotient_exists_for_valid_witness():
    from test_r1cs import multiplication_gates, mult_witness

    rng = _rng("quot")
    for case in range(20):  # heavier cases, fewer draws
        m = rng.choice([1, 2, 3, 4])
        r1cs = multiplication_gates(m, Q)
        w = mult_witness(m, Q, seed=case)
        q_coeffs = r1cs.compute_quotient_poly(w)  # must not raise
        # identity at a random point
        x = rng.randrange(Q)
        a_p, b_p, c_p = r1cs.interpolations(w)
        lhs = field.mul_mod(
            poly.poly_eval(q_coeffs, x, Q), r1cs.eval_vanishing(x), Q
        )
        rhs = field.sub_mod(
            field.mul_mod(poly.poly_eval(a_p, x, Q), poly.poly_eval(b_p, x, Q), Q),
            poly.poly_eval(c_p, x, Q),
            Q,
        )
        assert lhs == rhs


def test_prop_interpolation_matches_points():
    rng = _rng("interp")
    for _ in range(30):
        m = rng.randrange(2, 7)
        dom = Domain.sequential(m, Q)
        evals = [rng.randrange(Q) for _ in range(m)]
        coeffs = poly.lagrange_interpolate(evals, dom)
        for i, pt in enumerate(dom.points()):
            assert poly.poly_eval(coeffs, pt, Q) == evals[i]


def test_prop_vanishing_zero_on_domain():
    rng = _rng("vanish")
    q45 = NTT_FRIENDLY_MODULUS
    for _ in range(30):
        m = rng.choice([4, 8, 16])
        dom = Domain.roots(m, q45, ROOTS_OF_UNITY_45BIT[m])
        for pt in dom.points():
            assert dom.eval_vanishing(pt) == 0
        x = rng.randrange(q45)
        if x not in dom.points():
            assert dom.eval_vanishing(x) != 0 or x in dom.points()


def test_prop_ntt_convolution_theorem():
    rng = _rng("conv")
    q45 = NTT_FRIENDLY_MODULUS
    for _ in range(30):
        m = rng.choice([4, 8, 16])
        omega = ROOTS_OF_UNITY_45BIT[m]
        a = [rng.randrange(q45) for _ in range(m)]
        b = [rng.randrange(q45) for _ in range(m)]
        fa = poly.ntt_forward(a, q45, omega)
        fb = poly.ntt_forward(b, q45, omega)
        prod = [field.mul_mod(x, y, q45) for x, y in zip(fa, fb)]
        got = poly.ntt_inverse(prod, q45, omega)
        # cyclic convolution
        want = [0] * m
        for i in range(m):
            for j in range(m):
                want[(i + j) % m] = field.add_mod(
                    want[(i + j) % m], field.mul_mod(a[i], b[j], q45), q45
                )
        assert got == want


def test_prop_challenge_determinism_and_sensitivity():
    rng = _rng("chal")
    for _ in range(CASES):
        pub = [rng.randrange(Q) for _ in range(rng.randrange(1, 4))]
        words = [rng.randrange(1 << 64) for _ in range(rng.randrange(1, 6))]
        c1 = Challenge.derive(pub, words, Q)
        c2 = Challenge.derive(pub, words, Q)
        assert c1 == c2 and c1.alpha < Q
        words2 = list(words)
        words2[0] ^= 1
        assert Challenge.derive(pub, words2, Q).hash != c1.hash


def test_prop_challenge_length_extension_guard():
    # moving an element between the public list and the commitment words must
    # change the hash (length prefixes provide domain separation)
    rng = _rng("chal2")
    for _ in range(50):
        pub = [rng.randrange(Q) for _ in range(2)]
        words = [rng.randrange(1 << 64) for _ in range(2)]
        c1 = Challenge.derive(pub, words, Q)
        c2 = Challenge.derive(pub + [words[0]], words[1:], Q)
        assert c1.hash != c2.hash


def test_prop_blinding_uniform_shift():
    from lambda_snark_tpu.proof.polynomial import Polynomial

    rng = _rng("blind")
    for case in range(50):
        f = Polynomial.from_witness(
            [rng.randrange(Q) for _ in range(rng.randrange(1, 6))], Q
        )
        r = Polynomial.random_blinding(f.degree(), Q, seed=case)
        x = rng.randrange(Q)
        assert f.add(r).evaluate(x) == field.add_mod(
            f.evaluate(x), r.evaluate(x), Q
        )


@pytest.fixture(scope="module")
def small_ctx():
    params = Params(SecurityLevel.BITS128, Profile.ring_b(64, 1, Q, 3.19))
    return lwe.LweContext(params, context_seed=11)


def test_prop_commitment_homomorphism(small_ctx):
    rng = _rng("homo")
    for case in range(10):  # commitments are heavier
        m1 = [rng.randrange(Q) for _ in range(4)]
        m2 = [rng.randrange(Q) for _ in range(4)]
        g1, g2 = rng.randrange(1, 100), rng.randrange(1, 100)
        c1, o1 = lwe.commit(small_ctx, m1, seed=2 * case)
        c2, o2 = lwe.commit(small_ctx, m2, seed=2 * case + 1)
        combined, op = lwe.linear_combine(
            small_ctx, [c1, c2], [g1, g2], openings=[o1, o2]
        )
        assert lwe.verify_opening(small_ctx, combined, op)


def test_prop_limb_roundtrip_random():
    from lambda_snark_tpu.ops.limb import from_limbs, to_limbs
    import numpy as np

    rng = _rng("limb")
    for q, d in ((Q, 3), (18446744069414584321, 4)):
        vals = [rng.randrange(q) for _ in range(CASES)]
        back = from_limbs(to_limbs(np.array(vals, dtype=object), d))
        assert [int(v) for v in back] == vals


def test_prop_serialization_random_roundtrip():
    from lambda_snark_tpu.proof.types import EvalOpening, ProofR1CS
    from lambda_snark_tpu.commit.lwe import Commitment
    import numpy as np

    rng = _rng("ser")
    for _ in range(50):
        words = np.array(
            [rng.randrange(1 << 64) for _ in range(rng.randrange(1, 8))],
            dtype=np.uint64,
        )
        evals = [rng.randrange(Q) for _ in range(8)]
        ch = Challenge.derive([1], [int(w) for w in words], Q)
        p = ProofR1CS(
            commitment_q=Commitment(words),
            challenge_alpha=ch,
            challenge_beta=ch,
            q_alpha=evals[0], q_beta=evals[1],
            a_z_alpha=evals[2], b_z_alpha=evals[3], c_z_alpha=evals[4],
            a_z_beta=evals[5], b_z_beta=evals[6], c_z_beta=evals[7],
            opening_alpha=EvalOpening(evaluation=evals[0]),
            opening_beta=EvalOpening(evaluation=evals[1]),
            modulus=Q,
        )
        assert ProofR1CS.from_bytes(p.to_bytes()).to_bytes() == p.to_bytes()
