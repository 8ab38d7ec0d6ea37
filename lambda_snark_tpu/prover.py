"""Provers: simple, zero-knowledge, simulator, and the R1CS pipeline.

Top-level algorithm parity with the reference
``rust-api/lambda-snark/src/lib.rs``:

- ``prove_simple`` (``lib.rs:465-491``)
- ``prove_zk`` (``lib.rs:551-585``): blinded f' = f + r
- ``simulate_proof`` (``lib.rs:657-681``): ZK simulator (uniform f')
- ``prove_r1cs`` (``lib.rs:747-809``): quotient commit + dual challenge
- ``prove_r1cs_zk`` (``lib.rs:877-957``): Q' = Q + r * Z_H

One deliberate improvement over the reference: ``prove_r1cs`` interpolates
A_z/B_z/C_z once and reuses the polynomials for evaluation (the reference
re-interpolates after the quotient computation — flagged duplicated work in
SURVEY.md section 3.1).
"""

from __future__ import annotations

from typing import Optional, Sequence

from .commit import lwe
from .core.errors import InvalidInputError
from .proof.polynomial import Polynomial
from .proof.types import EvalOpening, Proof, ProofR1CS, ProofR1csZk
from .r1cs import poly as polyops
from .r1cs.r1cs import R1CS
from .transcript.challenge import Challenge, derive_dual
from .utils.chacha import ChaCha20Rng


def setup(params, context_seed: int = 0) -> lwe.LweContext:
    """Create the commitment context (``setup``, ``lib.rs:412-418``)."""
    params.validate()
    return lwe.LweContext(params, context_seed=context_seed)


def _generate_opening(polynomial: Polynomial, alpha: int, randomness: int) -> EvalOpening:
    """Opening with witness = [randomness || coefficients].

    Reference ``generate_opening`` (``opening.rs:104-115``) — the witness
    reveals the whole polynomial (non-ZK helper; the R1CS path uses stub
    openings plus the real commitment-level opening instead).
    """
    evaluation = polynomial.evaluate(alpha)
    witness = [randomness] + list(polynomial.coeffs)
    return EvalOpening(evaluation=evaluation, witness=witness)


def prove_simple(
    witness: Sequence[int],
    public_inputs: Sequence[int],
    ctx: lwe.LweContext,
    modulus: int,
    seed: int,
) -> Proof:
    if not witness:
        raise InvalidInputError("witness cannot be empty")
    f = Polynomial.from_witness(witness, modulus)
    commitment, _opening = lwe.commit(ctx, f.coeffs, seed)
    challenge = Challenge.derive(public_inputs, commitment.as_words(), modulus)
    opening = _generate_opening(f, challenge.alpha, seed)
    return Proof(commitment=commitment, challenge=challenge, opening=opening, modulus=modulus)


def prove_zk(
    witness: Sequence[int],
    public_inputs: Sequence[int],
    ctx: lwe.LweContext,
    modulus: int,
    commit_seed: int,
    blinding_seed: Optional[int] = None,
) -> Proof:
    if not witness:
        raise InvalidInputError("witness cannot be empty")
    f = Polynomial.from_witness(witness, modulus)
    r = Polynomial.random_blinding(f.degree(), modulus, blinding_seed)
    f_blinded = f.add(r)
    commitment, _opening = lwe.commit(ctx, f_blinded.coeffs, commit_seed)
    challenge = Challenge.derive(public_inputs, commitment.as_words(), modulus)
    opening = _generate_opening(f_blinded, challenge.alpha, commit_seed)
    return Proof(commitment=commitment, challenge=challenge, opening=opening, modulus=modulus)


def simulate_proof(
    degree: int,
    public_inputs: Sequence[int],
    ctx: lwe.LweContext,
    modulus: int,
    commit_seed: int,
    sim_seed: Optional[int] = None,
) -> Proof:
    """ZK simulator: uniform f', no witness (``lib.rs:657-681``)."""
    f_prime = Polynomial.random_blinding(degree, modulus, sim_seed)
    commitment, _opening = lwe.commit(ctx, f_prime.coeffs, commit_seed)
    challenge = Challenge.derive(public_inputs, commitment.as_words(), modulus)
    opening = _generate_opening(f_prime, challenge.alpha, commit_seed)
    return Proof(commitment=commitment, challenge=challenge, opening=opening, modulus=modulus)


def prove_r1cs(
    r1cs: R1CS,
    witness: Sequence[int],
    ctx: lwe.LweContext,
    seed: int,
    with_opening: bool = False,
    bind_circuit: bool = False,
) -> ProofR1CS:
    """Two-challenge R1CS proof.

    ``with_opening=True`` attaches real commitment openings with witness
    ``[seed || Q coefficients]`` (the reference's opening witness shape,
    ``opening.rs:104-115``) enabling full LWE-binding verification via
    ``verifier.verify_r1cs_with_context`` — the check the reference left
    as ignored tests ("LWE binding not yet real", SURVEY section 4.1).
    Non-ZK only: the opening reveals Q.

    ``bind_circuit=True`` produces a v3 transcript hashing the circuit
    digest into the challenges (wire kind 6), closing the v1 cross-circuit
    malleability; the default stays v1 for reference parity.
    """
    q = r1cs.modulus
    # 1. quotient polynomial (validates the witness)
    q_coeffs = r1cs.compute_quotient_poly(witness)
    # 2. commit to Q(X)
    commitment_q, _op = lwe.commit(ctx, q_coeffs, seed)
    comm_words = commitment_q.as_words()
    # 3-4. dual Fiat-Shamir challenges
    public_inputs = r1cs.public_inputs(witness)
    if bind_circuit:
        from .transcript.challenge import derive_dual_v3
        from .utils.artifacts import circuit_digest

        ch_alpha, ch_beta = derive_dual_v3(
            public_inputs, comm_words, q,
            bytes.fromhex(circuit_digest(r1cs)),
        )
    else:
        ch_alpha, ch_beta = derive_dual(public_inputs, comm_words, q)
    alpha, beta = ch_alpha.alpha, ch_beta.alpha
    # 5. interpolate once, reuse for both evaluation points
    a_poly, b_poly, c_poly = r1cs.interpolations(witness)
    # 6-7. evaluations at alpha and beta
    q_alpha = r1cs.eval_poly(q_coeffs, alpha)
    q_beta = r1cs.eval_poly(q_coeffs, beta)
    opening_witness = [seed] + list(q_coeffs) if with_opening else []
    return ProofR1CS(
        commitment_q=commitment_q,
        challenge_alpha=ch_alpha,
        challenge_beta=ch_beta,
        q_alpha=q_alpha,
        q_beta=q_beta,
        a_z_alpha=r1cs.eval_poly(a_poly, alpha),
        b_z_alpha=r1cs.eval_poly(b_poly, alpha),
        c_z_alpha=r1cs.eval_poly(c_poly, alpha),
        a_z_beta=r1cs.eval_poly(a_poly, beta),
        b_z_beta=r1cs.eval_poly(b_poly, beta),
        c_z_beta=r1cs.eval_poly(c_poly, beta),
        opening_alpha=EvalOpening(evaluation=q_alpha, witness=opening_witness),
        opening_beta=EvalOpening(evaluation=q_beta, witness=opening_witness),
        modulus=q,
        transcript_v=3 if bind_circuit else 1,
    )


def prove_r1cs_zk(
    r1cs: R1CS,
    witness: Sequence[int],
    ctx: lwe.LweContext,
    seed: int,
    blinding_seed: Optional[int] = None,
    rng: Optional[ChaCha20Rng] = None,
) -> ProofR1csZk:
    """ZK R1CS proof with Q'(X) = Q(X) + r * Z_H(X) (``lib.rs:877-957``).

    The blinding draw is ``rng.next_u64() % q`` (``lib.rs:890``); pass either
    an explicit ChaCha20Rng or a blinding seed (OS entropy when neither).
    """
    q = r1cs.modulus
    q_coeffs = r1cs.compute_quotient_poly(witness)
    if rng is None:
        if blinding_seed is not None:
            rng = ChaCha20Rng.from_u64(blinding_seed)
        else:
            import secrets

            rng = ChaCha20Rng(secrets.token_bytes(32))
    blinding_factor = rng.next_u64() % q
    z_h = r1cs.domain.vanishing_poly()
    r_z_h = polyops.poly_mul_scalar(z_h, blinding_factor, q)
    q_blinded = polyops.poly_add(q_coeffs, r_z_h, q)
    commitment_qp, _op = lwe.commit(ctx, q_blinded, seed)
    comm_words = commitment_qp.as_words()
    public_inputs = r1cs.public_inputs(witness)
    ch_alpha, ch_beta = derive_dual(public_inputs, comm_words, q)
    alpha, beta = ch_alpha.alpha, ch_beta.alpha
    a_poly, b_poly, c_poly = r1cs.interpolations(witness)
    qp_alpha = r1cs.eval_poly(q_blinded, alpha)
    qp_beta = r1cs.eval_poly(q_blinded, beta)
    return ProofR1csZk(
        commitment_q_prime=commitment_qp,
        blinding_factor=blinding_factor,
        challenge_alpha=ch_alpha,
        challenge_beta=ch_beta,
        q_prime_alpha=qp_alpha,
        q_prime_beta=qp_beta,
        a_z_alpha=r1cs.eval_poly(a_poly, alpha),
        b_z_alpha=r1cs.eval_poly(b_poly, alpha),
        c_z_alpha=r1cs.eval_poly(c_poly, alpha),
        a_z_beta=r1cs.eval_poly(a_poly, beta),
        b_z_beta=r1cs.eval_poly(b_poly, beta),
        c_z_beta=r1cs.eval_poly(c_poly, beta),
        opening_alpha=EvalOpening(evaluation=qp_alpha),
        opening_beta=EvalOpening(evaluation=qp_beta),
        modulus=q,
    )
