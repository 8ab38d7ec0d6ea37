"""Sharded proof service: a witness stream proven over a (dp, sp) mesh with
a ProofStore resume log.

The deployment shape SURVEY.md §5 asks for in place of the reference's
single-thread batch loop (``main.rs:640-706``): statements stream in, proof
batches shard over the data-parallel mesh axis while each proof's
polynomial/ring coefficients shard over ``sp``, and every finished proof is
persisted immediately. Restarting the service with the same store resumes
where it stopped: statements already proven are served from the store
(bytes unchanged), only the remainder is proven (seeds fold the master
seed with the leading statement index, so reruns of the same partition
are deterministic).

On a real multi-host pod this runs unchanged under
``jax.distributed.initialize`` + ``multihost.pod_mesh`` (single-controller
semantics; the sandbox validates on virtual CPU meshes —
tests/test_service.py).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np

from ..commit.lwe import LweContext
from ..core.errors import DomainError
from ..ops.limb import to_limbs
from ..prover_batched import _assemble_proofs
from ..r1cs.r1cs import R1CS
from ..utils.artifacts import ProofStore, statement_digest
from .pipeline_sharded import ShardedProver


class ShardedProofService:
    """Prove a stream of witnesses against one R1CS over a device mesh."""

    def __init__(
        self,
        r1cs: R1CS,
        host_ctx: LweContext,
        mesh,
        store: Optional[ProofStore] = None,
        batch: Optional[int] = None,
        dp_axis: str = "dp",
        sp_axis: str = "sp",
        prover: Optional[ShardedProver] = None,
    ) -> None:
        if r1cs.domain.kind != "roots":
            raise DomainError("sharded proving requires a roots (NTT) domain")
        self.r1cs = r1cs
        self.store = store
        dp = mesh.shape[dp_axis]
        self.batch = batch if batch is not None else max(2 * dp, dp)
        if self.batch % dp != 0:
            raise DomainError(
                f"batch {self.batch} must divide over dp={dp}"
            )
        if prover is not None:
            # reuse an already-compiled step (jit caches are per-instance,
            # so sharing the instance is what shares the executable)
            if (
                prover.m != r1cs.m
                or prover.q != r1cs.modulus
                or prover.mesh is not mesh
                or prover.host_ctx is not host_ctx
                or prover.dp != dp_axis
                or prover.sp != sp_axis
            ):
                raise DomainError(
                    "supplied prover does not match this service's "
                    "circuit/mesh/commitment context/axes"
                )
            self.prover = prover
        else:
            self.prover = ShardedProver(
                r1cs.m, r1cs.modulus, host_ctx, mesh,
                dp_axis=dp_axis, sp_axis=sp_axis,
            )

    def _label(self, index: int) -> str:
        return f"svc-{index}"

    def _key(self, witness: Sequence[int], index: int, seed: int) -> str:
        return statement_digest(
            self.r1cs,
            self.r1cs.public_inputs(witness),
            seed,
            self._label(index),
        )

    def prove_stream(self, witnesses: Iterable[Sequence[int]], seed: int):
        """Yield (index, proof) in order; proofs already in the store are
        loaded, new ones proven in dp-sharded batches and persisted."""
        r1cs = self.r1cs
        d = self.prover.fq_ctx.d

        pending: list = []  # (index, witness)

        def flush():
            if not pending:
                return
            ws = [w for _i, w in pending]
            # pad the tail batch to the dp multiple by repeating the last
            # witness (dropped after proving; batch shape is static per size)
            dp = self.prover.mesh.shape[self.prover.dp]
            pad = (-len(ws)) % dp
            padded = ws + [ws[-1]] * pad
            evs = [r1cs.compute_constraint_evals(w) for w in padded]
            stack = lambda idx: to_limbs(
                np.array([e[idx] for e in evs], dtype=object), d
            )
            batch_seed = (seed ^ (0x9E3779B97F4A7C15 * (pending[0][0] + 1))) & (
                (1 << 63) - 1
            )
            out = self.prover.run(stack(0), stack(1), stack(2), batch_seed)
            q_pl, a_pl, b_pl, c_pl, c_ring, _s, _e, valid = out
            flat = self.prover.coeff_layout_to_flat
            device_out = (
                flat(np.asarray(q_pl)),
                flat(np.asarray(a_pl)),
                flat(np.asarray(b_pl)),
                flat(np.asarray(c_pl)),
                flat(np.asarray(c_ring)),
                np.asarray(valid),
            )
            proofs = _assemble_proofs(
                r1cs, padded, device_out, zk=False, blinding=None,
                batch_offset=pending[0][0],
            )
            for (index, w), proof in zip(pending, proofs):
                if self.store is not None:
                    self.store.save(
                        r1cs, r1cs.public_inputs(w), seed, proof,
                        label=self._label(index),
                    )
                yield index, proof
            pending.clear()

        for index, w in enumerate(witnesses):
            if self.store is not None:
                key = self._key(w, index, seed)
                if self.store.contains(key):
                    # resume: flush what precedes, then emit the stored proof
                    for item in flush():
                        yield item
                    yield index, self.store.load(key)
                    continue
            pending.append((index, w))
            if len(pending) == self.batch:
                for item in flush():
                    yield item
        for item in flush():
            yield item
