"""Circuit builder DSL.

Mirrors the reference ``rust-api/lambda-snark/src/circuit.rs:89-370``:
sequential variable allocation, public-input prefix convention, constraints as
(A, B, C) linear-combination term lists, duplicate terms accumulated mod q,
and a final CSR build.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from ..core import field
from ..core.errors import InvalidInputError
from .domain import Domain
from .r1cs import R1CS
from .sparse import SparseMatrix

Term = Tuple[int, int]  # (variable index, coefficient)


class CircuitBuilder:
    """Accumulates rank-1 constraints, then builds an ``R1CS``."""

    def __init__(self, modulus: int) -> None:
        self.modulus = modulus
        self._constraints: List[Tuple[List[Term], List[Term], List[Term]]] = []
        self._num_vars = 0
        self._num_public = 0

    def alloc_var(self) -> int:
        """Allocate the next variable index (z_0 = 1 by convention)."""
        idx = self._num_vars
        self._num_vars += 1
        return idx

    def alloc_vars(self, count: int) -> List[int]:
        return [self.alloc_var() for _ in range(count)]

    def set_public_inputs(self, l: int) -> None:
        if l > self._num_vars:
            raise InvalidInputError(
                f"cannot set {l} public inputs with only {self._num_vars} variables"
            )
        self._num_public = l

    def add_constraint(
        self, a: Sequence[Term], b: Sequence[Term], c: Sequence[Term]
    ) -> None:
        """(A*z) * (B*z) = (C*z), each side a list of (var, coeff) terms."""
        self._constraints.append((list(a), list(b), list(c)))

    # -- convenience gates ---------------------------------------------------

    def mul_gate(self, x: int, y: int, out: int) -> None:
        """x * y = out."""
        self.add_constraint([(x, 1)], [(y, 1)], [(out, 1)])

    def bool_gate(self, one: int, x: int) -> None:
        """x * x = x  (booleanity; requires z[one] unused here, kept for API)."""
        self.add_constraint([(x, 1)], [(x, 1)], [(x, 1)])

    def linear_gate(self, one: int, terms: Sequence[Term], out_terms: Sequence[Term]) -> None:
        """(sum terms) * 1 = (sum out_terms)."""
        self.add_constraint(list(terms), [(one, 1)], list(out_terms))

    # -- build ---------------------------------------------------------------

    def build(self, domain: Optional[Domain] = None) -> R1CS:
        """Convert to CSR matrices and an R1CS. Reference ``circuit.rs:262-330``."""
        m = len(self._constraints)
        n = self._num_vars
        l = self._num_public
        maps: Tuple[Dict, Dict, Dict] = ({}, {}, {})
        for row, sides in enumerate(self._constraints):
            for side_map, terms in zip(maps, sides):
                for var_idx, coeff in terms:
                    if var_idx >= n:
                        raise InvalidInputError(
                            f"constraint {row} references variable {var_idx} "
                            f"but only {n} allocated"
                        )
                    reduced = coeff % self.modulus
                    if reduced == 0 and coeff != 0:
                        continue
                    if coeff == 0:
                        continue
                    key = (row, var_idx)
                    side_map[key] = field.add_mod(
                        side_map.get(key, 0), reduced, self.modulus
                    )
        a = SparseMatrix.from_map(m, n, maps[0])
        b = SparseMatrix.from_map(m, n, maps[1])
        c = SparseMatrix.from_map(m, n, maps[2])
        return R1CS(m=m, n=n, l=l, a=a, b=b, c=c, modulus=self.modulus, domain=domain)

    @property
    def num_constraints(self) -> int:
        return len(self._constraints)

    @property
    def num_vars(self) -> int:
        return self._num_vars
