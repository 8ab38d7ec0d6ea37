"""CSR sparse matrices over F_q.

Mirrors the reference ``rust-api/lambda-snark/src/sparse_matrix.rs:31-487``:
CSR {row_ptr, col_indices, values} with invariant checks, ``from_dense``,
``from_map``, ``get`` and modular SpMV. R1CS circuits are <1% dense, so these
stay host-side; the device path densifies (or segment-sums) per batch in
``ops.spmv``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..core import field
from ..core.errors import InvalidDimensionsError


class SparseMatrix:
    """Immutable CSR matrix with u64 values (reduced lazily mod q in SpMV)."""

    __slots__ = ("rows", "cols", "row_ptr", "col_indices", "values")

    def __init__(
        self,
        rows: int,
        cols: int,
        row_ptr: Sequence[int],
        col_indices: Sequence[int],
        values: Sequence[int],
    ) -> None:
        if len(row_ptr) != rows + 1:
            raise InvalidDimensionsError("row_ptr length must be rows+1")
        if row_ptr[0] != 0 or row_ptr[-1] != len(col_indices):
            raise InvalidDimensionsError("row_ptr must start at 0 and end at nnz")
        if any(row_ptr[i] > row_ptr[i + 1] for i in range(rows)):
            raise InvalidDimensionsError("row_ptr must be non-decreasing")
        if len(col_indices) != len(values):
            raise InvalidDimensionsError("col_indices/values length mismatch")
        if any(c >= cols for c in col_indices):
            raise InvalidDimensionsError("column index out of range")
        self.rows = rows
        self.cols = cols
        self.row_ptr = list(row_ptr)
        self.col_indices = list(col_indices)
        self.values = [int(v) for v in values]

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_dense(rows: Sequence[Sequence[int]]) -> "SparseMatrix":
        """Build from a dense row-major table. Reference ``sparse_matrix.rs:129-157``."""
        m = len(rows)
        n = len(rows[0]) if m else 0
        row_ptr = [0]
        cols: List[int] = []
        vals: List[int] = []
        for r in rows:
            if len(r) != n:
                raise InvalidDimensionsError("ragged dense rows")
            for j, v in enumerate(r):
                if v != 0:
                    cols.append(j)
                    vals.append(int(v))
            row_ptr.append(len(cols))
        return SparseMatrix(m, n, row_ptr, cols, vals)

    @staticmethod
    def from_map(
        rows: int, cols: int, entries: Dict[Tuple[int, int], int]
    ) -> "SparseMatrix":
        """Build from a {(row, col): value} map, sorted by (row, col).

        Reference ``sparse_matrix.rs:175+`` (``from_map``); zero values dropped.
        """
        items = sorted((rc, v) for rc, v in entries.items() if v != 0)
        row_ptr = [0] * (rows + 1)
        col_indices: List[int] = []
        values: List[int] = []
        cur = 0
        for (r, c), v in items:
            if r >= rows or c >= cols:
                raise InvalidDimensionsError(f"entry ({r},{c}) out of bounds")
            while cur < r:
                cur += 1
                row_ptr[cur] = len(col_indices)
            col_indices.append(c)
            values.append(int(v))
        while cur < rows:
            cur += 1
            row_ptr[cur] = len(col_indices)
        return SparseMatrix(rows, cols, row_ptr, col_indices, values)

    @staticmethod
    def from_coo(
        rows: int, cols: int, entries: Sequence[Tuple[int, int, int]]
    ) -> "SparseMatrix":
        """Build from COO triples (duplicates summed later mod q by caller)."""
        acc: Dict[Tuple[int, int], int] = {}
        for r, c, v in entries:
            acc[(r, c)] = acc.get((r, c), 0) + int(v)
        return SparseMatrix.from_map(rows, cols, acc)

    # -- ops -----------------------------------------------------------------

    def get(self, row: int, col: int) -> int:
        """Entry lookup (0 when absent). Reference ``sparse_matrix.rs:211``."""
        for i in range(self.row_ptr[row], self.row_ptr[row + 1]):
            if self.col_indices[i] == col:
                return self.values[i]
        return 0

    def nnz(self) -> int:
        return len(self.values)

    def mul_vec(self, v: Sequence[int], modulus: int) -> List[int]:
        """Modular SpMV. Reference ``sparse_matrix.rs:259-289``."""
        if len(v) != self.cols:
            raise InvalidDimensionsError(
                f"vector length {len(v)} != cols {self.cols}"
            )
        out = []
        for row in range(self.rows):
            s = 0
            for i in range(self.row_ptr[row], self.row_ptr[row + 1]):
                term = field.mul_mod(
                    self.values[i] % modulus, v[self.col_indices[i]] % modulus, modulus
                )
                s = field.add_mod(s, term, modulus)
            out.append(s)
        return out

    def to_dense(self, modulus: int | None = None) -> np.ndarray:
        """Dense uint64 array (optionally reduced mod q) for device staging."""
        out = np.zeros((self.rows, self.cols), dtype=np.uint64)
        for row in range(self.rows):
            for i in range(self.row_ptr[row], self.row_ptr[row + 1]):
                v = self.values[i]
                if modulus is not None:
                    v %= modulus
                out[row, self.col_indices[i]] = v
        return out

    def coo(self) -> List[Tuple[int, int, int]]:
        out = []
        for row in range(self.rows):
            for i in range(self.row_ptr[row], self.row_ptr[row + 1]):
                out.append((row, self.col_indices[i], self.values[i]))
        return out

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SparseMatrix)
            and self.rows == other.rows
            and self.cols == other.cols
            and self.row_ptr == other.row_ptr
            and self.col_indices == other.col_indices
            and self.values == other.values
        )

    def __repr__(self) -> str:
        return f"SparseMatrix({self.rows}x{self.cols}, nnz={self.nnz()})"
