"""Sharded four-step NTT: local butterflies + all_to_all transposes.

Implements the SURVEY.md section 5 design ("four-step: local NTT ->
all_to_all transpose -> twiddle x local NTT") under ``shard_map`` on a 1-D
mesh axis. Coefficients of an m = R*C transform live row-major as an (R, C)
matrix with R sharded across the axis; each device holds a contiguous
coefficient block. The pipeline is:

    coeff layout (D, R/N, C)
      --all_to_all-->  column layout (D, C/N, R)   [full columns locally]
      --local R-NTT--> A_t[b, h]
      --twiddle omega^(h*b) (sharded table slice)
      --all_to_all-->  row layout (D, R/N, C)
      --local C-NTT--> eval layout F[h, g], h sharded

The forward transform *returns the eval layout* (h-sharded) — pointwise
products compose in that layout without further communication, and the
inverse transform consumes it and returns the coefficient layout. Exactly two
all_to_alls per transform ride the ICI, matching the "only log(#devices)
exchanges" requirement (SURVEY.md section 7 hard parts).

Bit-exactness vs the single-device four-step is asserted in
``tests/test_sharded.py`` on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import modarith
from ..ops.ntt_jax import ntt_forward, ntt_inverse
from ..ops.ntt_large import FourStepPlan, four_step_plan


def _a2a(x, axis_name: str, split_axis: int, concat_axis: int):
    """Tiled all_to_all on element axes of (D, a, b) local planes."""
    return lax.all_to_all(x, axis_name, split_axis=split_axis,
                          concat_axis=concat_axis, tiled=True)


def _local_forward(fsp: FourStepPlan, x_local, tw_local, axis_name: str):
    """x_local: (D, R/N, C) coeff layout -> (D, R/N, C) eval layout."""
    ctx = fsp.plan_r.ctx
    # -> (D, R, C/N): full columns, C/N column subset
    col = _a2a(x_local, axis_name, split_axis=2, concat_axis=1)
    col_t = jnp.swapaxes(col, 1, 2)  # (D, C/N, R): transform axis last
    # local R-point NTT over a: A_t[b, h]
    a_t = ntt_forward(fsp.plan_r, col_t)
    # twiddle omega^(h*b): tw_local is the (D, C/N, R) slice of tw_t
    t_t = modarith.mul_mod(ctx, a_t, tw_local)
    # -> (D, C, R/N): full b, h-chunk
    rows = _a2a(t_t, axis_name, split_axis=2, concat_axis=1)
    rows_t = jnp.swapaxes(rows, 1, 2)  # (D, R/N, C): T[h-chunk, b]
    # local C-point NTT over b -> F[h-chunk, g]
    return ntt_forward(fsp.plan_c, rows_t)


def _local_inverse(fsp: FourStepPlan, f_local, tw_inv_local, axis_name: str):
    """(D, R/N, C) eval layout -> (D, R/N, C) coeff layout."""
    ctx = fsp.plan_r.ctx
    # local inverse C-NTT over g (scales by 1/C): T[h-chunk, b]
    t = ntt_inverse(fsp.plan_c, f_local)
    # -> (D, R, C/N) then transpose to (D, C/N, R): T_t[b-chunk, h]
    t_t = jnp.swapaxes(_a2a(t, axis_name, split_axis=2, concat_axis=1), 1, 2)
    # inverse twiddle
    a_t = modarith.mul_mod(ctx, t_t, tw_inv_local)
    # local inverse R-NTT over h (scales by 1/R; total 1/m): X_t[b-chunk, a]
    x_t = ntt_inverse(fsp.plan_r, a_t)
    # -> (D, C, R/N) then transpose: x[a-chunk, b] coeff layout
    return jnp.swapaxes(_a2a(x_t, axis_name, split_axis=2, concat_axis=1), 1, 2)


class ShardedNtt:
    """m-point NTT sharded over a 1-D mesh axis.

    Transposed twiddle tables (D, C, R) are device-sharded along C so each
    device reads only its slice. ``forward``/``inverse`` are jitted
    shard_map closures; inputs/outputs are (D, R, C)-shaped global arrays
    sharded on the R axis (coeff layout) whose flattening is the coefficient
    vector / eval layout respectively.
    """

    def __init__(self, m: int, q: int, omega: int, mesh: Mesh, axis: str = "sp"):
        self.m = m
        self.q = q
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.shape[axis]
        self.fsp = four_step_plan(m, q, omega)
        r, c = self.fsp.r, self.fsp.c
        assert r % self.n_dev == 0 and c % self.n_dev == 0, (
            f"R={r}, C={c} must be divisible by mesh axis size {self.n_dev}"
        )
        ctx = self.fsp.plan_r.ctx
        # transposed twiddle tables: tw_t[b, h] = omega^(h*b)
        self.tw_t = np.swapaxes(np.asarray(self.fsp.tw), 1, 2).copy()
        self.tw_inv_t = np.swapaxes(np.asarray(self.fsp.inverse.tw), 1, 2).copy()

        spec_rows = P(None, axis, None)  # shard element axis 0 (rows)
        fsp = self.fsp
        ax = self.axis

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows),
            out_specs=spec_rows,
        )
        def _fwd(x, tw_local):
            return _local_forward(fsp, x, tw_local, ax)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows),
            out_specs=spec_rows,
        )
        def _inv(x, tw_inv_local):
            return _local_inverse(fsp, x, tw_inv_local, ax)

        self._fwd = jax.jit(_fwd)
        self._inv = jax.jit(_inv)

    # -- host-facing helpers --------------------------------------------------

    def coeff_to_device(self, planes: np.ndarray):
        """(D, m) planes -> (D, R, C) sharded coefficient layout."""
        d = planes.shape[0]
        arr = np.asarray(planes).reshape(d, self.fsp.r, self.fsp.c)
        sharding = NamedSharding(self.mesh, P(None, self.axis, None))
        return jax.device_put(jnp.asarray(arr), sharding)

    def tw_device(self, inverse: bool = False):
        tw = self.tw_inv_t if inverse else self.tw_t
        sharding = NamedSharding(self.mesh, P(None, self.axis, None))
        return jax.device_put(jnp.asarray(tw), sharding)

    def forward(self, x_sharded):
        """Coefficient layout -> eval layout (both (D, R, C), R-sharded)."""
        return self._fwd(x_sharded, self.tw_device(False))

    def inverse(self, f_sharded):
        """Eval layout -> coefficient layout."""
        return self._inv(f_sharded, self.tw_device(True))

    def eval_layout_to_natural(self, f) -> np.ndarray:
        """Host: eval layout (D, R=h, C=g) -> natural-order evals (D, m)."""
        arr = np.asarray(f)
        d = arr.shape[0]
        # f_hat[h + R*g] = F[h, g] -> natural index j = h + R*g
        return np.swapaxes(arr, 1, 2).reshape(d, self.m)

    def natural_to_eval_layout(self, evals: np.ndarray):
        arr = np.asarray(evals).reshape(evals.shape[0], self.fsp.c, self.fsp.r)
        arr = np.swapaxes(arr, 1, 2).copy()
        sharding = NamedSharding(self.mesh, P(None, self.axis, None))
        return jax.device_put(jnp.asarray(arr), sharding)

    def coeff_from_device(self, x) -> np.ndarray:
        return np.asarray(x).reshape(x.shape[0], self.m)

    def pointwise_mul(self, fa, fb):
        """Pointwise product in eval layout (no communication)."""
        ctx = self.fsp.plan_r.ctx
        return jax.jit(lambda a, b: modarith.mul_mod(ctx, a, b))(fa, fb)
