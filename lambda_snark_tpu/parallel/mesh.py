"""Device-mesh helpers.

The reference is single-process/single-thread (SURVEY.md section 2.4); the
mesh/collective layer is specified fresh from the BASELINE.json north star:
polynomial coefficients shard per ring over an "sp" (sequence/ring) axis,
proof batches over "dp", with XLA collectives over ICI. Multi-host extends
the same meshes over DCN via ``jax.distributed.initialize`` (see
``parallel/multihost.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("dp", "sp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh of the given shape from available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    total = int(np.prod(axis_sizes))
    if total > len(devs):
        raise ValueError(f"need {total} devices, have {len(devs)}")
    arr = np.array(devs[:total]).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def ring_mesh(n_devices: Optional[int] = None, name: str = "sp") -> Mesh:
    """1-D mesh over the ring/coefficient axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return make_mesh([n], [name], devs)


def shard_planes(mesh: Mesh, axis: str, planes_ndim: int, sharded_dim: int):
    """NamedSharding for (D, ...) digit planes, sharded on one element dim."""
    spec = [None] * planes_ndim
    spec[sharded_dim] = axis
    return NamedSharding(mesh, P(*spec))
