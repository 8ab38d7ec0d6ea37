"""parallel subpackage: meshes, sharded kernels, multihost.

Public surface:
- ``mesh.make_mesh`` / ``mesh.ring_mesh``: device meshes (dp, sp axes)
- ``ntt_sharded.ShardedNtt``: four-step NTT over a mesh axis (2 all_to_alls)
- ``pipeline_sharded.ShardedProver``: full batched prove step on a (dp, sp)
  mesh with psum validity
- ``multihost``: jax.distributed initialization + scaling sweeps
"""

from .mesh import make_mesh, ring_mesh  # noqa: F401
