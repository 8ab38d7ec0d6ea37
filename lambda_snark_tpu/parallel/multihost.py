"""Multi-host mesh setup and scaling-efficiency measurement.

The reference has no distributed story (SURVEY.md section 2.4); this module
specifies it fresh per the north star: hosts join via
``jax.distributed.initialize`` (DCN), meshes span all hosts' devices with the
ring/coefficient axis laid out so all_to_alls stay on ICI within a host slice
whenever the per-host device count divides the sp axis.

Scaling efficiency is defined as
    eff(N) = T(1) / (N * T(N) / batch_scale)
for a fixed per-device problem size (weak scaling), reported at 1 chip /
1 host / >= 2 hosts (BASELINE.json target: >= 70% at 2 hosts).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax

from .mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the distributed runtime (no-op for single-process runs).

    On Cloud TPU pods, arguments auto-populate from the environment; other
    setups pass coordinator ``host:port`` + process ranks explicitly.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def pod_mesh(dp: int = 1, axis_names=("dp", "sp")):
    """Mesh over every device of every participating host: sp innermost so
    coefficient all_to_alls ride ICI within a host when possible."""
    total = len(jax.devices())
    if total % dp != 0:
        raise ValueError(f"dp={dp} must divide device count {total}")
    return make_mesh([dp, total // dp], list(axis_names))


@dataclasses.dataclass
class ScalingPoint:
    n_devices: int
    per_step_s: float
    efficiency: float


def measure_scaling(
    step_factory: Callable[[int], Callable[[], object]],
    device_counts,
    iters: int = 5,
) -> list:
    """Weak-scaling sweep: ``step_factory(n)`` returns a zero-arg callable
    running one (blocked) step on an n-device mesh with n-proportional work.
    """
    points = []
    base = None
    for n in device_counts:
        step = step_factory(n)
        step()  # compile
        t0 = time.time()
        for _ in range(iters):
            step()
        per_step = (time.time() - t0) / iters
        if base is None:
            base = per_step
        eff = base / per_step if per_step > 0 else 0.0
        points.append(ScalingPoint(n_devices=n, per_step_s=per_step, efficiency=eff))
    return points
