"""Performance observation: timers, roofline model, profiler traces.

The reference's perf surface is criterion benches + a CLI benchmark table
(SURVEY.md section 5 "tracing/profiling"); the TPU equivalent here is:

- ``DeviceTimer``: dispatch-amortized on-device timing (chains K invocations
  inside one jit call — the sandbox TPU relay costs ~30 ms per dispatch, so
  naive per-call timing measures the network, not the chip),
- ``roofline``: per-chip speed-of-light estimates for a kernel from its
  flop/byte counts (TPU v5e-class defaults),
- ``trace``: context manager around ``jax.profiler`` for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
from jax import lax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Rough per-chip capability numbers for roofline estimates."""

    name: str
    hbm_gbps: float
    vpu_int32_tops: float
    mxu_bf16_tflops: float
    mxu_int8_tops: float


#: TPU v5e-class defaults (public figures; used for *relative* roofline only).
TPU_V5E = ChipSpec(
    name="tpu_v5e", hbm_gbps=820.0, vpu_int32_tops=2.0,
    mxu_bf16_tflops=197.0, mxu_int8_tops=394.0,
)


def roofline(
    bytes_accessed: float,
    vpu_int32_ops: float = 0.0,
    mxu_int8_macs: float = 0.0,
    chip: ChipSpec = TPU_V5E,
) -> dict:
    """Speed-of-light time estimates (seconds) per bottleneck resource."""
    t_mem = bytes_accessed / (chip.hbm_gbps * 1e9)
    t_vpu = vpu_int32_ops / (chip.vpu_int32_tops * 1e12)
    t_mxu = 2 * mxu_int8_macs / (chip.mxu_int8_tops * 1e12)
    bound = max(("memory", t_mem), ("vpu", t_vpu), ("mxu", t_mxu), key=lambda kv: kv[1])
    return {
        "t_memory_s": t_mem,
        "t_vpu_s": t_vpu,
        "t_mxu_s": t_mxu,
        "bound_by": bound[0],
        "speed_of_light_s": bound[1],
    }


class DeviceTimer:
    """Measure per-invocation device time of ``fn`` with dispatch amortized.

    ``fn`` must map its argument to an output of the same structure so it can
    be chained: measured time = (one jit call containing ``chain`` sequential
    applications) / chain.
    """

    def __init__(self, fn: Callable, chain: int = 32) -> None:
        self.chain = chain

        @jax.jit
        def chained(v):
            return lax.fori_loop(0, chain, lambda _, acc: fn(acc), v)

        self._chained = chained

    def measure(self, x, iters: int = 5, warmup: int = 1) -> float:
        for _ in range(warmup + 1):  # +1 covers compile
            y = self._chained(x)
            jax.block_until_ready(y)
        t0 = time.time()
        y = x
        for _ in range(iters):
            y = self._chained(y)
            jax.block_until_ready(y)
        return (time.time() - t0) / (iters * self.chain)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lsnark_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def ntt_roofline(m: int, digits: int, chip: ChipSpec = TPU_V5E) -> dict:
    """Speed-of-light for a radix-2 limb NTT: one HBM read+write, VPU-bound
    butterflies (~80 uint32 ops per butterfly incl. digit carries)."""
    import math

    log_m = int(math.log2(m))
    bytes_accessed = 2 * m * digits * 4
    butterflies = (m // 2) * log_m
    return roofline(bytes_accessed, vpu_int32_ops=butterflies * 80.0, chip=chip)


# --- lightweight stage marks (env LSNARK_STAGE_TIMING=1) ---------------------
#
# The batched succinct prover interleaves device dispatches, blocking relay
# pulls and host field math; cProfile lumps every blocking pull into
# `Array._value`. Stage marks give the wall-clock between named points with
# near-zero overhead when disabled.

import os as _os

STAGE_ENABLED = _os.environ.get("LSNARK_STAGE_TIMING") == "1"
_STAGE_LOG: list = []


def stage(label: str) -> None:
    if STAGE_ENABLED:
        _STAGE_LOG.append((label, time.time()))


def stage_report(reset: bool = True) -> str:
    """Render deltas between consecutive marks; optionally clear the log."""
    lines = []
    for (a, ta), (b, tb) in zip(_STAGE_LOG, _STAGE_LOG[1:]):
        lines.append(f"{(tb - ta) * 1e3:9.1f} ms  {a} -> {b}")
    if reset:
        _STAGE_LOG.clear()
    return "\n".join(lines)
