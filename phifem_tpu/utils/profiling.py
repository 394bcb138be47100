"""Profiling: phase wall clocks, MDoF/s throughput, jax.profiler hooks.

Replaces the reference's PETSc logging (``PETSc.Log.begin/view`` ->
petsc_log.txt, ``demo/interface-elasticity/main.py:285-288``) with simple
timers plus optional XLA traces (SURVEY.md section 5 rebuild note: N14).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """Phase timer accumulating wall-clock per named phase."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        jax.block_until_ready(jax.numpy.zeros(()))
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k:>24s}: {v:8.3f} s" for k, v in self.phases.items()]
        lines.append(f"{'total':>24s}: {total:8.3f} s")
        return "\n".join(lines)


def report_throughput(ndofs: int, seconds: float, label: str = "") -> float:
    """MDoF/s figure of merit (BASELINE.json north-star metric)."""
    mdofs = ndofs / seconds / 1e6 if seconds > 0 else float("inf")
    if label:
        print(f"{label}: {ndofs} DoF in {seconds:.4f} s = {mdofs:.2f} MDoF/s")
    return mdofs


@contextlib.contextmanager
def xla_trace(logdir: Optional[str]):
    """Optional jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
