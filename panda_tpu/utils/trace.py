"""Tracing / per-phase timing, mirroring the reference's two mechanisms
(SURVEY.md §5):

* the Rust ``ark_std::{start_timer!, end_timer!}`` pair behind the
  ``print-trace`` feature (``/root/reference/src/gpu_manager/unit.rs:17-98``)
  becomes :func:`timer` / :class:`span`, enabled by ``PANDA_PRINT_TRACE=1``;
* the CUDA ``DEBUG_PROFILING`` per-phase ``cudaEvent`` elapsed-time prints
  (``msm_cuda.cuh:624-736``) become the always-on in-memory
  :data:`phase_times` registry (reading it costs nothing when unused).

``block`` forces async-dispatched jax values to finish inside the span —
the analog of the reference's event-synchronize before reading the timer.
For whole-program traces use :func:`profile_to`, a thin wrapper over
``jax.profiler.trace`` (XLA's native profiler).
"""

from __future__ import annotations

import collections
import contextlib
import os
import time
from typing import Iterator

phase_times: dict[str, list[float]] = collections.defaultdict(list)


def _print_enabled() -> bool:
    return os.environ.get("PANDA_PRINT_TRACE", "0") not in ("", "0")


@contextlib.contextmanager
def timer(label: str, block=None) -> Iterator[None]:
    """Time a phase; record into :data:`phase_times`; print when enabled.

    ``block``: optional jax value (or pytree) to ``block_until_ready`` before
    stopping the clock.
    """
    if _print_enabled():
        print(f"Start: {label}")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block is not None:
            import jax
            jax.block_until_ready(block)
        dt = time.perf_counter() - t0
        phase_times[label].append(dt)
        if _print_enabled():
            print(f"End:   {label} {dt * 1e3:.3f}ms")


class span:
    """Imperative start/end pair (the ``start_timer!``/``end_timer!`` shape).

    >>> t = span("msm: h2d scalars"); ...; t.end()
    """

    def __init__(self, label: str):
        self.label = label
        if _print_enabled():
            print(f"Start: {self.label}")
        self.t0 = time.perf_counter()

    def end(self, block=None) -> float:
        if block is not None:
            import jax
            jax.block_until_ready(block)
        dt = time.perf_counter() - self.t0
        phase_times[self.label].append(dt)
        if _print_enabled():
            print(f"End:   {self.label} {dt * 1e3:.3f}ms")
        return dt


def reset() -> None:
    phase_times.clear()


def summary() -> dict[str, dict[str, float]]:
    """{label: {count, total_s, mean_s, last_s}} for everything recorded."""
    out = {}
    for label, xs in phase_times.items():
        out[label] = {
            "count": len(xs),
            "total_s": sum(xs),
            "mean_s": sum(xs) / len(xs),
            "last_s": xs[-1],
        }
    return out


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """XLA-level trace (TensorBoard format) around a region."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
