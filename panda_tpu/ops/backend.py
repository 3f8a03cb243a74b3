"""Pallas kernel gating shared by all fused-kernel call sites.

Three modes, selected by the PANDA_PALLAS environment variable:

* ``"1"`` (default): fused kernels run when the backend is a real TPU
  ("tpu" or the tunneled "axon" platform); elsewhere the bit-identical
  jnp/lax fallbacks run.
* ``"0"``: fallbacks everywhere (debugging / A-B comparison).
* ``"interpret"``: kernels run under the Pallas interpreter on ANY
  backend — the CPU test path for kernel/fallback equivalence
  (tests/test_msm_kernels.py), since the reference's kernels are
  likewise exercised by host-path tests (``msm_host.cuh`` vs
  ``tests/test.rs:115``).
"""

from __future__ import annotations

import contextlib
import os

# Trace-time override (see ``forced``).  The env gate is read when a
# pipeline is TRACED, and jax's jit cache is keyed on the function object
# and argument shapes only — flipping the env var between two traces of
# the same callable silently reuses the first executable.  Pipeline entry
# points therefore thread an explicit ``kernels`` argument and pin it
# here for the duration of their trace, so every nested gate (point
# kernels, reductions, digit recode) sees ONE coherent mode.
_FORCED: str | None = None


@contextlib.contextmanager
def forced(m: str | None):
    """Pin the kernel mode for the enclosed trace; None is a no-op."""
    global _FORCED
    if m is None:
        yield
        return
    assert m in ("on", "off", "interpret"), m
    prev = _FORCED
    _FORCED = m
    try:
        yield
    finally:
        _FORCED = prev


def mode() -> str:
    if _FORCED is not None:
        return _FORCED
    v = os.environ.get("PANDA_PALLAS", "1")
    if v == "interpret":
        return "interpret"
    if v != "1":
        return "off"
    try:
        import jax
        return "on" if jax.default_backend() in ("tpu", "axon") else "off"
    except Exception:  # pragma: no cover - backend probe failure
        return "off"


def kernels_enabled() -> bool:
    return mode() != "off"


def interpret() -> bool:
    return mode() == "interpret"
