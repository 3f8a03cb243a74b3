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
import contextvars
import os

# Trace-time override (see ``forced``).  The env gate is read when a
# pipeline is TRACED, and jax's jit cache is keyed on the function object
# and argument shapes only — flipping the env var between two traces of
# the same callable silently reuses the first executable.  Pipeline entry
# points therefore thread an explicit ``kernels`` argument and pin it
# here for the duration of their trace, so every nested gate (point
# kernels, reductions, digit recode) sees ONE coherent mode.  A
# ContextVar (not a module global) so concurrent traces in different
# threads cannot cross-contaminate each other's mode resolution.
_FORCED: contextvars.ContextVar[str | None] = \
    contextvars.ContextVar("panda_kernels_forced", default=None)

_MODES = ("on", "off", "interpret")


@contextlib.contextmanager
def forced(m: str | None):
    """Pin the kernel mode for the enclosed trace; None is a no-op."""
    if m is None:
        yield
        return
    if m not in _MODES:
        raise ValueError(f"kernel mode must be one of {_MODES}, got {m!r}")
    token = _FORCED.set(m)
    try:
        yield
    finally:
        _FORCED.reset(token)


def mode() -> str:
    f = _FORCED.get()
    if f is not None:
        return f
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
