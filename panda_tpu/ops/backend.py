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

import os


def mode() -> str:
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
