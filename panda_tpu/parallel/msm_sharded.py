"""Multi-chip MSM via jax.sharding Mesh + shard_map.

The reference is strictly single-GPU (peer-access FFI stubs are never
called — ``src/gpu_ffi/binding.rs:54-56``); this module is the new surface
required by the TPU build plan (SURVEY.md §2.9, §7.6): **points sharding**.

Each device owns a contiguous slice of the points/scalars, runs the full
local Pippenger window pipeline (sort + segmented scan + bucket reduce), and
the tiny per-window partial sums (W points, ~W*3*L*4 bytes) are combined
with an ``all_gather`` over ICI followed by a log-depth tree of complete
point additions.  The Horner tail runs replicated.  Result is bit-identical
to the single-device MSM because point addition is associative and window
decomposition is per-scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curves import point as cp
from ..curves.config import CurveSpec
from ..curves.point import ProjPoint
from ..fields import mont
from ..ops import msm as msm_ops


def _local_window_sums(curve: CurveSpec, px, py, scalars_mont, c: int,
                       axis: str) -> ProjPoint:
    """Per-device window sums, then cross-device combine. Returns (W, L) stacks."""
    fr = curve.fr
    s_std = mont.from_mont(fr, scalars_mont)
    mags, negs = msm_ops.extract_signed_digits(fr, s_std, c)
    sums = msm_ops.window_sums(curve, px, py, mags, c, signs=negs)  # (W, L)
    # all_gather the tiny partials: (D, W, L) per coordinate.
    gathered = [jax.lax.all_gather(a, axis) for a in sums]
    # -> ProjPoint with batch (W, D), limbs leading; fold over D.
    pts = ProjPoint(*(jnp.transpose(g, (2, 1, 0)) for g in gathered))
    folded = cp.fold_sum(curve, pts)                       # (L, W)
    return ProjPoint(*(jnp.transpose(a, (1, 0)) for a in folded))  # (W, L)


def msm_sharded_fn(curve: CurveSpec, mesh: Mesh, axis: str, c: int):
    """Build a shard_map'd MSM over ``mesh`` with points sharded on ``axis``.

    Returned fn takes (px, py, scalars) with last axis sharded over ``axis``
    and returns the replicated per-window sums as (W, L) array triple —
    the Horner tail runs on host (``msm_ops.host_horner``), exactly like
    the reference's device->host hand-off (``msm_cuda.cuh:738-743``).
    """

    def local(px, py, scalars):
        sums = _local_window_sums(curve, px, py, scalars, c, axis)
        return tuple(sums)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_vma=False,
    )
    return shard


@functools.lru_cache(maxsize=16)
def msm_sharded_jitted(curve: CurveSpec, mesh: Mesh, axis: str, c: int):
    fn = msm_sharded_fn(curve, mesh, axis, c)
    return jax.jit(fn)


def msm_sharded(curve: CurveSpec, mesh: Mesh, axis: str, c: int,
                px, py, scalars):
    """Full sharded MSM: device window sums + host Horner.

    Returns the affine result as plain ints (x, y), or None (identity).
    """
    import numpy as np
    sums = msm_sharded_jitted(curve, mesh, axis, c)(px, py, scalars)
    return msm_ops.host_horner(curve, [np.asarray(a) for a in sums], c)


def shard_inputs(mesh: Mesh, axis: str, *arrays):
    """Place (L, N) arrays with N sharded across the mesh axis."""
    sharding = NamedSharding(mesh, P(None, axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)
