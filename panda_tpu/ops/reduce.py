"""Point-reduction primitives with O(1) compiled-code footprint.

Every helper here is built from ``lax.fori_loop``/``lax.scan`` whose body
contains exactly ONE instance of the complete point-addition formula, so the
compiled program stays small no matter how long the array is.  (A naive
``lax.associative_scan`` instantiates its combiner ~2*log2(n) times; with a
~9k-equation EC add that explodes XLA compile time.)

These are the TPU analogs of the reference's intra-kernel reductions:
warp shuffles + shared-memory trees in ``msm_cuda.cuh:284-301,451-497`` and
the running-sum bucket reduction in ``msm_host.cuh:193-213``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import point as cp
from ..curves.config import CurveSpec
from ..curves.point import ProjPoint


def _ceil_log2(n: int) -> int:
    return max((n - 1).bit_length(), 0)


def _roll(pts: ProjPoint, shift, axis=-1) -> ProjPoint:
    return ProjPoint(*(jnp.roll(a, shift, axis=axis) for a in pts))


def segmented_prefix_scan(curve: CurveSpec, pts: ProjPoint,
                          seg_start: jnp.ndarray) -> ProjPoint:
    """Inclusive segmented prefix sums along the last axis (Hillis-Steele).

    seg_start[i] is True where a new segment begins.  After the scan,
    element i holds the sum of its segment's elements up to and including i.
    log2(n) iterations, one point-add instance in the compiled body.
    """
    n = pts.x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(i, state):
        px, py, pz, f = state
        cur = ProjPoint(px, py, pz)
        s = jnp.int32(1) << i
        shifted = _roll(cur, s)
        fsh = jnp.roll(f, s)
        in_range = idx >= s
        take = in_range & jnp.logical_not(f)
        added = cp.add(curve, cur, shifted)
        newp = cp.select(take, added, cur)
        newf = jnp.where(in_range, f | fsh, f)
        return (*newp, newf)

    out = jax.lax.fori_loop(0, _ceil_log2(n), body,
                            (*pts, seg_start.astype(jnp.bool_)))
    return ProjPoint(*out[:3])


def suffix_scan(curve: CurveSpec, pts: ProjPoint) -> ProjPoint:
    """Inclusive suffix sums along the last axis: out[i] = sum_{j>=i} pts[j]."""
    n = pts.x.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(i, state):
        cur = ProjPoint(*state)
        s = jnp.int32(1) << i
        shifted = _roll(cur, -s)
        take = idx < (n - s)
        added = cp.add(curve, cur, shifted)
        newp = cp.select(take, added, cur)
        return tuple(newp)

    out = jax.lax.fori_loop(0, _ceil_log2(n), body, tuple(pts))
    return ProjPoint(*out)


def total_sum(curve: CurveSpec, pts: ProjPoint) -> ProjPoint:
    """Sum all points along the last axis to a single point, scan-style.

    Chunked ``lax.scan`` (one add instance) followed by a short log-depth
    fold of the per-lane accumulators.
    """
    n = pts.x.shape[-1]
    lanes = 1
    while lanes * lanes * 4 < n:
        lanes *= 2
    lanes = min(lanes, max(n // 2, 1))
    steps = -(-n // lanes)
    pad = steps * lanes - n
    if pad:
        ident = cp.identity(curve, pts.x.shape[1:-1] + (pad,))
        pts = ProjPoint(*(jnp.concatenate([a, b], axis=-1)
                          for a, b in zip(pts, ident)))
    L = pts.x.shape[0]
    lead = pts.x.shape[1:-1]
    # (steps, L, *lead, lanes)
    xs = tuple(jnp.moveaxis(a.reshape(a.shape[:-1] + (lanes, steps)), -1, 0)
               for a in pts)

    def body(carry, row):
        return tuple(cp.add(curve, ProjPoint(*carry), ProjPoint(*row))), None

    init = tuple(cp.identity(curve, lead + (lanes,)))
    acc, _ = jax.lax.scan(body, init, xs)
    return cp.fold_sum(curve, ProjPoint(*acc))


def weighted_window_sum(curve: CurveSpec, buckets: ProjPoint) -> ProjPoint:
    """sum_{d>=1} d * B_d for buckets indexed 1..D along the last axis.

    buckets holds B_1..B_D.  Two suffix scans: T_d = sum_{e>=d} B_e, then
    G = sum_d T_d = (suffix scan of T)[0].  Equivalent to the reference's
    running-sum reduction (``msm_host.cuh:193-213``) in log depth.
    """
    t = suffix_scan(curve, buckets)
    u = suffix_scan(curve, t)
    return ProjPoint(*(a[..., 0] for a in u))
