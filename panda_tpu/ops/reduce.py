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
                          seg_start: jnp.ndarray,
                          max_seg: int | None = None) -> ProjPoint:
    """Inclusive segmented prefix sums along the last axis (Hillis-Steele).

    seg_start[i] is True where a new segment begins.  After the scan,
    element i holds the sum of its segment's elements up to and including i.
    log2 iterations, one point-add instance in the compiled body.

    ``max_seg``: static upper bound on any segment's length — the scan only
    needs ceil(log2(max_seg)) doubling levels to cover it, independent of
    the array length (the MSM pipeline bounds it by its phase-A lane count).
    """
    n = pts.x.shape[-1]
    span = n if max_seg is None else min(n, max_seg)
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

    out = jax.lax.fori_loop(0, _ceil_log2(span), body,
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


def small_total(curve: CurveSpec, pts: ProjPoint) -> ProjPoint:
    """Sum along the last axis via one log-depth doubling loop (a single
    point-add instance in the compiled code — unlike ``fold_sum``, which
    unrolls log2(n) separate instances).  Intended for short axes."""
    suf = suffix_scan(curve, pts)
    return ProjPoint(*(a[..., 0] for a in suf))


def dbl_pow2(curve: CurveSpec, pt: ProjPoint, log_k: int) -> ProjPoint:
    """pt * 2^log_k with one doubling instance (fori_loop)."""
    if log_k == 0:
        return pt
    out = jax.lax.fori_loop(
        0, log_k, lambda _, q: tuple(cp.dbl(curve, ProjPoint(*q))), tuple(pt))
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

    buckets holds B_1..B_D with arrays (L, *batch, D); returns (L, *batch).
    Work-efficient analog of the reference's running-sum bucket reduction
    (``msm_host.cuh:193-213``): ~2 point-adds per bucket (the sequential
    algorithm's optimum), not the 2*D*log2(D) of a double log-depth suffix
    scan.  Blocked decomposition d = q*S + (r+1), q = lane, r = step:

        sum_d d*B_d = sum_q [ sum_r (r+1) B_{q,r} ]  +  S * sum_q q*T_q

    with T_q the per-lane plain sums.  One reverse ``lax.scan`` computes
    both inner terms (run += B; wsum += run) full-lane-width; the small
    lane-combine reuses the log-depth suffix scan.
    """
    d = buckets.x.shape[-1]
    lead = buckets.x.shape[1:-1]
    if d == 1:
        return ProjPoint(*(a[..., 0] for a in buckets))

    # Lane split: wide enough that each scan step saturates the VPU
    # (batch*lanes ~ 4-8K elements), narrow enough that the log-depth
    # cross-lane suffix pass stays a small fraction of the 2 adds/bucket
    # main scan.
    batch = int(np.prod(lead)) if lead else 1
    target = max(8192 // max(batch, 1), 1)
    log_lanes = min(max(target.bit_length() - 1, 0), _ceil_log2(d) // 2 + 3,
                    _ceil_log2(d))
    use_kernel = cp._use_kernels(buckets.x.shape)
    if use_kernel:
        # The fused scan kernel tiles batch*lanes onto (8, 128): bump the
        # lane count to reach divisibility by 1024 when within reach.
        v2 = (batch & -batch).bit_length() - 1
        need = max(10 - v2, 0)
        if need <= _ceil_log2(d):
            log_lanes = max(log_lanes, need)
        if (batch << log_lanes) % 1024 != 0:
            use_kernel = False
    lanes = 1 << log_lanes
    log_steps = _ceil_log2(d) - log_lanes
    steps = 1 << log_steps
    pad = lanes * steps - d
    if pad:
        ident = cp.identity(curve, lead + (pad,))
        buckets = ProjPoint(*(jnp.concatenate([a, b], axis=-1)
                              for a, b in zip(buckets, ident)))
    L = buckets.x.shape[0]
    if use_kernel:
        # One fused kernel for the whole 'run += B; wsum += run' scan:
        # both accumulators stay in VMEM across the steps instead of
        # round-tripping HBM through 2*steps separate point-add calls.
        from . import backend, point_pallas
        flat = [a.reshape(L, batch * lanes, steps) for a in buckets]
        run, wsum = point_pallas.weighted_scan(curve, *flat,
                                               interpret=backend.interpret())
        t = ProjPoint(*(a.reshape((L,) + lead + (lanes,)) for a in run))
        wsum = ProjPoint(*(a.reshape((L,) + lead + (lanes,)) for a in wsum))
    else:
        # (L, *lead, lanes, steps) -> scan over steps (leading axis)
        xs = tuple(jnp.moveaxis(
            a.reshape(a.shape[:-1] + (lanes, steps)), -1, 0)
            for a in buckets)

        def body(carry, row):
            run = cp.add(curve, ProjPoint(*carry[:3]), ProjPoint(*row))
            wsum = cp.add(curve, ProjPoint(*carry[3:]), run)
            return (*run, *wsum), None

        ident = tuple(cp.identity(curve, lead + (lanes,)))
        out, _ = jax.lax.scan(body, (*ident, *ident), xs, reverse=True)
        t = ProjPoint(*out[:3])        # T_q = sum_r B_{q,r}
        wsum = ProjPoint(*out[3:])     # sum_r (r+1) B_{q,r}

    total_w = small_total(curve, wsum)
    if lanes == 1:
        return total_w
    # sum_q q*T_q = sum_{q>=1} suffix(T)_q
    suf = suffix_scan(curve, t)
    cross = small_total(curve, ProjPoint(*(a[..., 1:] for a in suf)))
    return cp.add(curve, total_w, dbl_pow2(curve, cross, log_steps))
