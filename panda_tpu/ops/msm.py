"""Pippenger multi-scalar multiplication, TPU-native.

Redesign of the reference's CUDA MSM pipeline
(``/root/reference/src/cuda/core/unit/msm/msm_cuda.cuh:552-769``).  The
reference builds per-bucket index arrays with atomicAdd/atomicSub scatters
(kernels K2-K4, lines 159-282) and runs one CUDA thread per bucket — both
impossible on TPU (no atomics, no independent threads).  The TPU
formulation keeps the same mathematical decomposition (windows of c bits,
buckets per window, Horner across windows as in ``msm_cuda.cuh:59-77``)
but computes bucket sums branch-free with sort + chunked segmented
reduction:

1. scalars: Montgomery -> canonical integers (the reference converts
   scalars out of Montgomery form first, ``msm_cuda.cuh:148-157``);
2. per window: extract c-bit digits, ``argsort`` points by digit — the
   sorted array is a concatenation of per-bucket segments;
3. phase A: a ``lax.scan`` sweeps S sorted elements per lane across M
   lanes, accumulating runs of equal digits with complete *mixed* adds and
   emitting a partial sum whenever the digit changes.  This does the N
   point-add bulk of the work with a single compiled add instance;
4. the <= 2^c + M emitted partials (still digit-sorted) are compacted by a
   cumsum scatter and combined with a segmented Hillis-Steele scan; segment
   ends scatter into the 2^c bucket table (digit 0 discarded);
5. two suffix scans turn bucket sums into sum(d * B_d) per window;
6. Horner across windows: c doublings + one add per window (``lax.scan``).

Work: ~N mixed adds + O(2^c log 2^c) general adds per window.  Every point
operation is a complete RCB formula: no lane ever branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import point as cp
from ..curves.config import CurveSpec
from ..curves.point import AffinePoint, ProjPoint
from ..fields import mont
from ..fields.config import FieldSpec
from . import reduce as red

_INIT_KEY = np.uint32(0xFFFFFFFF)   # accumulator "no key yet" sentinel


def window_bits(log_n: int) -> int:
    """Window width policy, mirroring ``msm_cuda.cuh:21-45`` but capped at
    15 so a digit never spans more than two 15-bit limbs (the reference's
    c=16 tier becomes 15: 6% more windows, half the bucket-phase work)."""
    if log_n >= 15:
        return 15
    if 13 <= log_n <= 14:
        return 14
    return max(log_n, 3)


def default_lanes(n: int) -> int:
    """Phase-A lane count: wide enough to fill the VPU, small enough that
    the partial array (2^c + lanes) stays bucket-table sized."""
    lanes = 1
    while lanes < 4096 and lanes * lanes < n:
        lanes *= 2
    return min(lanes, n)


def extract_digits(fr: FieldSpec, scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """c-bit windowed digits from canonical 15-bit-limb scalars.

    scalars_std: uint32[L, N] canonical (NOT Montgomery).  Returns (W, N)
    uint32 digits, least-significant window first.  c <= 15 so a digit
    spans at most two limbs (cross-limb splice as in
    ``msm_cuda.cuh:159-205``).
    """
    if not 1 <= c <= 15:
        raise ValueError("window width must be in [1, 15]")
    L = fr.n_limbs
    n_windows = -(-fr.bits // c)
    mask = np.uint32((1 << c) - 1)
    rows = []
    for w in range(n_windows):
        lo = w * c
        i, sh = divmod(lo, 15)
        d = scalars_std[i] >> np.uint32(sh)
        if sh + c > 15 and i + 1 < L:
            d = d | (scalars_std[i + 1] << np.uint32(15 - sh))
        rows.append(d & mask)
    return jnp.stack(rows)


def _phase_a(curve: CurveSpec, sx, sy, keys, n_buckets: int, lanes: int):
    """Chunked run-accumulation over digit-sorted points.

    Returns (partial_keys, partial_points) of static length M*(S+1), in
    global digit order, where dead entries carry key == n_buckets.
    Real partials number at most n_buckets + M.
    """
    L = sx.shape[0]
    n = sx.shape[-1]
    dead = np.uint32(n_buckets)
    m = min(lanes, n)
    steps = -(-n // m)
    pad = steps * m - n
    if pad:
        sx = jnp.pad(sx, ((0, 0), (0, pad)))
        sy = jnp.pad(sy, ((0, 0), (0, pad)))
        keys = jnp.pad(keys, (0, pad), constant_values=int(dead))

    keys_s = jnp.transpose(keys.reshape(m, steps))            # (S, M)
    sx_s = jnp.transpose(sx.reshape(L, m, steps), (2, 0, 1))  # (S, L, M)
    sy_s = jnp.transpose(sy.reshape(L, m, steps), (2, 0, 1))
    ident = cp.identity(curve, (m,))

    def step(carry, inp):
        ax, ay, az, akey = carry
        k, qx, qy = inp
        acc = ProjPoint(ax, ay, az)
        same = k == akey
        base = cp.select(same, acc, ident)
        # padded lanes carry key==dead and accumulate garbage into the dead
        # bucket; mixed add is complete in the accumulator so this is safe.
        nxt = cp.madd(curve, base, AffinePoint(qx, qy))
        emit = jnp.logical_not(same) & (akey != _INIT_KEY)
        ekey = jnp.where(emit, akey, dead)
        epoint = cp.select(emit, acc, ident)
        return (*nxt, k), (ekey, *epoint)

    init = (*ident, jnp.full((m,), _INIT_KEY))
    (fx, fy, fz, fkey), (ekeys, ex, ey, ez) = jax.lax.scan(
        step, init, (keys_s, sx_s, sy_s))

    # Per-lane order [interiors (by step), tail] == global digit order.
    def lane_major(stepwise, tail):
        # stepwise: (S, ..., M) -> (..., M, S); tail: (..., M) -> (..., M, 1)
        sw = jnp.moveaxis(stepwise, 0, -1)
        return jnp.concatenate([sw, tail[..., None]], axis=-1).reshape(
            tail.shape[:-1] + (m * (steps + 1),))

    pkeys = lane_major(ekeys, fkey)
    ppts = ProjPoint(lane_major(ex, fx), lane_major(ey, fy),
                     lane_major(ez, fz))
    return pkeys, ppts


def _compact_partials(curve: CurveSpec, pkeys, ppts: ProjPoint,
                      n_buckets: int, lanes: int):
    """Scatter live partials (key != dead) into a (n_buckets + lanes + 1)
    array, preserving digit order; padding carries the dead key."""
    dead = np.uint32(n_buckets)
    cap = n_buckets + lanes + 1
    live = pkeys != dead
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    idx = jnp.where(live, pos, cap)
    ck = jnp.full((cap,), dead).at[idx].set(pkeys, mode="drop")
    ident = cp.identity(curve, (cap,))
    cpts = ProjPoint(*(d.at[:, idx].set(s, mode="drop")
                       for d, s in zip(ident, ppts)))
    return ck, cpts


def _window_sum(curve: CurveSpec, px, py, digits_w, c: int, lanes: int):
    """Full bucket pipeline for one window; returns a single point tuple."""
    n_buckets = 1 << c
    order = jnp.argsort(digits_w)
    keys = digits_w[order].astype(jnp.uint32)
    sx = jnp.take(px, order, axis=1)
    sy = jnp.take(py, order, axis=1)

    pkeys, ppts = _phase_a(curve, sx, sy, keys, n_buckets, lanes)
    ck, cpts = _compact_partials(curve, pkeys, ppts, n_buckets,
                                 min(lanes, px.shape[-1]))

    starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), ck[1:] != ck[:-1]])
    scanned = red.segmented_prefix_scan(curve, cpts, starts)
    ends = jnp.concatenate([ck[:-1] != ck[1:], jnp.ones((1,), jnp.bool_)])
    bidx = jnp.where(ends, ck, np.uint32(n_buckets))
    ident = cp.identity(curve, (n_buckets + 1,))
    buckets = ProjPoint(*(d.at[:, bidx].set(s, mode="drop")
                          for d, s in zip(ident, scanned)))
    # Drop bucket 0 (digit 0 contributes nothing) and the dead slot.
    buckets = ProjPoint(*(a[:, 1:n_buckets] for a in buckets))
    return tuple(red.weighted_window_sum(curve, buckets))


def window_sums(curve: CurveSpec, px, py, digits, c: int,
                lanes: int | None = None) -> ProjPoint:
    """Per-window partial sums G_w.  digits: (W, N).  Returns (W, L) stacks.

    This is the unit that distributed MSM shards: each device computes
    window sums over its slice of points and partials combine with plain
    point addition (see panda_tpu.parallel.msm_sharded).
    """
    if lanes is None:
        lanes = default_lanes(px.shape[-1])
    return ProjPoint(*jax.lax.map(
        lambda d: _window_sum(curve, px, py, d, c, lanes), digits))


def horner(curve: CurveSpec, sums: ProjPoint, c: int) -> ProjPoint:
    """Combine window sums MSB->LSB with c doublings per step
    (``msm_cuda.cuh:59-77``)."""
    rev = ProjPoint(*(jnp.flip(a, axis=0) for a in sums))

    def body(acc, g):
        acc = jax.lax.fori_loop(0, c, lambda _, q: cp.dbl(curve, q), acc)
        return cp.add(curve, acc, ProjPoint(*g)), None

    init = cp.identity(curve, sums.x.shape[2:])
    out, _ = jax.lax.scan(body, init, tuple(rev))
    return out


def msm(curve: CurveSpec, px, py, scalars, c: int | None = None,
        scalars_in_mont: bool = True, lanes: int | None = None) -> ProjPoint:
    """Full MSM: returns a single homogeneous-projective point (Montgomery).

    px/py: uint32[L, N] Montgomery affine coordinates.
    scalars: uint32[Lr, N]; Montgomery form by default (the wire format of
    ``tests/test.rs:81``), converted out first like the reference.
    """
    n = px.shape[-1]
    if c is None:
        c = window_bits(max(n - 1, 1).bit_length())
    fr = curve.fr
    s_std = mont.from_mont(fr, scalars) if scalars_in_mont else scalars
    digits = extract_digits(fr, s_std, c)
    sums = window_sums(curve, px, py, digits, c, lanes)
    return horner(curve, sums, c)


@functools.lru_cache(maxsize=64)
def msm_jitted(curve: CurveSpec, c: int | None = None,
               scalars_in_mont: bool = True):
    """Cached jitted MSM; retrace happens per distinct input shape."""
    return jax.jit(functools.partial(
        msm, curve, c=c, scalars_in_mont=scalars_in_mont))
