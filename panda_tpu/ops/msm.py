"""Pippenger multi-scalar multiplication, TPU-native.

Redesign of the reference's CUDA MSM pipeline
(``/root/reference/src/cuda/core/unit/msm/msm_cuda.cuh:552-769``).  The
reference builds per-bucket index arrays with atomicAdd/atomicSub scatters
(kernels K2-K4, lines 159-282) and runs one CUDA thread per bucket — both
impossible on TPU (no atomics, no independent threads).  The TPU
formulation keeps the same mathematical decomposition (windows of c bits,
buckets per window, Horner across windows as in ``msm_cuda.cuh:59-77``)
but is organized around one wide batched scan:

1. scalars: Montgomery -> canonical integers (the reference converts
   scalars out of Montgomery form first, ``msm_cuda.cuh:148-157``);
2. ALL windows' digits are sorted at once (one batched ``sort_key_val`` —
   XLA's TPU sort is depth-bound, so the window batch is nearly free);
3. phase A: one fused Pallas scan (lax.scan fallback off-TPU) sweeps the
   sorted streams of every window in parallel — lanes = (window, block)
   pairs, each lane owning S contiguous sorted elements.  Runs of equal
   digits accumulate with complete *mixed* adds; when a lane's digit
   changes it emits its finished run segment into the emission stream at
   that lane-major slot;
4. because the digit stream is sorted, bucket b's run ends at position
   hi_b = searchsorted(keys, b, 'right'): the dense per-window bucket
   table is a D-entry GATHER from the emission stream (plus a short
   segmented scan merging the per-lane tail accumulators and one batched
   complete add) — no second sort, no scatter, no atomics;
5. a work-efficient weighted reduction (sum_d d*B_d, ~2 adds per bucket,
   batched over windows) collapses bucket tables to window sums;
6. Horner across windows: c doublings + one add per window (``lax.scan``).

Work: ~n mixed adds per window (phase A) + O(2^c) adds per window for the
bucket reduction.  Every point operation is a complete RCB formula: no
lane ever branches.
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


def _mode(kernels: str | None) -> str:
    """Resolve the kernel mode: an explicit argument wins; None falls back
    to the PANDA_PALLAS env gate (ops/backend.py).

    The mode is threaded through the pipeline as an EXPLICIT argument
    (``kernels`` in {"on", "off", "interpret", None}) rather than read
    from the environment at trace time: jax's jit trace cache is keyed on
    the function object and argument shapes only, so an env flip between
    two traces of the same callable silently returns the first
    executable — which made env-based kernel-vs-fallback A/B tests
    compare a path with itself (round-2 verdict, tests/test_msm_kernels).
    """
    from . import backend
    if kernels is not None:
        if kernels not in backend._MODES:
            raise ValueError(f"kernel mode must be one of {backend._MODES},"
                             f" got {kernels!r}")
        return kernels
    return backend.mode()


def _use_phase_a_kernel(W: int, m: int, mode: str) -> bool:
    return (W * m) % 1024 == 0 and mode != "off"


def default_lanes(n: int, windows: int = 1) -> int:
    """Per-window phase-A lane count.

    The scan step is one mixed add over windows*lanes elements; ~16K total
    elements reaches the throughput-bound regime of the fused limb kernels
    (measured on v5e: fixed ~0.2 ms per op chain below that).  More lanes
    would bloat the tail arrays and the scatter index space.
    """
    target = max(16384 // max(windows, 1), 128)
    m = 1 << (target.bit_length() - 1)
    return max(min(m, n), 1)


def signed_window_count(bits: int, c: int) -> int:
    """Windows needed for signed-digit recoding: the top window must have
    at least one headroom bit so the incoming carry cannot overflow."""
    w = -(-bits // c)
    if w * c < bits + 1:
        w += 1
    return w


def window_bits(log_n: int, bits: int = 254, lanes: int | None = None) -> int:
    """Window width c minimizing the TPU pipeline's point-op count.

    Same role as the reference's size-tiered policy (``msm_cuda.cuh:21-45``)
    but tuned to THIS pipeline's cost model: signed-digit windows (bucket
    range halved to 2^(c-1)), each costing ~n mixed adds (phase A) +
    ~2*2^(c-1) adds (weighted bucket reduction) + ~m*log(m) (tail
    collapse).  The reference's cost model (atomics + one thread per
    bucket) would pick larger c; on TPU the bucket tables are dense vector
    work, pushing the optimum down.  Capped at 16 so a digit never spans
    more than two 15-bit limbs.
    """
    def best_for(log_n: int) -> int:
        n = 1 << log_n
        best_c, best_cost = 4, None
        for c in range(4, 17):
            windows = signed_window_count(bits, c)
            m = min(lanes or default_lanes(n, windows), n)
            per_window = (n                               # phase-A mixed adds
                          + 3 * (1 << (c - 1))            # dense add + weighted
                          + m * (m.bit_length() + 2))     # tail collapse
            cost = windows * per_window
            if best_cost is None or cost < best_cost:
                best_c, best_cost = c, cost
        return best_c

    # Running max: the tail-collapse term makes the raw argmin dip briefly
    # around k=9-12; larger problems never want narrower windows (the
    # dips are within noise of each other, and monotone widths keep the
    # compiled-shape cache small across size sweeps).
    return max(best_for(k) for k in range(2, log_n + 1)) if log_n > 2 \
        else best_for(log_n)


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


def extract_signed_digits(fr: FieldSpec, scalars_std: jnp.ndarray, c: int):
    """Signed windowed recoding: digits in [-2^(c-1), 2^(c-1)].

    Returns ``(mag, neg)``: magnitudes (W, N) uint32 in [0, 2^(c-1)] and
    sign flags (W, N) bool.  Negative digits borrow one from the next
    window (carry-save recoding), halving the bucket range per window —
    bucket d holds both +d and -d contributions, the latter entering as
    the negated point.  W = ``signed_window_count(bits, c)``: the top
    window keeps a headroom bit so the final carry is absorbed.
    """
    if not 1 <= c <= 16:
        raise ValueError("window width must be in [1, 16]")
    L = fr.n_limbs
    W = signed_window_count(fr.bits, c)
    mask = np.uint32((1 << c) - 1)
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    mags, negs = [], []
    carry = None
    for w in range(W):
        lo = w * c
        i, sh = divmod(lo, 15)
        if i >= L:
            d = jnp.zeros_like(scalars_std[0])
        else:
            d = scalars_std[i] >> np.uint32(sh)
            if sh + c > 15 and i + 1 < L:
                d = d | (scalars_std[i + 1] << np.uint32(15 - sh))
        d = d & mask
        e = d if carry is None else d + carry
        neg = e > half
        mags.append(jnp.where(neg, full - e, e))
        negs.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(mags), jnp.stack(negs)


def _pack_words(curve: CurveSpec, px, py):
    from . import phase_a_pallas
    return phase_a_pallas.pack_coords_words(curve.fp, px, py)


def _cum_counts(digits: jnp.ndarray, D: int, n_real: int) -> jnp.ndarray:
    """hi_b = #(digit <= b) per window, for b = 1..D — scatter-free.

    ``digits``: (W, N) uint32 in [0, D] plus dead sentinels > D (ignored).
    ``n_real``: count of non-dead entries per window (static).

    Computed as a one-hot x one-hot int8 matmul histogram on the MXU plus
    a cumsum — replacing per-target binary search (jnp.searchsorted runs
    ~log2(N) serialized gather rounds per target: measured 292 ms vs
    54 ms at W=16, N=2^20, D=2^15 on v5e).  The digit-minus-one trick
    maps digit 0 and the dead sentinel out of every one-hot row, so the
    zero bucket enters only through the closed-form ``count0``.
    """
    from . import backend
    W, N = digits.shape
    if backend.kernels_enabled() and N % 128 == 0:
        # Fused kernel: one-hots live in registers, the (HI, LO) count
        # matrix accumulates in VMEM — the XLA path below materializes
        # ~6 GB of one-hot int8 tensors in HBM at W=16, N=2^20 (54 ms
        # measured for ~3 ms of MACs).
        from . import hist_pallas
        hist = hist_pallas.hist_counts(digits, D,
                                       interpret=backend.interpret())
        count0 = np.int32(n_real) - hist.sum(axis=1, keepdims=True)
        return count0 + jnp.cumsum(hist, axis=1)      # (W, D) int32
    bins = 1 << max((D - 1).bit_length(), 1)          # power of two >= D
    lo_bits = bins.bit_length() // 2
    LO = 1 << lo_bits
    HI = bins // LO
    d1 = digits - np.uint32(1)                        # 0 wraps out of range
    dh = (d1 >> np.uint32(lo_bits)).astype(jnp.int32)
    dl = (d1 & np.uint32(LO - 1)).astype(jnp.int32)
    A = (dh[:, None, :] == jnp.arange(HI, dtype=jnp.int32)[None, :, None]
         ).astype(jnp.int8)                           # (W, HI, N)
    B = (dl[:, :, None] == jnp.arange(LO, dtype=jnp.int32)[None, None, :]
         ).astype(jnp.int8)                           # (W, N, LO)
    cnt = jax.lax.dot_general(
        A, B, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)             # (W, HI, LO)
    hist = cnt.reshape(W, bins)[:, :D]                # #(digit == b), b=1..D
    count0 = np.int32(n_real) - hist.sum(axis=1, keepdims=True)
    return count0 + jnp.cumsum(hist, axis=1)          # (W, D) int32


# Below this target count, per-target binary search beats the histogram
# matmul (and tiny one-hot matmuls waste MXU tiles).
_HIST_MIN_D = 512


def _locate_runs(keys_sorted: jnp.ndarray, digits: jnp.ndarray, D: int,
                 n_real: int) -> jnp.ndarray:
    """Run-end positions hi_b (b = 1..D) in the sorted digit stream."""
    if D < _HIST_MIN_D:
        targets = jnp.arange(1, D + 1, dtype=jnp.uint32)
        return jax.vmap(lambda k: jnp.searchsorted(
            k, targets, side="right"))(keys_sorted).astype(jnp.int32)
    return _cum_counts(digits, D, n_real)


def _bucket_tables(curve: CurveSpec, px, py, digits, c: int, m: int,
                   signs=None, pk=None, kernels: str | None = None):
    """Phase A for all windows at once: returns the dense bucket tables
    ProjPoint arrays (L, W, D) holding B_1..B_D per window, where
    D = 2^(c-1) with signed digits (``signs`` given; negative digits enter
    as the negated point, halving the bucket range) or 2^c - 1 without.

    Scatter-free by construction: XLA scatter serializes per index on TPU
    (measured ~25 us/index on v5e), so the pipeline only ever uses sorts,
    gathers and dense selects.  The emission stream inherits the digit
    sort's order, so each bucket's run-end slot is computable by binary
    search over the sorted keys and the dense table is a batched GATHER —
    the only point work after the scan is the log2(m)-level tail merge,
    one complete add per bucket, and the weighted reduction.
    """
    W, n = digits.shape
    D = (1 << (c - 1)) if signs is not None else (1 << c) - 1
    B = np.uint32(D + 1)                # dead key; real digits 0..D
    steps = -(-n // m)
    pad = steps * m - n

    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.uint32)[None], (W, n))
    if signs is not None:
        # Sign rides in bit 31 of the index through the sort/gather.
        idx = idx | (signs.astype(jnp.uint32) << np.uint32(31))
    keys, sidx = jax.lax.sort_key_val(digits.astype(jnp.uint32), idx,
                                      dimension=1)
    if pad:
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=int(B))
        sidx = jnp.pad(sidx, ((0, 0), (0, pad)))
    oi = sidx & np.uint32(0x7FFFFFFF)
    sgn = sidx >> np.uint32(31)
    P = m * steps
    targets = jnp.arange(1, D + 1, dtype=jnp.uint32)    # buckets 1..D
    # A bucket's sorted run occupies ONE contiguous range [lo, hi), so its
    # final-lane segment is emitted at EXACTLY lane-major slot hi (the step
    # where the lane's key changes) — no sort of the emission stream is
    # needed: hi_b = #(digit <= b) turns the dense table build into a
    # D-entry GATHER per window.  Lanes fully covered by a run, and runs
    # ending exactly on a lane boundary, contribute through the per-lane
    # tails instead.  hi comes from the matmul histogram (_cum_counts),
    # not per-target binary search.
    hi = _locate_runs(keys, digits.astype(jnp.uint32), D, n)  # (W, D)
    slot = jnp.clip(hi, 0, P - 1)
    ident = cp.identity(curve, (W, D))

    mode = _mode(kernels)
    if _use_phase_a_kernel(W, m, mode):
        from . import phase_a_pallas
        # Blocked lanes: lane q of window w owns sorted positions
        # [q*steps, (q+1)*steps); flat lane j = w*m + q maps to tile
        # (j//1024, (j%1024)//128, j%128).  ONLY the small u32 index /
        # key / sign arrays are transposed into the (S, T, 8, 128) tile
        # layout; the ~100x larger coordinate stream is gathered directly
        # into kernel tiles and never transposed.
        T = (W * m) // 1024

        def tile_k(a):        # (W, P) -> (S, T, 8, 128)
            return jnp.transpose(a.reshape(W, m, steps),
                                 (2, 0, 1)).reshape(steps, T, 8, 128)

        oi5 = tile_k(oi)
        # ONE row gather of the word-packed coordinate table
        # ((n, 2*W32) u32 rows, x and y as full 32-bit words): XLA's
        # gather cost is per-index, so single-row gathers are ~1.5x
        # faster than any plane-gather form (tools/profile_gather3-5);
        # the transpose back to word planes fuses in for free.  The
        # gather is the single largest phase-A cost at large n.
        if pk is None:
            pk = phase_a_pallas.pack_coords_words(curve.fp, px, py)
        q = jnp.take(pk, oi5, axis=0)          # (S, T, 8, 128, 2*W32)
        q5 = phase_a_pallas.split_words(q)     # (2*W32, S, T, 8, 128)
        ek5, ep5, tk4, tx4, ty4, tz4 = \
            phase_a_pallas.phase_a_scan_tiles(
                curve, tile_k(keys), tile_k(sgn), q5, int(B),
                interpret=(mode == "interpret"))
        # Interior pick straight off the kernel's native emission tiles.
        # Emissions are bit-packed (two limbs per u32; x|y|z blocks of Lp
        # rows) so the scattered pick reads HALF the planes.
        s_i = slot % steps
        j = jnp.arange(W, dtype=jnp.int32)[:, None] * m + slot // steps
        t_i, r = j // 1024, j % 1024
        sub, lane = r // 128, r % 128
        k_at = ek5[s_i, t_i, sub, lane]                 # (W, D)
        valid_i = (k_at == targets[None]) & ((hi % steps) != 0)
        L = px.shape[0]
        Lp = -(-L // 2)
        epick = ep5[s_i, t_i, :, sub, lane]             # (W, D, 3*Lp)

        def unpack(block):                              # (W, D, Lp)->(L, W, D)
            w = jnp.moveaxis(block, -1, 0)              # (Lp, W, D)
            return jnp.stack([w & np.uint32(0xFFFF),
                              w >> np.uint32(16)],
                             axis=1).reshape(2 * Lp, *w.shape[1:])[:L]

        ipts = ProjPoint(unpack(epick[..., :Lp]),
                         unpack(epick[..., Lp:2 * Lp]),
                         unpack(epick[..., 2 * Lp:]))   # (L, W, D)
        tkeys = tk4.reshape(W, m)

        def tail_c(a):        # (T, L, 8, 128) -> (L, W, m)
            return jnp.transpose(a, (1, 0, 2, 3)).reshape(-1, W, m)

        tpts = ProjPoint(tail_c(tx4), tail_c(ty4), tail_c(tz4))
    else:
        qx_all = jnp.take(px, oi, axis=1)               # (L, W, m*steps)
        qy_all = jnp.take(py, oi, axis=1)
        if signs is not None:
            qy_all = mont.select(sgn.astype(jnp.bool_),
                                 mont.neg_mod(curve.fp, qy_all), qy_all)
        keys_s = jnp.transpose(keys.reshape(W, m, steps), (2, 0, 1))

        def coord_s(a):   # (L, W, m*steps) -> (S, L, W, m)
            return jnp.transpose(
                a.reshape(a.shape[0], W, m, steps), (3, 0, 1, 2))

        qx_s, qy_s = coord_s(qx_all), coord_s(qy_all)
        ident_lane = cp.identity(curve, (W, m))

        def step(carry, inp):
            ax, ay, az, akey = carry
            k, qx, qy = inp                             # (W, m) / (L, W, m)
            acc = ProjPoint(ax, ay, az)
            same = k == akey
            emit = jnp.logical_not(same) & (akey != _INIT_KEY)
            ekey = jnp.where(emit, akey, B)
            epts = cp.select(emit, acc, ident_lane)
            base = cp.select(same, acc, ident_lane)
            nxt = cp.madd(curve, base, AffinePoint(qx, qy))
            return (*nxt, k), (ekey, *epts)

        init = (*ident_lane, jnp.full((W, m), _INIT_KEY))
        (fx, fy, fz, fkey), (ekeys, ex, ey, ez) = jax.lax.scan(
            step, init, (keys_s, qx_s, qy_s))

        def lane_major(stepwise):
            sw = jnp.moveaxis(stepwise, 0, -1)          # (..., W, m, S)
            return sw.reshape(sw.shape[:-2] + (m * steps,))

        pkeys = lane_major(ekeys)                       # (W, P)
        ppts = ProjPoint(lane_major(ex), lane_major(ey), lane_major(ez))
        k_at = jnp.take_along_axis(pkeys, slot, axis=1)
        # Valid interior emission: the slot really carries bucket b's key
        # and the run boundary is interior to a lane (hi % steps == 0
        # covers the lane-boundary case and empty-run hi == 0 / hi == P).
        valid_i = (k_at == targets[None]) & ((hi % steps) != 0)
        ipts = ProjPoint(*(jnp.take_along_axis(a, slot[None], axis=-1)
                           for a in ppts))              # (L, W, D)
        tkeys = jnp.where(fkey == _INIT_KEY, B, fkey)   # (W, m)
        tpts = ProjPoint(fx, fy, fz)

    interior = cp.select(valid_i, ipts, ident)

    # Tails: lane q's tail is its final run segment; tail keys are
    # nondecreasing across lanes by construction.  Merge equal-key runs
    # (a bucket spanning whole lanes leaves one tail per covered lane)
    # with one short segmented scan; the run's LAST entry holds the merged
    # total, found again by binary search.
    tstarts = jnp.concatenate(
        [jnp.ones((W, 1), jnp.bool_), tkeys[:, 1:] != tkeys[:, :-1]], axis=1)
    tsum = red.segmented_prefix_scan(curve, tpts, tstarts, max_seg=m)
    # Lanes whose final element is padding carry the dead key: exactly
    # m - n//steps of them (pad occupies the stream's tail), so the
    # histogram's zero-bucket closed form must count only live lanes.
    tpos = _locate_runs(tkeys, tkeys, D, n // steps) - 1  # (W, D), may be -1
    tslot = jnp.clip(tpos, 0, m - 1)
    tk_at = jnp.take_along_axis(tkeys, tslot, axis=1)
    valid_t = (tk_at == targets[None]) & (tpos >= 0)
    tpick = ProjPoint(*(jnp.take_along_axis(a, tslot[None], axis=-1)
                        for a in tsum))                 # (L, W, D)
    tails = cp.select(valid_t, tpick, ident)

    # B_b = interior segment + merged tails: one batched complete add.
    return cp.add(curve, interior, tails)


# Upper bound on W_g * n elements staged by one phase-A pass.  One pass
# stages the pre-gathered sorted point stream (2 coords) plus the emission
# stream (3 coords), ~340 B/element for BN254; 2^22 elements ~ 1.4 GB peak
# — safe headroom in 16 GB HBM for sort buffers and bucket tables.
_PHASE_A_BUDGET = 1 << 22

# Point-chunk size for large n — deliberately SMALLER than the staging
# budget: XLA's HBM row gather degrades ~3x per index once the gather
# table outgrows ~2^20 64-byte rows (measured on v5e: 6.6-8.1 ns/row from
# a 2^20-row table vs 24-26 ns/row from 2^21+; sub-2^17 tables reach
# ~2.3 ns/row — tools/profile_gather6.py sweep).  Chunking points keeps
# every per-pass gather in the fast regime; the window-group size within
# a chunk still derives from _PHASE_A_BUDGET (wg = budget/chunk windows
# per pass).  PANDA_MSM_CHUNK_LOG overrides for on-chip tuning.
import os as _os

_CHUNK_N = 1 << int(_os.environ.get("PANDA_MSM_CHUNK_LOG", "20"))


def _window_group_size(n: int, W: int) -> int:
    g = max(_PHASE_A_BUDGET // max(n, 1), 1)
    return min(g, W)


def window_sums(curve: CurveSpec, px, py, digits, c: int,
                lanes: int | None = None, signs=None,
                kernels: str | None = None, pk=None) -> ProjPoint:
    """Per-window partial sums G_w.  digits: (W, N).  Returns (W, L) stacks.

    This is the unit that distributed MSM shards: each device computes
    window sums over its slice of points and partials combine with plain
    point addition (see panda_tpu.parallel.msm_sharded).

    Large problems are processed in groups of windows (``lax.scan`` over
    groups, one compiled phase-A body): peak memory is bounded by
    ``_PHASE_A_BUDGET`` staged elements regardless of total size, the
    large-k analog of the reference processing all windows in one kernel
    launch sequence (``msm_cuda.cuh:604-610`` allocates the full
    groups_num*msm_size index arena up front — unworkable at k >= 20 on a
    16 GB chip).

    ``pk``: optional precomputed packed-coordinate gather table
    (``phase_a_pallas.pack_coords_words(fp, px, py)``) — the
    bases-dependent, scalar-independent device precompute a session caches
    per bases set (the TPU analog of the reference's cached-bases
    precompute hook, ``msm_host.cuh:248-265``); built on the fly if None.
    """
    from . import backend
    W, n = digits.shape
    mode = _mode(kernels)
    # Pin the mode for the whole trace: nested gates (point kernels,
    # weighted scan, digit recode) all see the same coherent choice.
    with backend.forced(mode):
        if n > _CHUNK_N:
            return _window_sums_chunked(curve, px, py, digits, c, lanes,
                                        signs, kernels=mode, pk=pk)
        wg = _window_group_size(n, W)
        if wg >= W:
            m = min(lanes or default_lanes(n, W), n)
            if pk is None and _use_phase_a_kernel(W, m, mode):
                pk = _pack_words(curve, px, py)
            buckets = _bucket_tables(curve, px, py, digits, c, m,
                                     signs=signs, pk=pk, kernels=mode)
            sums = red.weighted_window_sum(curve, buckets)      # (L, W)
            return ProjPoint(*(jnp.transpose(a) for a in sums))  # (W, L)
        groups = -(-W // wg)
        pad = groups * wg - W
        if pad:
            # Padded windows get digit 0 everywhere -> identity sums.
            digits = jnp.pad(digits, ((0, pad), (0, 0)))
            if signs is not None:
                signs = jnp.pad(signs, ((0, pad), (0, 0)))
        dg = digits.reshape(groups, wg, n)
        sg = (signs.reshape(groups, wg, n) if signs is not None
              else jnp.zeros((groups, wg, n), jnp.bool_))
        m = min(lanes or default_lanes(n, wg), n)
        # The packed gather table is digit-independent: build it ONCE
        # outside the per-group scan body (or take the session's cached
        # copy).
        if pk is None and _use_phase_a_kernel(wg, m, mode):
            pk = _pack_words(curve, px, py)

        def body(_, inp):
            d, s = inp
            buckets = _bucket_tables(curve, px, py, d, c, m,
                                     signs=s if signs is not None else None,
                                     pk=pk, kernels=mode)
            return None, tuple(red.weighted_window_sum(curve, buckets))

        _, out = jax.lax.scan(body, None, (dg, sg))           # (G, L, wg) x3
        return ProjPoint(*(
            jnp.moveaxis(a, 0, 1).reshape(a.shape[1], groups * wg)
            .transpose()[:W] for a in out))                   # (W, L)


def _window_sums_chunked(curve: CurveSpec, px, py, digits, c: int,
                         lanes, signs, kernels: str | None = None,
                         pk=None) -> ProjPoint:
    """Point-chunked window sums for n beyond ``_CHUNK_N``.

    Splits the points into ``_CHUNK_N``-sized chunks (sized to keep the
    per-pass coordinate gather in XLA's fast small-table regime — see the
    ``_CHUNK_N`` comment) and runs the window-grouped phase-A per chunk
    under one compiled ``lax.scan`` body.  Unlike a per-chunk
    window-sum, the DENSE BUCKET TABLES accumulate across chunks (one
    complete add of the (L, W, D) table per chunk — buckets are sums, so
    chunk order is immaterial) and the weighted reduction runs ONCE at
    the end: at 2^22 this replaces 16 per-group weighted reductions
    (~0.46 s) with one (~34 ms).  The single-chip analog of the
    multi-chip points sharding (parallel/msm_sharded.py), and the fix for
    the reference's up-front full-size index arena
    (``msm_cuda.cuh:604-610``) which cannot scale to k >= 23 on one
    device.  Padded points carry digit 0 = the excluded zero bucket, so
    they contribute the identity.
    """
    W, n = digits.shape
    ncap = _CHUNK_N
    chunks = -(-n // ncap)
    pad = chunks * ncap - n
    if pad:
        digits = jnp.pad(digits, ((0, 0), (0, pad)))
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        if signs is not None:
            signs = jnp.pad(signs, ((0, 0), (0, pad)))
        if pk is not None:
            pk = jnp.pad(pk, ((0, pad), (0, 0)))
    L = px.shape[0]
    wg = _window_group_size(ncap, W)
    groups = -(-W // wg)
    wpad = groups * wg - W
    if wpad:
        # Padded windows get digit 0 everywhere -> identity sums.
        digits = jnp.pad(digits, ((0, wpad), (0, 0)))
        if signs is not None:
            signs = jnp.pad(signs, ((0, wpad), (0, 0)))
    Wp = groups * wg
    m = min(lanes or default_lanes(ncap, wg), ncap)
    D = (1 << (c - 1)) if signs is not None else (1 << c) - 1

    pxr = jnp.moveaxis(px.reshape(L, chunks, ncap), 1, 0)     # (C, L, ncap)
    pyr = jnp.moveaxis(py.reshape(L, chunks, ncap), 1, 0)
    # (C, G, wg, ncap)
    dgr = jnp.moveaxis(digits.reshape(Wp, chunks, ncap), 1, 0) \
        .reshape(chunks, groups, wg, ncap)
    sgr = (jnp.moveaxis(signs.reshape(Wp, chunks, ncap), 1, 0)
           if signs is not None
           else jnp.zeros((Wp, chunks, ncap), jnp.bool_)
           ).reshape(chunks, groups, wg, ncap)
    pkr = (pk.reshape(chunks, ncap, pk.shape[-1])
           if pk is not None else None)
    mode = _mode(kernels)

    def chunk_body(acc, inp):
        pxc, pyc, dc, sc, pkc = inp
        if pkc is None and _use_phase_a_kernel(wg, m, mode):
            pkc = _pack_words(curve, pxc, pyc)

        def group_body(_, gin):
            d, s = gin
            bt = _bucket_tables(curve, pxc, pyc, d, c, m,
                                signs=s if signs is not None else None,
                                pk=pkc, kernels=mode)
            return None, tuple(bt)                  # (L, wg, D) x3

        _, bts = jax.lax.scan(group_body, None, (dc, sc))   # (G, L, wg, D)
        part = ProjPoint(*(
            jnp.moveaxis(a, 0, 1).reshape(L, Wp, D) for a in bts))
        return tuple(cp.add(curve, ProjPoint(*acc), part)), None

    acc0 = tuple(cp.identity(curve, (Wp, D)))               # (L, Wp, D)
    if pkr is None:
        def body_nopk(acc, inp):
            return chunk_body(acc, (*inp, None))
        acc, _ = jax.lax.scan(body_nopk, acc0, (pxr, pyr, dgr, sgr))
    else:
        acc, _ = jax.lax.scan(chunk_body, acc0, (pxr, pyr, dgr, sgr, pkr))
    sums = red.weighted_window_sum(curve, ProjPoint(*acc))  # (L, Wp)
    return ProjPoint(*(jnp.transpose(a)[:W] for a in sums))  # (W, L)


def signed_digit_arrays(fr: FieldSpec, scalars, c: int,
                        scalars_in_mont: bool = True,
                        kernels: str | None = None):
    """(mags, negs) signed-digit recode of scalars, fused on TPU.

    One Pallas kernel covers from-Montgomery conversion + canonicalization
    + the W-window recode (ops/digits_pallas.py); the jnp path is the
    bit-identical fallback."""
    n = scalars.shape[-1]
    mode = _mode(kernels)
    if n % 1024 == 0 and mode != "off":
        from . import digits_pallas
        W = signed_window_count(fr.bits, c)
        return digits_pallas.signed_digits(fr, scalars, c, W,
                                           from_mont=scalars_in_mont,
                                           interpret=(mode == "interpret"))
    s_std = mont.from_mont(fr, scalars) if scalars_in_mont else scalars
    return extract_signed_digits(fr, s_std, c)


def window_sums_fn(curve: CurveSpec, c: int, scalars_in_mont: bool = True,
                   kernels: str | None = None, with_pk: bool = False):
    """(px, py, scalars[, pk]) -> window-sum arrays (W, L) x3 — the device
    part of the byte-API MSM (the Horner tail runs on host, as in the
    reference: ``msm_cuda.cuh:738-743`` copies the window sums to host and
    combines there).  ``with_pk`` adds a 4th argument: the session-cached
    packed gather table for the bases set."""

    def fn(px, py, scalars, pk=None):
        mags, negs = signed_digit_arrays(curve.fr, scalars, c,
                                         scalars_in_mont, kernels=kernels)
        return tuple(window_sums(curve, px, py, mags, c, signs=negs,
                                 kernels=kernels, pk=pk))

    if with_pk:
        return fn
    return lambda px, py, scalars: fn(px, py, scalars)


@functools.lru_cache(maxsize=64)
def window_sums_jitted(curve: CurveSpec, c: int, scalars_in_mont: bool = True,
                       with_pk: bool = False):
    return jax.jit(window_sums_fn(curve, c, scalars_in_mont,
                                  with_pk=with_pk))


def host_horner(curve: CurveSpec, sums_np, c: int):
    """Horner over host-side window sums (``msm_cuda.cuh:59-77`` — the
    reference also runs this phase on the host).

    sums_np: three numpy (W, L) internal-Montgomery limb arrays
    (homogeneous projective).  Returns the affine result as plain ints
    (x, y) or None for the identity.  ~bits doublings of a single point are
    pure latency on an accelerator; in host big-int arithmetic they are
    microseconds.
    """
    from ..fields.config import limbs_to_int
    from ..reference import curve_ref
    p = curve.fp.modulus
    rinv = pow(curve.fp.r, -1, p)
    xs, ys, zs = (np.asarray(a) for a in sums_np)
    acc = None
    for w in reversed(range(xs.shape[0])):
        for _ in range(c):
            acc = curve_ref.ec_add(curve, acc, acc)
        z = limbs_to_int(zs[w]) * rinv % p
        if z == 0:
            continue
        zi = pow(z, -1, p)
        gx = limbs_to_int(xs[w]) * rinv % p * zi % p
        gy = limbs_to_int(ys[w]) * rinv % p * zi % p
        acc = curve_ref.ec_add(curve, acc, (gx, gy))
    return acc


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
        scalars_in_mont: bool = True, lanes: int | None = None,
        kernels: str | None = None) -> ProjPoint:
    """Full MSM: returns a single homogeneous-projective point (Montgomery).

    px/py: uint32[L, N] Montgomery affine coordinates.
    scalars: uint32[Lr, N]; Montgomery form by default (the wire format of
    ``tests/test.rs:81``), converted out first like the reference.
    """
    n = px.shape[-1]
    if c is None:
        c = window_bits(max(n - 1, 1).bit_length())
    mags, negs = signed_digit_arrays(curve.fr, scalars, c, scalars_in_mont,
                                     kernels=kernels)
    sums = window_sums(curve, px, py, mags, c, lanes, signs=negs,
                       kernels=kernels)
    return horner(curve, sums, c)


@functools.lru_cache(maxsize=64)
def msm_jitted(curve: CurveSpec, c: int | None = None,
               scalars_in_mont: bool = True):
    """Cached jitted MSM; retrace happens per distinct input shape."""
    return jax.jit(functools.partial(
        msm, curve, c=c, scalars_in_mont=scalars_in_mont))
