"""Pallas TPU kernel for the MSM phase-A bucket-accumulation scan.

The jnp/lax.scan formulation of phase A (ops/msm.py) is correct but pays
XLA fusion-boundary and kernel-launch overhead on every scan step: the
complete-madd formula expands to hundreds of vector ops which XLA splits
into many small kernels over (W, m)-shaped operands.  This module runs the
ENTIRE scan as one `pallas_call`: the per-lane accumulator lives in VMEM
scratch across the sequential grid steps, every intermediate of the field
arithmetic stays in vector registers / VMEM, and each (8, 128) lane tile
streams its sorted point blocks through a single fused kernel.

I/O is in the kernel's native tile layout — the caller gathers the sorted
point stream DIRECTLY into (L, S, T, 8, 128) tiles by permuting the sort's
index payload (a small u32 transpose) instead of transposing the ~100x
larger coordinate arrays, and the digit sign is applied in-kernel (one
select per element) rather than as a separate negation pass over the
gathered stream.  Downstream consumers read the emission stream with
tile-indexed gathers (see ``msm._bucket_tables``); nothing ever transposes
an (S, T, L, 8, 128) array.

The coordinate stream is gathered as (n, 2*W32) u32 ROWS (x and y packed
to full 32-bit words, ``pack_coords_words``): XLA's TPU gather cost is
per INDEX, nearly independent of row bytes up to ~64 B, so single-row
gathers beat the W32-gather u32-plane form ~1.5x (measured on v5e:
109 ms vs 166-175 ms for W*n = 2^24 indices; see tools/profile_gather*).
Row dtype is uint32 on purpose: an earlier u64-row variant of this pack
silently truncated to uint32 under JAX's default ``jax_enable_x64=False``
(``astype(jnp.uint64)`` is a no-op warn-and-truncate there), zeroing
every odd 32-bit word of every coordinate — u32 rows carry the same
bytes per row with no dtype hazard.  The transpose back to word-major
tiles fuses into the gather; the kernel unpacks 32-bit words -> 15-bit
limbs at load (~4 vector ops per limb, noise next to the madd).

Field/point math inside the kernel is a dedicated limb-list
implementation (each limb one (8, 128) uint32 tile): Mosaic compiles
straight-line vector code without the op-count blowup that forced the
tensorized rewrite on the XLA side, and without pad/update-slice ops.
The formulas mirror fields/mont.py (15-bit limbs, carry-free schoolbook
product + interleaved Montgomery reduction; reference contract
``/root/reference/src/cuda/core/field/field.cuh:139-247``) and
curves/point.py (complete RCB madd, ``projective.cuh:259`` semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.config import CurveSpec
from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec
from .kernel_field import _madd, _select

_MASK = np.uint32(LIMB_MASK)
_BASE = np.uint32(1 << LIMB_BITS)
_INIT_KEY = np.uint32(0xFFFFFFFF)

# ---------------------------------------------------------------------------
# Kernel + host wrapper
# ---------------------------------------------------------------------------


def _identity_lists(curve: CurveSpec):
    f = curve.fp
    zero = [jnp.zeros((8, 128), jnp.uint32)] * f.n_limbs
    one = [jnp.full((8, 128), np.uint32(v)) for v in f.one_limbs]
    return zero, one


def _neg2p(spec: FieldSpec, y):
    """2p - y on a normalized limb list (y < 2p); borrow-chain subtract."""
    tp = spec.two_p_limbs
    out, borrow = [], None
    for i in range(spec.n_limbs):
        t = np.uint32(tp[i]) + _BASE - y[i]
        if borrow is not None:
            t = t - borrow
        out.append(t & _MASK)
        borrow = np.uint32(1) - (t >> LIMB_BITS)
    return out


def _pack_pairs(limbs):
    """Limb list (< 2^16 each) -> half-length list, two limbs per u32."""
    padded = list(limbs) + ([jnp.zeros_like(limbs[0])] if len(limbs) % 2
                            else [])
    return [padded[2 * i] | (padded[2 * i + 1] << np.uint32(16))
            for i in range(len(padded) // 2)]


def n_words32(spec: FieldSpec) -> int:
    """u32 words per coordinate in the packed gather row: covers the
    < 2p Montgomery coordinate class."""
    return -(-(2 * spec.modulus - 1).bit_length() // 32)


def _unpack_words(spec: FieldSpec, rows):
    """W32 full 32-bit u32 word tiles -> n_limbs 15-bit limb tiles.

    The packed row covers the < 2p coordinate class (n_words32); specs
    whose limb count is padded for the R >= 4096p headroom (e.g.
    BLS12-381: 27 limbs, bits 390+ always zero for coordinates) have top
    limbs entirely beyond the row — emitted as zero tiles."""
    W32 = len(rows)
    limbs = []
    for i in range(spec.n_limbs):
        j, sh = divmod(LIMB_BITS * i, 32)
        if j >= W32:
            limbs.append(jnp.zeros_like(rows[0]))
            continue
        v = rows[j] >> np.uint32(sh) if sh else rows[j]
        if sh > 32 - LIMB_BITS and j + 1 < W32:
            v = v | (rows[j + 1] << np.uint32(32 - sh))
        limbs.append(v & _MASK)
    return limbs


def _kernel(curve: CurveSpec, dead: int, SB: int, U: int,
            keys_ref, sgn_ref, q_ref,
            ekeys_ref, ep_ref,
            tkeys_ref, tx_ref, ty_ref, tz_ref,
            accx, accy, accz, acck):
    f = curve.fp
    L = f.n_limbs
    Lp = -(-L // 2)
    W32 = n_words32(f)
    sb = pl.program_id(1)
    zero, one = _identity_lists(curve)

    @pl.when(sb == 0)
    def _init():
        for i in range(L):
            accx[i] = zero[i]
            accy[i] = one[i]
            accz[i] = zero[i]
        acck[...] = jnp.full((8, 128), _INIT_KEY)

    # U sequential scan steps per grid invocation: the VMEM-scratch
    # accumulator round-trips and the per-step grid/pipelining overhead
    # amortize over U madds (the madd itself is the compute floor).
    for u in range(U):
        k = keys_ref[u, 0]
        sgn = sgn_ref[u, 0] != 0
        # The coordinate stream arrives as full 32-bit words (x words then
        # y words — the u32 row gather's planes): minimum per-index
        # gather volume; unpacked to 15-bit limbs here.
        qp = [q_ref[i, u, 0] for i in range(2 * W32)]
        qx = _unpack_words(f, qp[:W32])
        qy = _unpack_words(f, qp[W32:])
        qy = _select(sgn, _neg2p(f, qy), qy)
        if u == 0:
            ax = [accx[i] for i in range(L)]
            ay = [accy[i] for i in range(L)]
            az = [accz[i] for i in range(L)]
            akey = acck[...]

        same = k == akey
        emit = jnp.logical_not(same) & (akey != _INIT_KEY)
        ekeys_ref[u, 0] = jnp.where(emit, akey, np.uint32(dead))
        # Emissions are written bit-packed (two normalized 15-bit limbs
        # per u32, x|y|z blocks of Lp rows) — HALF the HBM write volume
        # of the emission stream AND half the scattered-gather planes for
        # the downstream interior picks in msm._bucket_tables.
        ex = _pack_pairs(_select(emit, ax, zero))
        ey = _pack_pairs(_select(emit, ay, one))
        ez = _pack_pairs(_select(emit, az, zero))
        for i in range(Lp):
            ep_ref[u, 0, i] = ex[i]
            ep_ref[u, 0, Lp + i] = ey[i]
            ep_ref[u, 0, 2 * Lp + i] = ez[i]

        bx = _select(same, ax, zero)
        by = _select(same, ay, one)
        bz = _select(same, az, zero)
        ax, ay, az = _madd(curve, bx, by, bz, qx, qy)
        akey = k

    for i in range(L):
        accx[i] = ax[i]
        accy[i] = ay[i]
        accz[i] = az[i]
    acck[...] = akey

    @pl.when(sb == SB - 1)
    def _tails():
        tkeys_ref[0] = jnp.where(akey == np.uint32(dead), np.uint32(dead),
                                 akey)
        for i in range(L):
            tx_ref[0, i] = ax[i]
            ty_ref[0, i] = ay[i]
            tz_ref[0, i] = az[i]


def pack_coords(spec: FieldSpec, px: jnp.ndarray,
                py: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack affine coordinates: two 15-bit limbs per u32 word, x rows
    then y rows -> (2*ceil(L/2), n).  (Plane-gather form; the phase-A
    pipeline now uses :func:`pack_coords_words` — kept for tools/tests.)"""
    L = spec.n_limbs
    if L % 2:
        pad = jnp.zeros((1,) + px.shape[1:], jnp.uint32)
        px = jnp.concatenate([px, pad], axis=0)
        py = jnp.concatenate([py, pad], axis=0)
    pkx = px[0::2] | (px[1::2] << np.uint32(16))
    pky = py[0::2] | (py[1::2] << np.uint32(16))
    return jnp.concatenate([pkx, pky], axis=0)


def _limbs_to_words(spec: FieldSpec, a: jnp.ndarray) -> list:
    """(L, n) normalized 15-bit limbs -> W32 full 32-bit u32 word planes
    (little-endian).  Limb bit-ranges are disjoint, so each word is an OR
    of at most three shifted limbs."""
    W32 = n_words32(spec)
    words = []
    for j in range(W32):
        w = None
        for i in range(spec.n_limbs):
            lo, hi = LIMB_BITS * i, LIMB_BITS * i + LIMB_BITS
            if hi <= 32 * j or lo >= 32 * j + 32:
                continue
            sh = lo - 32 * j
            part = (a[i] << np.uint32(sh)) if sh >= 0 \
                else (a[i] >> np.uint32(-sh))
            w = part if w is None else (w | part)
        words.append(w if w is not None else jnp.zeros_like(a[0]))
    return words


def pack_coords_words(spec: FieldSpec, px: jnp.ndarray,
                      py: jnp.ndarray) -> jnp.ndarray:
    """Pack affine coordinates into (n, 2*W32) uint32 gather ROWS.

    Row layout: the 2*W32 little-endian u32 words
    [x_0..x_{W32-1}, y_0..y_{W32-1}] (full 32-bit packing of each < 2p
    coordinate).  One row gather is the fastest per-point fetch XLA
    offers on TPU (cost is per index, row bytes ~free to ~64 B — see
    module docstring).  uint32 rows by design: u64 rows truncate
    silently under default jax_enable_x64=False."""
    wx = _limbs_to_words(spec, px)
    wy = _limbs_to_words(spec, py)
    out = jnp.stack(wx + wy, axis=-1)             # (n, 2*W32) uint32
    assert out.dtype == jnp.uint32, out.dtype
    return out


def split_words(q: jnp.ndarray) -> jnp.ndarray:
    """Gathered (S, T, 8, 128, 2*W32) u32 rows -> (2*W32, S, T, 8, 128)
    u32 word planes (fuses into the gather — measured free on v5e)."""
    assert q.dtype == jnp.uint32, q.dtype
    return jnp.transpose(q, (4, 0, 1, 2, 3))


def phase_a_scan_tiles(curve: CurveSpec, keys5, sgn5, q5, dead: int,
                       interpret: bool = False):
    """Run the phase-A scan kernel on native tile layouts.

    keys5/sgn5: (S, T, 8, 128) uint32 — sorted digit / sign per element;
    q5: (2*W32, S, T, 8, 128) gathered coordinate word planes
    (``split_words`` of the ``pack_coords_words`` row gather; sign NOT yet
    applied — the kernel negates y where sgn5 is set).  T*1024
    covers the flattened (window, lane) space.  Returns raw tiles:

      ekeys (S, T, 8, 128)        emitted run keys (dead = B)
      ep (S, T, 3*Lp, 8, 128)     emitted run sums, bit-packed two 15-bit
                                  limbs per u32 (x, y, z blocks of
                                  Lp = ceil(L/2) rows each)
      tkeys (T, 8, 128)           per-lane tail keys (dead = B)
      tx/ty/tz (T, L, 8, 128)     per-lane tail accumulators
    """
    S, T = keys5.shape[:2]
    L = curve.fp.n_limbs
    Lp = -(-L // 2)
    Lq = 2 * n_words32(curve.fp)
    assert q5.shape[0] == Lq, (q5.shape, Lq)

    # Steps per grid invocation (VMEM-bounded; must divide S).
    U = next(u for u in (8, 4, 2, 1) if S % u == 0)
    SB = S // U

    grid = (T, SB)
    kspec = pl.BlockSpec((U, 1, 8, 128), lambda t, s: (s, t, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((Lq, U, 1, 8, 128), lambda t, s: (0, s, t, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((U, 1, 3 * Lp, 8, 128),
                         lambda t, s: (s, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tk_spec = pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    tc_spec = pl.BlockSpec((1, L, 8, 128), lambda t, s: (t, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((S, T, 8, 128), jnp.uint32),        # ekeys
        jax.ShapeDtypeStruct((S, T, 3 * Lp, 8, 128), jnp.uint32),  # ep
        jax.ShapeDtypeStruct((T, 8, 128), jnp.uint32),           # tkeys
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),        # tx
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),        # ty
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),        # tz
    )
    out_specs = (kspec, pspec,
                 tk_spec, tc_spec, tc_spec, tc_spec)

    kernel = functools.partial(_kernel, curve, dead, SB, U)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[kspec, kspec, qspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((L, 8, 128), jnp.uint32)] * 3
            + [pltpu.VMEM((8, 128), jnp.uint32)]),
        interpret=interpret,
    )(keys5, sgn5, q5)
