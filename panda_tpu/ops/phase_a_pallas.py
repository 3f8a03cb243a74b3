"""Pallas TPU kernel for the MSM phase-A bucket-accumulation scan.

The jnp/lax.scan formulation of phase A (ops/msm.py) is correct but pays
XLA fusion-boundary and kernel-launch overhead on every scan step: the
complete-madd formula expands to hundreds of vector ops which XLA splits
into many small kernels over (W, m)-shaped operands.  This module runs the
ENTIRE scan as one `pallas_call`: the per-lane accumulator lives in VMEM
scratch across the sequential grid steps, every intermediate of the field
arithmetic stays in vector registers / VMEM, and each (8, 128) lane tile
streams its sorted point blocks through a single fused kernel.

Same contract as the lax.scan in ``msm._bucket_tables``:

  inputs  keys   (S, T, 8, 128) uint32   sorted digit per element
          qx/qy  (S, T, L, 8, 128)       gathered (sign-applied) points
  outputs ekeys  (S, T, 8, 128)          emitted run keys (dead = B)
          ex/ey/ez (S, T, L, 8, 128)     emitted run sums
          tkeys  (T, 8, 128)             per-lane tail keys (dead = B)
          tx/ty/tz (T, L, 8, 128)        per-lane tail accumulators

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
_INIT_KEY = np.uint32(0xFFFFFFFF)

# ---------------------------------------------------------------------------
# Kernel + host wrapper
# ---------------------------------------------------------------------------


def _identity_lists(curve: CurveSpec):
    f = curve.fp
    zero = [jnp.zeros((8, 128), jnp.uint32)] * f.n_limbs
    one = [jnp.full((8, 128), np.uint32(v)) for v in f.one_limbs]
    return zero, one


def _kernel(curve: CurveSpec, dead: int, S: int,
            keys_ref, qx_ref, qy_ref,
            ekeys_ref, ex_ref, ey_ref, ez_ref,
            tkeys_ref, tx_ref, ty_ref, tz_ref,
            accx, accy, accz, acck):
    f = curve.fp
    L = f.n_limbs
    s = pl.program_id(1)
    zero, one = _identity_lists(curve)

    @pl.when(s == 0)
    def _init():
        for i in range(L):
            accx[i] = zero[i]
            accy[i] = one[i]
            accz[i] = zero[i]
        acck[...] = jnp.full((8, 128), _INIT_KEY)

    k = keys_ref[0, 0]
    qx = [qx_ref[0, 0, i] for i in range(L)]
    qy = [qy_ref[0, 0, i] for i in range(L)]
    ax = [accx[i] for i in range(L)]
    ay = [accy[i] for i in range(L)]
    az = [accz[i] for i in range(L)]
    akey = acck[...]

    same = k == akey
    emit = jnp.logical_not(same) & (akey != _INIT_KEY)
    ekeys_ref[0, 0] = jnp.where(emit, akey, np.uint32(dead))
    ex = _select(emit, ax, zero)
    ey = _select(emit, ay, one)
    ez = _select(emit, az, zero)
    for i in range(L):
        ex_ref[0, 0, i] = ex[i]
        ey_ref[0, 0, i] = ey[i]
        ez_ref[0, 0, i] = ez[i]

    bx = _select(same, ax, zero)
    by = _select(same, ay, one)
    bz = _select(same, az, zero)
    nx, ny, nz = _madd(curve, bx, by, bz, qx, qy)
    for i in range(L):
        accx[i] = nx[i]
        accy[i] = ny[i]
        accz[i] = nz[i]
    acck[...] = k

    @pl.when(s == S - 1)
    def _tails():
        tkeys_ref[0] = jnp.where(k == np.uint32(dead), np.uint32(dead), k)
        for i in range(L):
            tx_ref[0, i] = nx[i]
            ty_ref[0, i] = ny[i]
            tz_ref[0, i] = nz[i]


def phase_a_scan(curve: CurveSpec, keys_s, qx_s, qy_s, dead: int,
                 interpret: bool = False):
    """Run the phase-A scan kernel.

    keys_s: (S, W, m) uint32; qx_s/qy_s: (S, L, W, m).  W*m must be a
    multiple of 1024 (the (8, 128) lane tile).  Returns
    (ekeys (S, W, m), ex, ey, ez (L, W, m per step -> (S, L, W, m)),
     tkeys (W, m), tx, ty, tz (L, W, m)).
    """
    S, W, m = keys_s.shape
    L = curve.fp.n_limbs
    WM = W * m
    assert WM % 1024 == 0, "lane tiling requires W*m % 1024 == 0"
    T = WM // 1024

    keys_t = keys_s.reshape(S, T, 8, 128)
    qx_t = jnp.transpose(qx_s, (0, 2, 3, 1)).reshape(S, T, 8, 128, L)
    qx_t = jnp.transpose(qx_t, (0, 1, 4, 2, 3))        # (S, T, L, 8, 128)
    qy_t = jnp.transpose(qy_s, (0, 2, 3, 1)).reshape(S, T, 8, 128, L)
    qy_t = jnp.transpose(qy_t, (0, 1, 4, 2, 3))

    grid = (T, S)
    kspec = pl.BlockSpec((1, 1, 8, 128), lambda t, s: (s, t, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, L, 8, 128), lambda t, s: (s, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tk_spec = pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    tc_spec = pl.BlockSpec((1, L, 8, 128), lambda t, s: (t, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((S, T, 8, 128), jnp.uint32),      # ekeys
        jax.ShapeDtypeStruct((S, T, L, 8, 128), jnp.uint32),   # ex
        jax.ShapeDtypeStruct((S, T, L, 8, 128), jnp.uint32),   # ey
        jax.ShapeDtypeStruct((S, T, L, 8, 128), jnp.uint32),   # ez
        jax.ShapeDtypeStruct((T, 8, 128), jnp.uint32),         # tkeys
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),      # tx
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),      # ty
        jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32),      # tz
    )
    out_specs = (kspec, cspec, cspec, cspec,
                 tk_spec, tc_spec, tc_spec, tc_spec)

    kernel = functools.partial(_kernel, curve, dead, S)
    ek, ex, ey, ez, tk, tx, ty, tz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[kspec, cspec, cspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((L, 8, 128), jnp.uint32)] * 3
            + [pltpu.VMEM((8, 128), jnp.uint32)]),
        interpret=interpret,
    )(keys_t, qx_t, qy_t)

    def back_k(a):       # (S|, T, 8, 128) -> (S, W, m) / (W, m)
        return a.reshape(a.shape[:-3] + (WM,)).reshape(
            a.shape[:-3] + (W, m))

    def back_c(a):       # (..., T, L, 8, 128) -> (..., L, W, m)
        moved = jnp.moveaxis(a, -3, -4)                 # (..., L, T, 8, 128)
        return moved.reshape(moved.shape[:-3] + (WM,)).reshape(
            moved.shape[:-3] + (W, m))

    return (back_k(ek), back_c(ex), back_c(ey), back_c(ez),
            back_k(tk), back_c(tx), back_c(ty), back_c(tz))
