"""Fused Pallas dft_apply: digit split + MXU matmul + regroup + fold in
ONE kernel.

The XLA form (``ntt_mxu.dft_apply2``) materializes the int8 digit stack
(3LK x nb) and the int32 accumulator (3LK x nb) in HBM around the
dot_general — ~4.5 GB of traffic per pass at 2^24 for ~2 ms of MACs, the
"large-footprint HBM regime" that costs the NTT a third of its 2^20 rate
at 2^22+ (round-4 verdict weak #2).  Here each nb-block stays in VMEM
from u32 limbs to u32 limbs: traffic = read x + write y only.

Requires the DFT matrix VMEM-resident, so the four-step plan uses
maxk <= 6 (K = 32: (3*18*32)^2 int8 = 2.9 MB; K = 64: 11.9 MB).  The
matmul runs int8 x int8 -> int32 on the MXU; arithmetic is identical to
``dft_apply2`` (same digit planes, same accumulators), so outputs are
bit-identical and every existing oracle gate covers it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec
from .ntt_mxu import DIG_BITS, DIG_MAX, DIG_PER_LIMB, _fold_plan

_BLK = 512          # nb columns per grid step


def _kernel(spec: FieldSpec, log_k: int, K: int, x_ref, mat_ref, y_ref):
    fp = _fold_plan(spec, log_k)
    L = spec.n_limbs
    xf = x_ref[:].reshape(L * K, _BLK)
    d = jnp.concatenate(
        [xf & DIG_MAX, (xf >> DIG_BITS) & DIG_MAX,
         (xf >> (2 * DIG_BITS)) & DIG_MAX], axis=0).astype(jnp.int8)
    acc = jax.lax.dot_general(mat_ref[:], d, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    # leading-dim-only reshape (last dim stays _BLK: Mosaic-friendly).
    # All value indexing below uses STATIC slices (index_in_dim): plain
    # jnp integer indexing lowers through dynamic_slice, which Mosaic
    # does not implement.
    pick = lambda v, i: jax.lax.index_in_dim(v, i, 0, keepdims=False)
    a = acc.reshape(DIG_PER_LIMB, L, K, _BLK).astype(jnp.uint32)
    a0, a1, a2 = pick(a, 0), pick(a, 1), pick(a, 2)
    spill = jnp.concatenate(
        [jnp.zeros_like(a2[:1]), a2[:-1] >> DIG_BITS], axis=0)
    limbs = (a0 + (a1 << DIG_BITS) + ((a2 & DIG_MAX) << (2 * DIG_BITS))
             + spill)                                    # (L, K, BLK)
    spill_top = pick(a2, L - 1) >> DIG_BITS              # (K, BLK)
    out = []
    carry = jnp.zeros_like(spill_top)
    for i in range(fp.n_limbs_ext):
        if i < L:
            s = pick(limbs, i) + carry
        elif i == L:
            s = spill_top + carry
        else:
            s = carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    lo = out[:L - 1]
    hi = out[L - 1:]
    res = lo + [jnp.zeros_like(lo[0])]
    t = 0
    for h in hi:
        for sub in range(DIG_PER_LIMB):
            dig = (h >> (DIG_BITS * sub)) & DIG_MAX
            f = fp.fold[t]
            res = [r + dig * np.uint32(f[j]) for j, r in enumerate(res)]
            t += 1
    carry = None
    for i in range(L):
        s = res[i] if carry is None else res[i] + carry
        y_ref[i] = s & LIMB_MASK
        carry = s >> LIMB_BITS


def dft_apply_fused(spec: FieldSpec, x: jnp.ndarray, log_k: int,
                    mat: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched length-K NTT along axis 1 of (L, K, nb), one fused kernel.

    ``mat``: the GROUPED (3LK, 3LK) int8 matrix (dft_matrix_grouped).
    Bit-identical to ``ntt_mxu.dft_apply2``.  nb must be a multiple of
    _BLK (the four-step shapes are large powers of two).
    """
    L, K, nb = x.shape
    assert K == 1 << log_k
    assert nb % _BLK == 0, (nb, _BLK)
    grid = (nb // _BLK,)
    xspec = pl.BlockSpec((L, K, _BLK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec(mat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, spec, log_k, K),
        grid=grid,
        in_specs=[xspec, mspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((L, K, nb), jnp.uint32),
        interpret=interpret,
    )(x, mat)
