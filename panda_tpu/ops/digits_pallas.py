"""Fused scalar-preparation Pallas kernel for MSM.

The MSM front end converts scalars out of Montgomery form and recodes them
into signed windowed digits (reference contract: scalars leave Montgomery
form first, ``/root/reference/src/cuda/core/unit/msm/msm_cuda.cuh:148-157``;
digit extraction with cross-limb splice, ``msm_cuda.cuh:159-205``).  Done
with jnp ops this is hundreds of tiny elementwise XLA kernels (measured
~29 ms at 2^16 on v5e — pure dispatch overhead); here the whole chain
(Montgomery reduction, canonicalization, W-window signed recode) runs as
ONE pallas_call per (8, 128) tile of scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec
from .kernel_field import LF, _mul

_MASK = np.uint32(LIMB_MASK)
_BASE = np.uint32(1 << LIMB_BITS)


def _cond_sub_list(c_limbs, v):
    """v - c if v >= c else v, on a normalized limb list (borrow chain)."""
    L = len(v)
    out, borrow = [], None
    for i in range(L):
        t = v[i] + _BASE - np.uint32(c_limbs[i])
        if borrow is not None:
            t = t - borrow
        out.append(t & _MASK)
        borrow = np.uint32(1) - (t >> LIMB_BITS)
    keep = borrow != 0          # borrow set -> v < c -> keep v
    return [jnp.where(keep, a, b) for a, b in zip(v, out)]


def _kernel(spec: FieldSpec, c: int, W: int, from_mont: bool, vb_in: int,
            CH: int, s_ref, mag_ref, neg_ref):
    L = spec.n_limbs
    mask = np.uint32((1 << c) - 1)
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    # CH independent scalar tiles per grid step (amortizes the per-step
    # grid overhead, which otherwise dominates this small kernel).
    for t in range(CH):
        s = [s_ref[t, i] for i in range(L)]
        if from_mont:
            one = LF([jnp.full((8, 128), np.uint32(x))
                      for x in spec.unity_limbs], 1 << LIMB_BITS, 2)
            red = _mul(spec, LF(s, 1 << LIMB_BITS, vb_in), one)
            s = _cond_sub_list(spec.p_limbs, red.v)      # canonical [0, p)
        carry = None
        for w in range(W):
            lo = w * c
            i, sh = divmod(lo, LIMB_BITS)
            if i >= L:
                d = jnp.zeros((8, 128), jnp.uint32)
            else:
                d = s[i] >> np.uint32(sh)
                if sh + c > LIMB_BITS and i + 1 < L:
                    d = d | (s[i + 1] << np.uint32(LIMB_BITS - sh))
                d = d & mask
            e = d if carry is None else d + carry
            neg = e > half
            mag_ref[t, w] = jnp.where(neg, full - e, e)
            neg_ref[t, w] = neg.astype(jnp.uint32)
            carry = neg.astype(jnp.uint32)


def signed_digits(spec: FieldSpec, scalars: jnp.ndarray, c: int, W: int,
                  from_mont: bool = True, vb_in: int | None = None,
                  interpret: bool = False):
    """Fused (from-Montgomery ->) canonical -> signed-digit recode.

    scalars: uint32[L, n] normalized limbs, n % 1024 == 0.  Returns
    (mags uint32[W, n] in [0, 2^(c-1)], negs bool[W, n]) — bit-identical
    to ``mont.from_mont`` + ``msm.extract_signed_digits``.
    """
    L = spec.n_limbs
    n = scalars.shape[-1]
    assert n % 1024 == 0, "signed_digits requires n % 1024 == 0"
    if vb_in is None:
        vb_in = 2 * spec.modulus
    if vb_in * 1 > spec.r * spec.modulus:
        raise OverflowError("scalar value bound too large for reduction")
    T = n // 1024
    CH = next(u for u in (16, 8, 4, 2, 1) if T % u == 0)
    tiles = jnp.transpose(scalars.reshape(L, T, 8, 128), (1, 0, 2, 3))
    in_spec = pl.BlockSpec((CH, L, 8, 128), lambda t: (t, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((CH, W, 8, 128), lambda t: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, spec, c, W, from_mont, vb_in, CH)
    mag, neg = pl.pallas_call(
        kernel,
        grid=(T // CH,),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((T, W, 8, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((T, W, 8, 128), jnp.uint32)),
        interpret=interpret,
    )(tiles)

    def back(a):
        return jnp.transpose(a, (1, 0, 2, 3)).reshape(W, n)

    return back(mag), back(neg).astype(jnp.bool_)
