"""Fused Pallas histogram for the MSM bucket-run locator.

``msm._cum_counts`` builds per-window digit histograms as one-hot int8
matmuls.  In XLA the two one-hot factor tensors are materialized in HBM
((W, HI, N) + (W, N, LO) int8 — ~6 GB at W=16, N=2^20), which makes a
~3 ms-of-MACs histogram cost ~54 ms.  This kernel builds the one-hots in
registers, accumulates the (HI, LO) count matrix in VMEM scratch across
the N tiles, and only ever touches HBM for the keys (W*N*4 bytes) and the
tiny output — the same digit-minus-one trick maps digit 0 and dead
sentinels out of range, so the zero bucket enters via the caller's
closed-form count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max rows of 128 lanes consumed per grid step (one window at a time).
_ROWS = 64


def _pick_rows(N: int) -> int:
    nr = N // 128
    for r in (64, 32, 16, 8, 4, 2, 1):
        if r <= _ROWS and nr % r == 0:
            return r
    return 1


def _kernel(HI: int, LO: int, lo_bits: int, NT: int, R: int,
            keys_ref, out_ref, acc):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros((HI, LO), jnp.int32)

    d1 = keys_ref[0, 0] - np.uint32(1)           # (R, 128); 0 wraps out
    dh = (d1 >> np.uint32(lo_bits)).astype(jnp.int32)
    dl = (d1 & np.uint32(LO - 1)).astype(jnp.int32)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (HI, 128), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, LO), 1)
    total = jnp.zeros((HI, LO), jnp.int32)
    for r in range(R):
        a = (dh[r][None, :] == hi_iota).astype(jnp.int8)     # (HI, 128)
        b = (dl[r][:, None] == lo_iota).astype(jnp.int8)     # (128, LO)
        total = total + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    acc[...] = acc[...] + total

    @pl.when(t == NT - 1)
    def _out():
        out_ref[0] = acc[...]


def hist_counts(digits: jnp.ndarray, D: int,
                interpret: bool = False) -> jnp.ndarray:
    """Per-window counts of digit == b for b = 1..D.

    ``digits``: (W, N) uint32 in [0, D] plus dead sentinels > D (ignored,
    as is digit 0).  N must be a multiple of 128*_ROWS.  Returns (W, D)
    int32.
    """
    W, N = digits.shape
    bins = 1 << max((D - 1).bit_length(), 1)
    lo_bits = bins.bit_length() // 2
    LO = 1 << lo_bits
    HI = bins // LO
    assert N % 128 == 0, N
    R = _pick_rows(N)
    NT = N // (128 * R)
    k4 = digits.reshape(W, NT, R, 128)

    kspec = pl.BlockSpec((1, 1, R, 128), lambda w, t: (w, t, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, HI, LO), lambda w, t: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, HI, LO, lo_bits, NT, R),
        grid=(W, NT),
        in_specs=[kspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((W, HI, LO), jnp.int32),
        scratch_shapes=[pltpu.VMEM((HI, LO), jnp.int32)],
        interpret=interpret,
    )(k4)
    return out.reshape(W, bins)[:, :D]
