"""Generic batched point-operation Pallas kernels.

Drop-in replacements for ``curves/point.py``'s add/madd/dbl on large
batches: one fused kernel per call instead of the hundreds of small XLA
kernels the complete RCB formulas otherwise expand into (measured ~25x on
the phase-A madd scan, see ops/phase_a_pallas.py).  Used by the point
reduction primitives in ops/reduce.py on the TPU path.

Layout: coordinates are uint32[L, N] limb arrays; N is padded to the
(8, 128) lane tile and the batch streams through a 1-D grid.  Padding
lanes carry zeros — every formula maps all-zero inputs to all-zero
outputs with no uint32 overflow, and callers slice the pad off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.config import CurveSpec
from . import kernel_field as kf

_TILE = 1024  # 8 sublanes x 128 lanes


def _to_tiles(a, T):
    # (L, N) -> (T, L, 8, 128)
    L = a.shape[0]
    return jnp.transpose(a.reshape(L, T, 8, 128), (1, 0, 2, 3))


def _from_tiles(a, n):
    # (T, L, 8, 128) -> (L, n)
    L = a.shape[1]
    return jnp.transpose(a, (1, 0, 2, 3)).reshape(L, -1)[:, :n]


def _pad(a, P):
    n = a.shape[-1]
    return a if n == P else jnp.pad(a, ((0, 0), (0, P - n)))


def _run(curve: CurveSpec, body, arrays, n_out: int = 3,
         interpret: bool = False):
    """Stream uint32[L, N] coordinate arrays through an elementwise point
    kernel.  ``body(curve, *limb_lists) -> n_out limb lists``."""
    L = curve.fp.n_limbs
    n = arrays[0].shape[-1]
    T = -(-n // _TILE)
    P = T * _TILE
    tiled = [_to_tiles(_pad(a, P), T) for a in arrays]

    CH = next(u for u in (4, 2, 1) if T % u == 0)
    spec = pl.BlockSpec((CH, L, 8, 128), lambda t: (t, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def kernel(*refs):
        ins = refs[:len(arrays)]
        outs = refs[len(arrays):]
        for t in range(CH):
            vals = [[r[t, i] for i in range(L)] for r in ins]
            res = body(curve, *vals)
            for out_ref, coord in zip(outs, res):
                for i in range(L):
                    out_ref[t, i] = coord[i]

    out = pl.pallas_call(
        kernel,
        grid=(T // CH,),
        in_specs=[spec] * len(arrays),
        out_specs=tuple([spec] * n_out),
        out_shape=tuple([jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32)]
                        * n_out),
        interpret=interpret,
    )(*tiled)
    return tuple(_from_tiles(a, n) for a in out)


def padd(curve: CurveSpec, p, q, interpret: bool = False):
    """Complete projective add on (L, N) coordinate triples."""
    return _run(curve, kf._padd, [*p, *q], interpret=interpret)


def pmadd(curve: CurveSpec, p, q_affine, interpret: bool = False):
    """Complete mixed add: p projective triple, q affine pair."""
    return _run(curve, kf._madd, [*p, *q_affine], interpret=interpret)


def pdbl(curve: CurveSpec, p, interpret: bool = False):
    """Complete doubling on an (L, N) coordinate triple."""
    return _run(curve, kf._pdbl, [*p], interpret=interpret)


# ---------------------------------------------------------------------------
# Weighted bucket-reduction scan kernel
# ---------------------------------------------------------------------------


def _identity_lists(curve: CurveSpec):
    f = curve.fp
    zero = [jnp.zeros((8, 128), jnp.uint32)] * f.n_limbs
    one = [jnp.full((8, 128), np.uint32(v)) for v in f.one_limbs]
    return zero, one


def _wscan_kernel(curve: CurveSpec, SB: int, U: int,
                  bx_ref, by_ref, bz_ref,
                  rx_ref, ry_ref, rz_ref, wx_ref, wy_ref, wz_ref,
                  *scratch):
    """Sequential 'run += B; wsum += run' scan with both accumulators in
    VMEM — the inner loop of the weighted bucket reduction
    (``ops/reduce.py::weighted_window_sum``) as ONE kernel instead of
    2*steps pallas calls with HBM round-trips between them.  U steps run
    per grid invocation to amortize grid overhead."""
    f = curve.fp
    L = f.n_limbs
    sb = pl.program_id(1)
    runx, runy, runz, wsx, wsy, wsz = scratch
    zero, one = _identity_lists(curve)

    @pl.when(sb == 0)
    def _init():
        for i in range(L):
            runx[i] = zero[i]
            runy[i] = one[i]
            runz[i] = zero[i]
            wsx[i] = zero[i]
            wsy[i] = one[i]
            wsz[i] = zero[i]

    rx = [runx[i] for i in range(L)]
    ry = [runy[i] for i in range(L)]
    rz = [runz[i] for i in range(L)]
    wx = [wsx[i] for i in range(L)]
    wy = [wsy[i] for i in range(L)]
    wz = [wsz[i] for i in range(L)]
    for u in range(U):
        bx = [bx_ref[u, 0, i] for i in range(L)]
        by = [by_ref[u, 0, i] for i in range(L)]
        bz = [bz_ref[u, 0, i] for i in range(L)]
        rx, ry, rz = kf._padd(curve, rx, ry, rz, bx, by, bz)
        wx, wy, wz = kf._padd(curve, wx, wy, wz, rx, ry, rz)
    for i in range(L):
        runx[i] = rx[i]
        runy[i] = ry[i]
        runz[i] = rz[i]
        wsx[i] = wx[i]
        wsy[i] = wy[i]
        wsz[i] = wz[i]

    @pl.when(sb == SB - 1)
    def _out():
        for i in range(L):
            rx_ref[0, i] = rx[i]
            ry_ref[0, i] = ry[i]
            rz_ref[0, i] = rz[i]
            wx_ref[0, i] = wx[i]
            wy_ref[0, i] = wy[i]
            wz_ref[0, i] = wz[i]


def weighted_scan(curve: CurveSpec, bx, by, bz, interpret: bool = False):
    """Reverse weighted scan over the LAST axis of (L, N, S) bucket
    coordinate arrays: returns (run, wsum) pairs of (L, N) arrays with
    run = sum_s B_s and wsum = sum_s (s + 1) * B_s (0-based s), matching
    the reverse ``lax.scan`` in ``reduce.weighted_window_sum``.
    N % 1024 == 0."""
    L, N, S = bx.shape
    assert N % 1024 == 0, "weighted_scan requires N % 1024 == 0"
    T = N // 1024

    def to_sT(a):   # (L, N, S) -> (S, T, L, 8, 128), steps reversed
        a = jnp.flip(a, axis=-1)
        a = jnp.transpose(a, (2, 1, 0))            # (S, N, L)
        a = a.reshape(S, T, 8, 128, L)
        return jnp.transpose(a, (0, 1, 4, 2, 3))

    tiles = [to_sT(a) for a in (bx, by, bz)]
    U = next(u for u in (8, 4, 2, 1) if S % u == 0)
    bspec = pl.BlockSpec((U, 1, L, 8, 128), lambda t, s: (s, t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, L, 8, 128), lambda t, s: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = tuple([jax.ShapeDtypeStruct((T, L, 8, 128), jnp.uint32)] * 6)

    kernel = functools.partial(_wscan_kernel, curve, S // U, U)
    outs = pl.pallas_call(
        kernel,
        grid=(T, S // U),
        in_specs=[bspec] * 3,
        out_specs=tuple([ospec] * 6),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((L, 8, 128), jnp.uint32)] * 6,
        interpret=interpret,
    )(*tiles)

    def back(a):    # (T, L, 8, 128) -> (L, N)
        return jnp.transpose(a, (1, 0, 2, 3)).reshape(L, N)

    run = tuple(back(a) for a in outs[:3])
    wsum = tuple(back(a) for a in outs[3:])
    return run, wsum


# ---------------------------------------------------------------------------
# Field-level kernels
# ---------------------------------------------------------------------------


def _cond_sub_p(spec, v):
    """v - p if v >= p else v, on a normalized limb list (borrow chain +
    select in registers) — kernel twin of mont.cond_sub."""
    from ..fields.config import LIMB_BITS, LIMB_MASK
    base = np.uint32(1 << LIMB_BITS)
    mask = np.uint32(LIMB_MASK)
    p = spec.p_limbs
    out, borrow = [], None
    for i in range(spec.n_limbs):
        t = v[i] + base - np.uint32(p[i])
        if borrow is not None:
            t = t - borrow
        out.append(t & mask)
        borrow = np.uint32(1) - (t >> LIMB_BITS)
    take = borrow == 0
    return [jnp.where(take, d, o) for d, o in zip(out, v)]


def _fmul_body2(spec, vb_a, vb_b, ch, canonical_out=False):
    from ..fields.config import LIMB_BITS
    from .kernel_field import LF, _mul

    def kernel(a_ref, b_ref, o_ref):
        L = spec.n_limbs
        for t in range(ch):
            a = LF([a_ref[i, t] for i in range(L)], 1 << LIMB_BITS, vb_a)
            b = LF([b_ref[i, t] for i in range(L)], 1 << LIMB_BITS, vb_b)
            out = _mul(spec, a, b)
            v = out.v
            if canonical_out:
                v = _cond_sub_p(spec, v)     # < 2p -> [0, p)
            for i in range(L):
                o_ref[i, t] = v[i]
    return kernel


def fmul(spec, a, b, vb_a: int | None = None, vb_b: int | None = None,
         interpret: bool = False, canonical_out: bool = False):
    """Elementwise Montgomery multiply on uint32[L, N] arrays (normalized
    limbs, values < vb_a/vb_b — default 2p); one fused kernel.
    Bit-identical to fields/mont.py::mul on the same input class (the
    value bounds only gate the trace-time overflow asserts).

    Layout: the (L, N) array is VIEWED as (L, T, 8, 128) — a pure
    reshape, limbs stay the leading axis.  The previous (T, L, 8, 128)
    form paid an XLA relayout on both sides of the kernel (~4 ms of the
    42.7 ms 2^24 call, tools/profile_r05_fused.py).

    ``canonical_out``: additionally conditional-subtract p in-kernel, so
    the result is fully reduced to [0, p) — fuses ``mont.canonical``'s
    final ladder step into the same pass (bit-identical: the external
    path does exactly one cond_sub(p) on the < 2p kernel output)."""
    vb_a = 2 * spec.modulus if vb_a is None else vb_a
    vb_b = 2 * spec.modulus if vb_b is None else vb_b
    L = spec.n_limbs
    n = a.shape[-1]
    T = -(-n // _TILE)
    P = T * _TILE
    a4 = _pad(a, P).reshape(L, T, 8, 128)
    b4 = _pad(b, P).reshape(L, T, 8, 128)
    CH = next(u for u in (8, 4, 2, 1) if T % u == 0)
    spec_b = pl.BlockSpec((L, CH, 8, 128), lambda t: (0, t, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fmul_body2(spec, vb_a, vb_b, CH, canonical_out),
        grid=(T // CH,),
        in_specs=[spec_b, spec_b],
        out_specs=spec_b,
        out_shape=jax.ShapeDtypeStruct((L, T, 8, 128), jnp.uint32),
        interpret=interpret,
    )(a4, b4)
    return out.reshape(L, P)[:, :n]
