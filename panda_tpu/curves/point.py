"""Branchless elliptic-curve point arithmetic (short Weierstrass, a = 0).

TPU-native redesign of the reference's Jacobian point template
(``/root/reference/src/cuda/core/curve/projective.cuh:10-315``).  The
reference's dbl-2009-l / add-2007-bl / madd-2007-bl formulas branch on zero
inputs and on the P == Q doubling case — fatal for SIMD lanes.  We instead
use the *complete* homogeneous-projective formulas of Renes–Costello–Batina
(EUROCRYPT 2016, Algorithms 7-9 for a = 0), which handle identity, equal and
opposite inputs uniformly with zero branches: ideal for the TPU VPU.

Representation: ``ProjPoint(x, y, z)`` with homogeneous coordinates
(X : Y : Z), each a uint32[L, *batch] Montgomery-form limb array with
normalized (15-bit) limbs and value < 8p (the formulas below re-establish
this invariant: outputs are < 5p before normalization).  The identity is
(0 : 1 : 0).  Conversions to the reference's output conventions:

* Jacobian (X_j / Z_j^2, Y_j / Z_j^3): (X*Z, Y*Z^2, Z).
* Reference "projective" output (``projective.cuh:66-77`` computes
  (X_j*Z_j, Y_j, Z_j^3) from Jacobian): our homogeneous triple is already a
  valid representative of the same class (it differs by the factor Z^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.config import FieldSpec
from ..fields.mont import FE
from .config import CurveSpec

# Static value-bound class of stored point coordinates (x 8p conservative).
_COORD_MULT = 8

# Batch size at which the fused Pallas kernels win over the XLA formula
# expansion (kernel call overhead + layout transposes amortize).
_KERNEL_MIN_BATCH = 2048


def _batch_size(shape) -> int:
    n = 1
    for d in shape[1:]:
        n *= d
    return n


def _use_kernels(shape) -> bool:
    from ..ops import backend
    if _batch_size(shape) < _KERNEL_MIN_BATCH:
        return False
    return backend.kernels_enabled()


def _via_kernel(kernel_fn, curve, arrays):
    """Flatten batch dims, run the point kernel, restore shapes."""
    from ..ops import backend
    shape = arrays[0].shape
    L = shape[0]
    flat = [jnp.reshape(a, (L, -1)) for a in arrays]
    out = kernel_fn(curve, flat, backend.interpret())
    return tuple(jnp.reshape(a, shape) for a in out)


class ProjPoint(NamedTuple):
    """Homogeneous projective point; limb arrays (L, *batch)."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class AffinePoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray


def _wrap(curve: CurveSpec, arr) -> FE:
    return mont.fe(curve.fp, arr, _COORD_MULT)


def _out(curve: CurveSpec, v: FE) -> jnp.ndarray:
    v = mont.norm(curve.fp, v)
    assert v.vb <= _COORD_MULT * curve.fp.modulus, "coordinate class overflow"
    return v.v


def identity(curve: CurveSpec, batch_shape=()) -> ProjPoint:
    """(0 : 1 : 0) in Montgomery form."""
    fp = curve.fp
    L = fp.n_limbs
    zero = jnp.zeros((L,) + tuple(batch_shape), dtype=jnp.uint32)
    one = jnp.broadcast_to(
        jnp.asarray(fp.one_limbs.reshape((L,) + (1,) * len(batch_shape))),
        zero.shape).astype(jnp.uint32)
    return ProjPoint(zero, one, zero)


def from_affine(curve: CurveSpec, pt: AffinePoint) -> ProjPoint:
    """(x, y) -> (x : y : 1).  Affine points cannot encode the identity."""
    fp = curve.fp
    batch = pt.x.shape[1:]
    one = jnp.broadcast_to(
        jnp.asarray(fp.one_limbs.reshape((fp.n_limbs,) + (1,) * len(batch))),
        pt.x.shape).astype(jnp.uint32)
    return ProjPoint(pt.x, pt.y, one)


def _mul_b3(curve: CurveSpec, t: FE) -> FE:
    """Multiply by 3b.  For small 3b (9 / 3) an add chain beats a full mul."""
    if curve.b3 <= 32:
        return mont.mul_small(curve.fp, t, curve.b3)
    return mont.mul_const(curve.fp, t, curve.b3_mont_limbs,
                          2 * curve.fp.modulus)


def add(curve: CurveSpec, p: ProjPoint, q: ProjPoint) -> ProjPoint:
    """Complete projective addition (RCB Algorithm 7, a = 0): 12M + 2*b3.

    Valid for ALL inputs including identity, P == Q and P == -Q.

    Large batches on TPU run as one fused Pallas kernel (bit-identical op
    sequence; see ops/kernel_field.py).
    """
    if _use_kernels(p.x.shape):
        from ..ops import point_pallas
        return ProjPoint(*_via_kernel(
            lambda c, flat, ip: point_pallas.padd(
                c, flat[:3], flat[3:], interpret=ip),
            curve, [*p, *q]))
    f = curve.fp
    M = lambda a, b: mont.mul(f, a, b)
    A = lambda a, b: mont.add(f, a, b)
    S = lambda a, b: mont.sub(f, a, b)

    x1, y1, z1 = (_wrap(curve, a) for a in p)
    x2, y2, z2 = (_wrap(curve, a) for a in q)
    t0 = M(x1, x2)
    t1 = M(y1, y2)
    t2 = M(z1, z2)
    t3 = S(M(A(x1, y1), A(x2, y2)), A(t0, t1))     # X1Y2 + X2Y1
    t4 = S(M(A(y1, z1), A(y2, z2)), A(t1, t2))     # Y1Z2 + Y2Z1
    t5 = S(M(A(x1, z1), A(x2, z2)), A(t0, t2))     # X1Z2 + X2Z1
    t0 = A(A(t0, t0), t0)                          # 3 X1X2
    t2 = _mul_b3(curve, t2)                        # b3 Z1Z2
    z3 = A(t1, t2)                                 # Y1Y2 + b3 Z1Z2
    t1 = S(t1, t2)                                 # Y1Y2 - b3 Z1Z2
    t5 = _mul_b3(curve, t5)                        # b3 (X1Z2 + X2Z1)
    x3 = S(M(t3, t1), M(t4, t5))
    y3 = A(M(t1, z3), M(t5, t0))
    z3 = A(M(z3, t4), M(t0, t3))
    return ProjPoint(_out(curve, x3), _out(curve, y3), _out(curve, z3))


def madd(curve: CurveSpec, p: ProjPoint, q: AffinePoint) -> ProjPoint:
    """Complete mixed addition (RCB Algorithm 8, a = 0): 11M + 2*b3.

    Complete in P (identity included); Q must be a genuine affine point.
    Replaces the reference's branchy madd-2007-bl (``projective.cuh:259``).
    """
    if _use_kernels(p.x.shape):
        from ..ops import point_pallas
        return ProjPoint(*_via_kernel(
            lambda c, flat, ip: point_pallas.pmadd(
                c, flat[:3], flat[3:], interpret=ip),
            curve, [*p, *q]))
    f = curve.fp
    M = lambda a, b: mont.mul(f, a, b)
    A = lambda a, b: mont.add(f, a, b)
    S = lambda a, b: mont.sub(f, a, b)

    x1, y1, z1 = (_wrap(curve, a) for a in p)
    x2, y2 = (_wrap(curve, a) for a in q)
    t0 = M(x1, x2)
    t1 = M(y1, y2)
    t3 = S(M(A(x1, y1), A(x2, y2)), A(t0, t1))     # X1Y2 + X2Y1
    t4 = A(M(y2, z1), y1)                          # Y1 + Y2Z1
    t5 = A(M(x2, z1), x1)                          # X1 + X2Z1
    t0 = A(A(t0, t0), t0)                          # 3 X1X2
    t2 = _mul_b3(curve, z1)                        # b3 Z1
    z3 = A(t1, t2)
    t1 = S(t1, t2)
    t5 = _mul_b3(curve, t5)
    x3 = S(M(t3, t1), M(t4, t5))
    y3 = A(M(t1, z3), M(t5, t0))
    z3 = A(M(z3, t4), M(t0, t3))
    return ProjPoint(_out(curve, x3), _out(curve, y3), _out(curve, z3))


def dbl(curve: CurveSpec, p: ProjPoint) -> ProjPoint:
    """Complete doubling (RCB Algorithm 9, a = 0): 6M + 2S + 1*b3."""
    if _use_kernels(p.x.shape):
        from ..ops import point_pallas
        return ProjPoint(*_via_kernel(
            lambda c, flat, ip: point_pallas.pdbl(c, flat, interpret=ip),
            curve, [*p]))
    f = curve.fp
    M = lambda a, b: mont.mul(f, a, b)
    A = lambda a, b: mont.add(f, a, b)
    S = lambda a, b: mont.sub(f, a, b)

    x, y, z = (_wrap(curve, a) for a in p)
    t0 = M(y, y)
    z3 = A(A(t0, t0), A(t0, t0))
    z3 = A(z3, z3)                                 # 8 Y^2
    t1 = M(y, z)
    t2 = _mul_b3(curve, M(z, z))                   # b3 Z^2
    x3 = M(t2, z3)
    y3 = A(t0, t2)
    z3 = M(t1, z3)
    t1 = A(t2, t2)
    t2 = A(t1, t2)                                 # 3 b3 Z^2
    t0 = S(t0, t2)
    y3 = A(x3, M(t0, y3))
    t1 = M(x, y)
    x3 = M(t0, t1)
    x3 = A(x3, x3)
    return ProjPoint(_out(curve, x3), _out(curve, y3), _out(curve, z3))


def select(mask: jnp.ndarray, p: ProjPoint, q: ProjPoint) -> ProjPoint:
    """Per-lane select: mask broadcast over limbs."""
    return ProjPoint(mont.select(mask, p.x, q.x),
                     mont.select(mask, p.y, q.y),
                     mont.select(mask, p.z, q.z))


def neg(curve: CurveSpec, p: ProjPoint) -> ProjPoint:
    f = curve.fp
    y_can = mont.canonical(f, _wrap(curve, p.y))
    y = mont.norm(f, mont.neg(f, FE(y_can, 1 << 15, f.modulus)))
    return ProjPoint(p.x, y.v, p.z)


def is_identity(curve: CurveSpec, p: ProjPoint) -> jnp.ndarray:
    return mont.is_zero(curve.fp, mont.fe(curve.fp, p.z, _COORD_MULT))


def to_jacobian(curve: CurveSpec, p: ProjPoint) -> tuple:
    """Homogeneous (X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z).

    Matches the reference's primary output convention: 96-byte Jacobian
    results consumed by ``tests/test.rs:87-101``.
    """
    f = curve.fp
    x, y, z = (_wrap(curve, a) for a in p)
    xz = mont.mul(f, x, z)
    z2 = mont.mul(f, z, z)
    yz2 = mont.mul(f, y, z2)
    return xz.v, yz2.v, p.z


def to_affine(curve: CurveSpec, p: ProjPoint) -> AffinePoint:
    """Normalize; identity maps to (0, 0) by the reference's x==0 convention
    (``affine.cuh:72-75``)."""
    f = curve.fp
    inf = is_identity(curve, p)
    z_can = mont.canonical(f, mont.fe(f, p.z, _COORD_MULT))
    safe_z = mont.select(inf, _one_like(f, p.z), z_can)
    zinv = mont.mont_inv(f, safe_z)
    x = mont.mont_mul(f, p.x, zinv, mult=_COORD_MULT)
    y = mont.mont_mul(f, p.y, zinv, mult=_COORD_MULT)
    zero = jnp.zeros_like(x)
    return AffinePoint(mont.select(inf, zero, x), mont.select(inf, zero, y))


def _one_like(f: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.asarray(f.one_limbs.reshape((f.n_limbs,) + (1,) * (a.ndim - 1)))
    return jnp.broadcast_to(one, a.shape).astype(jnp.uint32)


def fold_sum(curve: CurveSpec, pts: ProjPoint) -> ProjPoint:
    """Tree-reduce a batch of points along the LAST axis to a single point.

    log2(n) levels of pairwise complete additions; pads odd levels with the
    identity.  This is the TPU analog of the reference's warp-shuffle/shared
    memory block reduction (``msm_cuda.cuh:284-301,451-497``).
    """
    n = pts.x.shape[-1]
    while n > 1:
        if n % 2:
            pad = identity(curve, pts.x.shape[1:-1] + (1,))
            pts = ProjPoint(*(jnp.concatenate([a, b], axis=-1)
                              for a, b in zip(pts, pad)))
            n += 1
        lo = ProjPoint(*(a[..., 0:n:2] for a in pts))
        hi = ProjPoint(*(a[..., 1:n:2] for a in pts))
        pts = add(curve, lo, hi)
        n = (n + 1) // 2
    return ProjPoint(*(a[..., 0] for a in pts))


def scalar_mul_int(curve: CurveSpec, p: ProjPoint, k: int) -> ProjPoint:
    """Double-and-add with a static Python integer scalar.

    The scalar is burned into the graph (~1.5 point ops per bit, fully
    unrolled) — only for SMALL static scalars; for full-width or traced
    scalars use :func:`scalar_mul`, whose graph size is one loop body.
    """
    if k == 0:
        return identity(curve, p.x.shape[1:])
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = dbl(curve, acc)
        if bit == "1":
            acc = p if acc is None else add(curve, acc, p)
    return acc


def scalar_mul(curve: CurveSpec, p: ProjPoint, k_limbs: jnp.ndarray,
               bits: int | None = None) -> ProjPoint:
    """Branchless double-and-add with a TRACED scalar.

    k_limbs: uint32[Lr] canonical (non-Montgomery) 15-bit limbs of the
    scalar (same layout as ``fields.codec``).  LSB-first ladder under
    ``lax.scan`` — one dbl + one complete add + select per bit, so the
    compiled graph is a single loop body regardless of scalar width
    (unlike :func:`scalar_mul_int`).  The reference has no scalar-mul
    entry point (its only per-point multiply is the bucket-index
    double-and-add inside MSM, ``msm_cuda.cuh:373-449``); this is the
    library-level equivalent.
    """
    from ..fields.config import LIMB_BITS
    if bits is None:
        bits = curve.fr.bits
    nb = k_limbs.shape[0] * LIMB_BITS
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
    kb = ((k_limbs[:, None] >> shifts[None, :]) & 1).reshape(nb)[:bits]

    def body(carry, bit):
        acc, base = carry
        added = add(curve, acc, base)
        acc = select(bit.astype(jnp.bool_), added, acc)
        base = dbl(curve, base)
        return (acc, base), None

    init = (identity(curve, p.x.shape[1:]), p)
    (acc, _), _ = jax.lax.scan(body, init, kb)
    return acc
