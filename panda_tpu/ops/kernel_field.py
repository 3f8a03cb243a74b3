"""Limb-list field/point arithmetic for Pallas TPU kernels.

Inside a Pallas kernel every value is a register/VMEM tile, so the natural
representation of a field element is a python LIST of (8, 128) uint32
tiles, one per 15-bit limb, with straight-line column-sum code — Mosaic
compiles the whole DAG into one fused kernel with no XLA op-count penalty
(the reason fields/mont.py needed the tensorized rewrite does not apply
here).  The bounds discipline (static lb/vb tracked at trace time) is
identical to fields/mont.py; the point formulas are the same complete
Renes-Costello-Batina algorithms as curves/point.py (reference contract:
``/root/reference/src/cuda/core/field/field.cuh:139-247`` and
``projective.cuh:163-314``, branch-free).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..curves.config import CurveSpec
from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec

_MASK = np.uint32(LIMB_MASK)

# ---------------------------------------------------------------------------
# Limb-list field arithmetic with the same static bounds discipline as
# fields/mont.py.  A value is `LF(limbs, lb, vb)`: `limbs` a python list of
# (8, 128) uint32 tiles, `lb`/`vb` exclusive limb/value bounds tracked at
# trace time (identical semantics to mont.FE — violations fail the trace).
# ---------------------------------------------------------------------------


class LF:
    __slots__ = ("v", "lb", "vb")

    def __init__(self, v, lb: int, vb: int):
        self.v = v
        self.lb = lb
        self.vb = vb


def _norm(spec: FieldSpec, a: LF) -> LF:
    if a.lb <= (1 << LIMB_BITS):
        return a
    if a.vb > spec.r:
        raise OverflowError(f"{spec.name}: norm with vb >= R")
    out, carry = [], None
    for v in a.v:
        s = v if carry is None else v + carry
        out.append(s & _MASK)
        carry = s >> LIMB_BITS
    return LF(out, 1 << LIMB_BITS, a.vb)


def _need16(spec: FieldSpec, a: LF) -> LF:
    return a if a.lb <= (1 << 16) else _norm(spec, a)


def _need15(spec: FieldSpec, a: LF) -> LF:
    """Normalize to sub-2^15 limbs when possible: products of two such
    limbs are < 2^30, so the lazy column accumulator can take ~4 of them
    between carry splits (the whole point of :class:`_Cols`).  Falls back
    to sub-2^16 limbs when the value bound forbids normalization."""
    if a.lb <= (1 << LIMB_BITS):
        return a
    if a.vb < spec.r:
        return _norm(spec, a)
    return _need16(spec, a)


class _Cols:
    """Lazy wide-column accumulator with static per-column max tracking.

    Columns hold u32 tiles; full (unsplit) 30-bit limb products are added
    directly and a column is carry-split (low 15 bits kept, the rest
    folded into the next column) only when the next addition could
    overflow u32.  For sub-2^15 operands this means one split per ~4
    products instead of the classic lo/hi split per product — the
    dominant op-count term of the Montgomery multiply drops from ~5 L^2
    to ~3 L^2 vector ops.  Exactness is guaranteed statically: ``mx[k]``
    is an inclusive bound on column k's value and every add asserts
    headroom.
    """

    __slots__ = ("t", "mx")
    _U32MAX = (1 << 32) - 1

    def __init__(self, ncols: int):
        self.t = [None] * ncols
        self.mx = [0] * ncols

    def split(self, k: int) -> None:
        """Carry-split column k to < 2^15, folding the high part upward."""
        if self.t[k] is None or self.mx[k] < (1 << LIMB_BITS):
            return
        self.add(k + 1, self.t[k] >> LIMB_BITS, self.mx[k] >> LIMB_BITS)
        self.t[k] = self.t[k] & _MASK
        self.mx[k] = (1 << LIMB_BITS) - 1

    def add(self, k: int, x, xmx: int) -> None:
        if self.t[k] is None:
            self.t[k] = x
            self.mx[k] = xmx
            return
        if self.mx[k] + xmx > self._U32MAX:
            self.split(k)
            assert self.mx[k] + xmx <= self._U32MAX, "column overflow"
        self.t[k] = self.t[k] + x
        self.mx[k] = self.mx[k] + xmx

    def get(self, k: int, like):
        return jnp.zeros_like(like) if self.t[k] is None else self.t[k]

    def bound(self, k: int) -> int:
        return self.mx[k]


def _prod_into(cols: _Cols, a: LF, b: LF, off: int = 0,
               tri: int | None = None) -> None:
    """Accumulate the schoolbook product a*b into ``cols`` (shifted by
    ``off`` columns; ``tri`` limits to output columns < tri, for the
    triangular low-half products used by Montgomery reduction)."""
    La, Lb = len(a.v), len(b.v)
    amx, bmx = a.lb - 1, b.lb - 1
    pmx = amx * bmx
    for k in range(La + Lb - 1):
        if tri is not None and k >= tri:
            break
        for i in range(max(0, k - Lb + 1), min(La, k + 1)):
            cols.add(off + k, a.v[i] * b.v[k - i], pmx)


def _add(spec: FieldSpec, a: LF, b: LF) -> LF:
    lb = a.lb + b.lb
    if lb > (1 << 30):
        a, b = _norm(spec, a), _norm(spec, b)
        lb = a.lb + b.lb
    vb = a.vb + b.vb
    if vb > spec.r // 4:
        raise OverflowError(f"{spec.name}: add value bound overflow")
    return LF([x + y for x, y in zip(a.v, b.v)], lb, vb)


@functools.lru_cache(maxsize=None)
def _sub_const(spec: FieldSpec, lb: int, vb: int):
    """Multiple of p dominating any element of class (lb, < vb); same
    construction as mont._sub_const."""
    m = np.zeros(spec.n_limbs, dtype=np.uint64)
    for i in range(spec.n_limbs):
        m[i] = min(lb - 1, vb >> (LIMB_BITS * i))
    m_val = sum(int(x) << (LIMB_BITS * i) for i, x in enumerate(m))
    k = -(-m_val // spec.modulus)
    c_val = k * spec.modulus
    delta = c_val - m_val
    c = m.copy()
    for i in range(spec.n_limbs):
        c[i] += (delta >> (LIMB_BITS * i)) & LIMB_MASK
    assert all(int(c[i]) >= int(m[i]) for i in range(spec.n_limbs))
    assert c.max() < (1 << 31)
    return tuple(int(x) for x in c), c_val


def _sub(spec: FieldSpec, a: LF, b: LF) -> LF:
    if b.lb > (1 << 30):
        b = _norm(spec, b)
    c, c_val = _sub_const(spec, b.lb, b.vb)
    lb = a.lb + max(c) + 1
    vb = a.vb + c_val
    if lb > (1 << 31) or vb > spec.r // 4:
        a = _norm(spec, a)
        lb = a.lb + max(c) + 1
        if vb > spec.r // 4:
            raise OverflowError(f"{spec.name}: sub value bound overflow")
    return LF([x + np.uint32(ci) - y
               for x, y, ci in zip(a.v, b.v, c)], lb, vb)


def _reduce_cols(spec: FieldSpec, cols: _Cols, vb: int, like) -> LF:
    """Interleaved Montgomery reduction of a lazy column accumulator
    (value < vb <= R*p); output limbs < 2^15, value < 2p.

    Column i's low 15 bits are exact mod 2^15 (columns never overflow
    u32 by the _Cols invariant), so m_i = t_i * (-p^-1) mod 2^15 is
    computable directly on the lazy accumulator; m_i * p_j products are
    added UNSPLIT (each < 2^30) with splits only on demand — ~3 L^2
    vector ops for the whole reduction instead of the classic ~5 L^2.
    The final output reads columns L..2L-1: under the vb precondition
    the value above column 2L-1 is provably zero (result < 2p << R), as
    in the reference's deferred final reduction
    (``/root/reference/src/cuda/core/field/field.cuh:139-247``).
    """
    if vb > spec.r * spec.modulus:
        raise OverflowError(f"{spec.name}: montmul bound overflow")
    L = spec.n_limbs
    p_int = [int(x) for x in spec.p_limbs]
    ninv = np.uint32(spec.neg_inv)
    mm_mx = (1 << LIMB_BITS) - 1
    for i in range(L):
        mm = (cols.get(i, like) * ninv) & _MASK
        for j in range(L):
            cols.add(i + j, mm * np.uint32(p_int[j]), mm_mx * p_int[j])
        # Retire column i: fold its (final) high part upward.  Its low 15
        # bits are ≡ 0 mod 2^15 by choice of mm and are dropped.
        cols.add(i + 1, cols.get(i, like) >> LIMB_BITS,
                 cols.bound(i) >> LIMB_BITS)
    out, carry, cmx = [], None, 0
    for j in range(L):
        if cols.bound(L + j) + cmx > _Cols._U32MAX:
            cols.split(L + j)
        v = cols.get(L + j, like)
        if carry is not None:
            v = v + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
        cmx = (cols.bound(L + j) + cmx) >> LIMB_BITS
    return LF(out, 1 << LIMB_BITS, 2 * spec.modulus)


def _mul(spec: FieldSpec, a: LF, b: LF) -> LF:
    """Montgomery product; output limbs < 2^15, value < 2p.  Lazy
    column-sum DAG (see :class:`_Cols`) with interleaved reduction —
    inside the kernel every accumulator is a register/VMEM tile, so op
    count carries no fusion penalty."""
    a = _need15(spec, a)
    b = _need15(spec, b)
    cols = _Cols(2 * spec.n_limbs + 2)
    _prod_into(cols, a, b)
    return _reduce_cols(spec, cols, a.vb * b.vb, a.v[0])


@functools.lru_cache(maxsize=None)
def _wide_sub_const(spec: FieldSpec, vb: int):
    """Multiple of p whose canonical (sub-2^15) column decomposition
    dominates any canonical-column value < vb.  Returns (column constants
    over 2L+1 columns, value).  Used by :func:`_mul2`'s subtraction: the
    subtrahend's columns are first carry-normalized to < 2^15, so
    per-column dominance needs only min(2^15 - 1, vb >> 15k)."""
    L = spec.n_limbs
    ncols = 2 * L + 1
    colmax = (1 << LIMB_BITS) - 1
    m = [min(colmax, vb >> (LIMB_BITS * i)) for i in range(ncols)]
    val = sum(x << (LIMB_BITS * i) for i, x in enumerate(m))
    k = -(-val // spec.modulus)
    cval = k * spec.modulus
    delta = cval - val
    c = list(m)
    for i in range(ncols):
        c[i] += (delta >> (LIMB_BITS * i)) & LIMB_MASK
    assert all(0 <= ci < (1 << 31) for ci in c)
    assert sum(x << (LIMB_BITS * i) for i, x in enumerate(c)) == cval
    return tuple(int(x) for x in c), cval


def _mul2(spec: FieldSpec, a: LF, b: LF, c: LF, d: LF, sub: bool) -> LF:
    """Fused a*b +/- c*d with ONE Montgomery reduction (the reference pays
    two reductions plus a modular add for the same dataflow,
    ``field.cuh:488-563``; fusing saves ~L^2 multiplies per pair).  For
    subtraction, c*d's lazy columns are carry-normalized to < 2^15 and a
    multiple of p dominating them column-wise is added so nothing
    underflows."""
    a, b, c, d = (_need15(spec, x) for x in (a, b, c, d))
    L = spec.n_limbs
    cols = _Cols(2 * L + 2)
    _prod_into(cols, a, b)
    if sub:
        coly = _Cols(2 * L + 2)
        _prod_into(coly, c, d)
        # Normalize the subtrahend's columns to < 2^15 (one carry pass).
        for k in range(2 * L + 1):
            coly.split(k)
        consts, cval = _wide_sub_const(spec, c.vb * d.vb)
        for k in range(2 * L + 1):
            y = coly.t[k]
            if y is None and consts[k] == 0:
                continue
            term = (np.uint32(consts[k]) - y if y is not None
                    else jnp.full_like(a.v[0], np.uint32(consts[k])))
            cols.add(k, term, consts[k])
        vb = a.vb * b.vb + cval
    else:
        _prod_into(cols, c, d)
        vb = a.vb * b.vb + c.vb * d.vb
    return _reduce_cols(spec, cols, vb, a.v[0])


def _mul_small(spec: FieldSpec, a: LF, k: int) -> LF:
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = _add(spec, acc, acc)
        if bit == "1":
            acc = a if acc is None else _add(spec, acc, a)
    return acc


def _select(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


# Stored point coordinates: normalized limbs, value < 8p (the class
# curves/point.py maintains).
_COORD_MULT = 8


def _madd(curve: CurveSpec, px, py, pz, qx, qy):
    """Complete mixed addition (RCB Algorithm 8, a = 0) on limb lists.

    Same formula as ``curves/point.py::madd`` (which mirrors the contract
    of the reference's madd-2007-bl, ``projective.cuh:259``, minus the
    branches), with the three trailing M+/-M pairs fused into single-
    reduction :func:`_mul2` calls — outputs are equal mod p but not
    bit-identical to the XLA path (both canonicalize at the boundary).
    p*: limb lists of the 8p coordinate class; q*: 2p affine class.
    Returns normalized limb lists, value < 8p.
    """
    f = curve.fp
    wrap8 = lambda v: LF(v, 1 << LIMB_BITS, _COORD_MULT * f.modulus)
    x1, y1, z1 = wrap8(px), wrap8(py), wrap8(pz)
    x2, y2 = wrap8(qx), wrap8(qy)
    M = lambda a, b: _mul(f, a, b)
    A = lambda a, b: _add(f, a, b)
    S = lambda a, b: _sub(f, a, b)
    mb3 = lambda t: (_mul_small(f, t, curve.b3) if curve.b3 <= 32 else
                     _mul(f, t, LF([jnp.full((8, 128), np.uint32(v))
                                    for v in curve.b3_mont_limbs],
                                   1 << LIMB_BITS, 2 * f.modulus)))

    t0 = M(x1, x2)
    t1 = M(y1, y2)
    t3 = S(M(A(x1, y1), A(x2, y2)), A(t0, t1))     # X1Y2 + X2Y1
    t4 = A(M(y2, z1), y1)                          # Y1 + Y2Z1
    t5 = A(M(x2, z1), x1)                          # X1 + X2Z1
    t0 = A(A(t0, t0), t0)                          # 3 X1X2
    t2 = mb3(z1)                                   # b3 Z1
    z3 = A(t1, t2)
    t1 = S(t1, t2)
    t5 = mb3(t5)
    x3 = _mul2(f, t3, t1, t4, t5, sub=True)        # t3*t1 - t4*t5
    y3 = _mul2(f, t1, z3, t5, t0, sub=False)       # t1*z3 + t5*t0
    z3 = _mul2(f, z3, t4, t0, t3, sub=False)       # z3*t4 + t0*t3
    out = []
    for v in (x3, y3, z3):
        v = _norm(f, v)
        assert v.vb <= _COORD_MULT * f.modulus, "coordinate class overflow"
        out.append(v.v)
    return out[0], out[1], out[2]




def _padd(curve: CurveSpec, px, py, pz, qx, qy, qz):
    """Complete projective addition (RCB Algorithm 7, a = 0) on limb lists.

    Same formula as ``curves/point.py::add``, with the trailing M+/-M
    pairs fused via :func:`_mul2` (equal mod p, not bit-identical).  Both
    operands in the 8p coordinate class; outputs normalized, value < 8p.
    """
    f = curve.fp
    wrap8 = lambda v: LF(v, 1 << LIMB_BITS, _COORD_MULT * f.modulus)
    x1, y1, z1 = wrap8(px), wrap8(py), wrap8(pz)
    x2, y2, z2 = wrap8(qx), wrap8(qy), wrap8(qz)
    M = lambda a, b: _mul(f, a, b)
    A = lambda a, b: _add(f, a, b)
    S = lambda a, b: _sub(f, a, b)
    mb3 = lambda t: (_mul_small(f, t, curve.b3) if curve.b3 <= 32 else
                     _mul(f, t, LF([jnp.full(t.v[0].shape, np.uint32(v))
                                    for v in curve.b3_mont_limbs],
                                   1 << LIMB_BITS, 2 * f.modulus)))

    t0 = M(x1, x2)
    t1 = M(y1, y2)
    t2 = M(z1, z2)
    t3 = S(M(A(x1, y1), A(x2, y2)), A(t0, t1))     # X1Y2 + X2Y1
    t4 = S(M(A(y1, z1), A(y2, z2)), A(t1, t2))     # Y1Z2 + Y2Z1
    t5 = S(M(A(x1, z1), A(x2, z2)), A(t0, t2))     # X1Z2 + X2Z1
    t0 = A(A(t0, t0), t0)                          # 3 X1X2
    t2 = mb3(t2)                                   # b3 Z1Z2
    z3 = A(t1, t2)
    t1 = S(t1, t2)
    t5 = mb3(t5)
    x3 = _mul2(f, t3, t1, t4, t5, sub=True)        # t3*t1 - t4*t5
    y3 = _mul2(f, t1, z3, t5, t0, sub=False)       # t1*z3 + t5*t0
    z3 = _mul2(f, z3, t4, t0, t3, sub=False)       # z3*t4 + t0*t3
    out = []
    for v in (x3, y3, z3):
        v = _norm(f, v)
        assert v.vb <= _COORD_MULT * f.modulus, "coordinate class overflow"
        out.append(v.v)
    return out[0], out[1], out[2]


def _pdbl(curve: CurveSpec, px, py, pz):
    """Complete doubling (RCB Algorithm 9, a = 0) on limb lists.

    Same op sequence as ``curves/point.py::dbl``; 8p class in/out."""
    f = curve.fp
    wrap8 = lambda v: LF(v, 1 << LIMB_BITS, _COORD_MULT * f.modulus)
    x, y, z = wrap8(px), wrap8(py), wrap8(pz)
    M = lambda a, b: _mul(f, a, b)
    A = lambda a, b: _add(f, a, b)
    S = lambda a, b: _sub(f, a, b)
    mb3 = lambda t: (_mul_small(f, t, curve.b3) if curve.b3 <= 32 else
                     _mul(f, t, LF([jnp.full(t.v[0].shape, np.uint32(v))
                                    for v in curve.b3_mont_limbs],
                                   1 << LIMB_BITS, 2 * f.modulus)))

    t0 = M(y, y)
    z3 = A(A(t0, t0), A(t0, t0))
    z3 = A(z3, z3)                                 # 8 Y^2
    t1 = M(y, z)
    t2 = mb3(M(z, z))                              # b3 Z^2
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
    out = []
    for v in (x3, y3, z3):
        v = _norm(f, v)
        assert v.vb <= _COORD_MULT * f.modulus, "coordinate class overflow"
        out.append(v.v)
    return out[0], out[1], out[2]
