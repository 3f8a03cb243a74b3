"""Vectorized Montgomery limb arithmetic on uint32[L, *batch] arrays.

TPU-native replacement for the reference's PTX carry-chain field template
(``/root/reference/src/cuda/core/field/field.cuh:10-1031`` and
``carry_chain.cuh``).  The TPU VPU has no add-with-carry and no 64-bit
multiplier, so elements are represented as **15-bit limbs in uint32 lanes**:

* a 16x16-bit product is exact in a uint32, so limbs may drift one bit past
  their 15-bit home (to < 2^16) and still multiply exactly;
* that one bit of redundancy lets modular add/sub be a SINGLE vector op —
  no carry chain at all.  Subtraction adds a precomputed multiple of p
  chosen so no limb underflows;
* carries are resolved only inside multiplication and in an explicit
  ``norm`` step, as short sequential chains vectorized across the batch.

Every element carries **static** (trace-time) bounds: ``lb`` (exclusive
limb bound) and ``vb`` (exclusive value bound).  Operations propagate the
bounds, auto-insert ``norm`` when a multiply needs sub-2^16 limbs, and fail
loudly at trace time if a Montgomery bound would be violated — the bounds
discipline costs nothing at runtime.

Montgomery domain: R = 2^(15 L) with R >= 512 p, values kept lazily in
[0, k*p) for small static k; CIOS output of any in-bounds product is < 2p.

Layout convention: limbs on axis 0 (TPU sublanes), batch on trailing axes
(TPU lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

_MASK = np.uint32(LIMB_MASK)
_U32 = jnp.uint32
_BASE = np.uint32(1 << LIMB_BITS)


class FE:
    """Field element batch with static limb/value bounds.

    ``v``: uint32[L, *batch]; ``lb``: exclusive bound on each limb;
    ``vb``: exclusive bound on the represented integer value.
    """

    __slots__ = ("v", "lb", "vb")

    def __init__(self, v, lb: int, vb: int):
        self.v = v
        self.lb = lb
        self.vb = vb

    @property
    def shape(self):
        return self.v.shape

    def __repr__(self):
        return f"FE(shape={getattr(self.v, 'shape', '?')}, lb=2^{self.lb.bit_length() - 1}, vb~2^{self.vb.bit_length() - 1})"


jax.tree_util.register_pytree_node(
    FE,
    lambda fe: ((fe.v,), (fe.lb, fe.vb)),
    lambda aux, ch: FE(ch[0], *aux),
)


def fe(spec: FieldSpec, v, mult: int = 2) -> FE:
    """Wrap a raw canonical-limb array as an FE with value < mult * p."""
    return FE(v, 1 << LIMB_BITS, mult * spec.modulus)


def _const(limbs: np.ndarray, batch_ndim: int) -> jnp.ndarray:
    return jnp.asarray(limbs.reshape(limbs.shape + (1,) * batch_ndim))


# ---------------------------------------------------------------------------
# Normalization and bounds plumbing
# ---------------------------------------------------------------------------

def norm(spec: FieldSpec, a: FE) -> FE:
    """Carry-propagate limbs back to < 2^15.  Requires value < R."""
    if a.lb <= (1 << LIMB_BITS):
        return a
    if a.vb > spec.r:
        raise OverflowError(
            f"{spec.name}: cannot normalize value bound 2^{a.vb.bit_length()}"
            f" >= R=2^{spec.r.bit_length() - 1}")
    L = spec.n_limbs
    v = a.v
    out = []
    carry = None
    for i in range(L):
        s = v[i] if carry is None else v[i] + carry
        out.append(s & _MASK)
        carry = s >> LIMB_BITS
    return FE(jnp.stack(out), 1 << LIMB_BITS, a.vb)


def _need16(spec: FieldSpec, a: FE) -> FE:
    """Ensure limbs < 2^16 (multiplication precondition)."""
    return a if a.lb <= (1 << 16) else norm(spec, a)


# ---------------------------------------------------------------------------
# Add / sub — single vector ops
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a: FE, b: FE) -> FE:
    lb = a.lb + b.lb
    if lb > (1 << 30):
        a = norm(spec, a)
        b = norm(spec, b)
        lb = a.lb + b.lb
    vb = a.vb + b.vb
    if vb > spec.r // 4:
        raise OverflowError(f"{spec.name}: add value bound overflow")
    return FE(a.v + b.v, lb, vb)


@functools.lru_cache(maxsize=None)
def _sub_const(spec: FieldSpec, lb: int, vb: int) -> tuple:
    """Multiple of p whose limbs dominate any element of class (lb, < vb).

    Returns (limb array, exact value).  Guarantees limb-wise subtraction of
    such an element never underflows.  vb must be exact (NOT rounded up):
    for the common case b < 2p the constant is ~3p, keeping value-bound
    growth linear across op chains.
    """
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
    return c.astype(np.uint32), c_val


def sub(spec: FieldSpec, a: FE, b: FE) -> FE:
    """a - b mod p as a + (C - b) with C = k*p dominating b limb-wise."""
    if b.lb > (1 << 30):
        b = norm(spec, b)
    c_limbs, c_val = _sub_const(spec, b.lb, b.vb)
    cb = _const(c_limbs, a.v.ndim - 1)
    lb = a.lb + int(c_limbs.max()) + 1
    vb = a.vb + c_val
    if lb > (1 << 31) or vb > spec.r // 4:
        a = norm(spec, a)
        lb = a.lb + int(c_limbs.max()) + 1
        if vb > spec.r // 4:
            raise OverflowError(f"{spec.name}: sub value bound overflow")
    return FE(a.v + cb - b.v, lb, vb)


def neg(spec: FieldSpec, a: FE) -> FE:
    c_limbs, c_val = _sub_const(spec, a.lb, a.vb)
    cb = _const(c_limbs, a.v.ndim - 1)
    return FE(jnp.broadcast_to(cb, a.v.shape) - a.v,
              int(c_limbs.max()) + 1, c_val)


def dbl(spec: FieldSpec, a: FE) -> FE:
    return add(spec, a, a)


def mul_small(spec: FieldSpec, a: FE, k: int) -> FE:
    """Multiply by a tiny constant via shift-and-add on bounds-tracked adds."""
    if k == 0:
        return FE(jnp.zeros_like(a.v), 1, 1)
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = add(spec, acc, acc)
        if bit == "1":
            acc = a if acc is None else add(spec, acc, a)
    return acc


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

def mul(spec: FieldSpec, a: FE, b: FE) -> FE:
    """Montgomery product a*b*R^-1 mod p; output canonical limbs, value < 2p.

    Carry-free schoolbook product + interleaved Montgomery reduction.  With
    limbs < 2^16 every 32-bit accumulator stays below ~2^23.
    """
    a = _need16(spec, a)
    b = _need16(spec, b)
    if a.vb * b.vb > spec.r * spec.modulus:
        raise OverflowError(
            f"{spec.name}: montmul bound a.vb*b.vb > R*p "
            f"(2^{(a.vb * b.vb).bit_length()} vs 2^{(spec.r * spec.modulus).bit_length()})")
    L = spec.n_limbs
    av, bv = jnp.broadcast_arrays(a.v, b.v)
    batch = av.shape[1:]
    nb = len(batch)
    p_np = spec.p_limbs
    ninv = np.uint32(spec.neg_inv)

    # Tensorized schoolbook product: ONE (L, L, *batch) multiply, then
    # anti-diagonal column sums t_k = sum_{i+j=k} lo/hi terms via per-row
    # zero-padding and a single axis-0 reduction.  This keeps the traced
    # graph ~10 ops instead of ~4*L^2 scalar-shaped ops — XLA compile time
    # on these field-heavy graphs is driven by HLO op COUNT, not FLOPs
    # (measured 833 s -> tens of s for a full MSM variant).  Column bound:
    # <= L lo terms (< 2^15) + L hi terms (< 2^17) < 2^22 per uint32 cell.
    prod = av[:, None] * bv[None]           # (L, L, *batch), exact 16x16->32
    lo = prod & _MASK
    hi = prod >> LIMB_BITS
    pad_cfg = [(0, 0)] * (nb + 2)

    def _skew(rows, off):
        # rows: (L, L, *batch); row i shifts to columns [i+off, i+off+L).
        shifted = [jnp.pad(rows[i], [(i + off, L - i + 1 - off)]
                           + pad_cfg[2:]) for i in range(L)]
        return sum(shifted)                 # (2L+1, *batch)

    t = _skew(lo, 0) + _skew(hi, 1)         # columns 0..2L

    # Interleaved Montgomery reduction: inherently sequential in i (m_i
    # depends on the running t_i), but each step is a handful of (L,)-wide
    # vector ops updated in place via static-index slice updates.
    for i in range(L):
        m = (t[i] * ninv) & _MASK
        pj = m[None] * jnp.asarray(p_np.astype(np.uint32)).reshape(
            (L,) + (1,) * nb)               # (L, *batch)
        upd = (pj & _MASK).astype(jnp.uint32)
        upd = upd.at[1:].add(pj[:-1] >> LIMB_BITS)  # fold hi into next col
        upd = jnp.concatenate([upd, (pj[-1:] >> LIMB_BITS)], axis=0)
        t = t.at[i:i + L + 1].add(upd)
        t = t.at[i + 1].add(t[i] >> LIMB_BITS)
    out = []
    carry = None
    for j in range(L):
        v = t[L + j] if carry is None else t[L + j] + carry
        out.append(v & _MASK)
        carry = v >> LIMB_BITS
    return FE(jnp.stack(out), 1 << LIMB_BITS, 2 * spec.modulus)


def sqr(spec: FieldSpec, a: FE) -> FE:
    return mul(spec, a, a)


def mul_const(spec: FieldSpec, a: FE, c_limbs: np.ndarray, c_vb: int) -> FE:
    c = FE(_const(c_limbs, a.v.ndim - 1), 1 << LIMB_BITS, c_vb)
    return mul(spec, a, c)


# ---------------------------------------------------------------------------
# Canonicalization / comparisons (raw-array helpers)
# ---------------------------------------------------------------------------

def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """Borrow-chain subtract of normalized limb arrays; (diff, borrow)."""
    L = a.shape[0]
    out = []
    borrow = None
    for i in range(L):
        t = a[i] + _BASE - b[i] if borrow is None else a[i] + _BASE - b[i] - borrow
        out.append(t & _MASK)
        borrow = np.uint32(1) - (t >> LIMB_BITS)
    return jnp.stack(out), borrow


def cond_sub(a: jnp.ndarray, c_limbs: np.ndarray) -> jnp.ndarray:
    """a - c if a >= c else a, on normalized limb arrays."""
    c = jnp.broadcast_to(_const(c_limbs, a.ndim - 1), a.shape)
    d, borrow = _sub_limbs(a, c)
    return jnp.where(borrow == 0, d, a)


def canonical(spec: FieldSpec, a: FE | jnp.ndarray) -> jnp.ndarray:
    """Full reduction to [0, p) with canonical 15-bit limbs (raw array out).

    Loose bounds (value >= 16p) reduce with ONE Montgomery multiply by
    rep(1) = R mod p — a*(R mod p)*R^-1 = a mod p, output < 2p — instead
    of a log2(k)-deep conditional-subtract ladder: each cond_sub is a full
    borrow chain + select, and at the NTT engine's ~2^8*p output bound
    the ladder cost half the whole 2^20 transform (13.8 ms of 28.5 ms
    true, tools/profile_ntt3.py round 4).
    """
    if not isinstance(a, FE):
        a = fe(spec, a)
    if a.vb > 16 * spec.modulus and a.vb <= spec.r:
        batch = a.v.shape[1:]
        n = int(np.prod(batch)) if batch else 1
        from ..ops import backend               # deferred: avoids cycle
        if backend.kernels_enabled() and n % 1024 == 0:
            # ONE fused kernel: Montgomery multiply by rep(1) (reduces any
            # in-range value to < 2p) + in-kernel cond_sub(p) -> [0, p).
            # Bit-identical to [fmul; norm; cond_sub ladder] — the jnp
            # ladder below stays for non-kernel backends, whose paths are
            # test-sized and compile-cost-sensitive.
            from ..ops import point_pallas
            a = norm(spec, a)
            L = spec.n_limbs
            ob = jnp.broadcast_to(
                _const(spec.mont_limbs(1), 1), (L, n))
            v = point_pallas.fmul(spec, a.v.reshape(L, n), ob,
                                  vb_a=a.vb, vb_b=spec.modulus,
                                  interpret=backend.interpret(),
                                  canonical_out=True)
            return v.reshape((L,) + batch)
    a = norm(spec, a)
    v = a.v
    k = max((a.vb + spec.modulus - 1) // spec.modulus, 1)
    j = max((k - 1).bit_length() - 1, 0)
    while True:
        v = cond_sub(v, int_to_limbs((1 << j) * spec.modulus, spec.n_limbs))
        if j == 0:
            break
        j -= 1
    return v


def is_zero(spec: FieldSpec, a: FE | jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canonical(spec, a) == 0, axis=0)


def eq_mod(spec: FieldSpec, a, b) -> jnp.ndarray:
    return jnp.all(canonical(spec, a) == canonical(spec, b), axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limb-wise select: mask is batch-shaped, a/b are (L, *batch)."""
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# Raw-array convenience layer (canonical-class inputs, normalized outputs).
# Used by pipelines that store plain arrays (scans, tables, codecs).
# ---------------------------------------------------------------------------

def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
             mult: int = 4) -> jnp.ndarray:
    """Raw Montgomery multiply; inputs normalized limbs with value < mult*p."""
    return mul(spec, fe(spec, a, mult), fe(spec, b, mult)).v


def mont_sqr(spec: FieldSpec, a: jnp.ndarray, mult: int = 4) -> jnp.ndarray:
    return mont_mul(spec, a, a, mult)


def mont_mul_const(spec: FieldSpec, a: jnp.ndarray, c_limbs: np.ndarray,
                   mult: int = 4) -> jnp.ndarray:
    out = mul_const(spec, fe(spec, a, mult), c_limbs, 2 * spec.modulus)
    return out.v


def add_mod(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
            mult: int = 2) -> jnp.ndarray:
    """Raw modular add; output normalized limbs, value < 2*mult*p."""
    return norm(spec, add(spec, fe(spec, a, mult), fe(spec, b, mult))).v


def sub_mod(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
            mult: int = 2) -> jnp.ndarray:
    return norm(spec, sub(spec, fe(spec, a, mult), fe(spec, b, mult))).v


def neg_mod(spec: FieldSpec, a: jnp.ndarray, mult: int = 2) -> jnp.ndarray:
    return norm(spec, neg(spec, fe(spec, a, mult))).v


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Standard form -> Montgomery form (multiply by R^2)."""
    return mont_mul_const(spec, a, spec.r2_limbs)


def from_wire(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Wire-format Montgomery (R_wire = 2^(8*n_bytes), the arkworks byte
    contract) -> internal Montgomery (R = 2^(15 L)).  One constant mul."""
    return mont_mul_const(spec, a, spec.wire_in_limbs, mult=2)


def to_wire(spec: FieldSpec, a: jnp.ndarray, mult: int = 8) -> jnp.ndarray:
    """Internal Montgomery -> canonical wire-format Montgomery value."""
    out = mul_const(spec, fe(spec, a, mult), spec.wire_out_limbs,
                    2 * spec.modulus)
    return canonical(spec, out)


def from_mont(spec: FieldSpec, a: jnp.ndarray, mult: int = 8) -> jnp.ndarray:
    """Montgomery -> standard form, canonical [0, p)."""
    out = mul_const(spec, fe(spec, a, mult), spec.unity_limbs, spec.modulus)
    return canonical(spec, out)


def mont_pow(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent (Montgomery domain, static exponent), fori_loop-driven."""
    if exponent < 0:
        raise ValueError("negative exponent")
    if exponent == 0:
        one = _const(spec.one_limbs, a.ndim - 1)
        return jnp.broadcast_to(one, a.shape).astype(_U32)
    nbits = exponent.bit_length()
    bits = np.array([(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.bool_)
    bits_j = jnp.asarray(bits)

    def body(i, acc):
        acc = mont_sqr(spec, acc)
        mulv = mont_mul(spec, acc, a)
        return select(bits_j[i], mulv, acc)

    return jax.lax.fori_loop(1, nbits, body, a)


def mont_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-domain inverse via Fermat: a^(p-2).  a must be nonzero."""
    return mont_pow(spec, a, spec.modulus - 2)


def batch_inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick batched inverse along the last axis (nonzero input).

    Replaces the reference's per-point field inverse in ``to_affine``
    (``projective.cuh:79-109``) with one inversion per batch.
    """
    n = a.shape[-1]
    if n == 1:
        return mont_inv(spec, a)

    def fwd(carry, x):
        nxt = mont_mul(spec, carry, x)
        return nxt, carry  # prefix product excluding x

    xs = jnp.moveaxis(a, -1, 0)
    one = jnp.broadcast_to(_const(spec.one_limbs, a.ndim - 2),
                           xs[0].shape).astype(_U32)
    total, prefix_ex = jax.lax.scan(fwd, one, xs)
    inv_total = mont_inv(spec, total)

    def bwd(carry, inp):
        x, pre = inp
        inv_x = mont_mul(spec, carry, pre)
        nxt = mont_mul(spec, carry, x)
        return nxt, inv_x

    _, invs = jax.lax.scan(bwd, inv_total, (xs, prefix_ex), reverse=True)
    return jnp.moveaxis(invs, 0, -1)
