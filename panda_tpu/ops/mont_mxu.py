"""MXU-assisted variable Montgomery multiplication — the round-5 A/B
prototype for VERDICT item #1.

Idea under test: a Montgomery multiply is (1) a variable*variable
schoolbook product and (2) a reduction.  The product has no shared
contraction across a batch (each lane multiplies different operands), so
the MXU cannot help there; but the REDUCTION is two multiplications by
CONSTANTS — m = t_lo * N' mod R (N' = -p^-1 mod R) and m*p — and any
constant multiply is a linear map over digit planes, exactly the trick
the NTT engine rides (ops/ntt_mxu.py).  Formally, with t_lo's 5-bit
digits d_i:

    M   = sum_i d_i * (N' * 2^(5i) mod R)      [one (3L, 3L) int8 matmul]
    m   = M mod R                               [regroup + carry, drop >= R]
    t2  = sum_j m_j * (p * 2^(5j))              [one (3L, 3L+3) int8 matmul]
    out = (t + t2) / R                          [add high halves + carry]

Feeding the second matmul M's *unnormalized* digit accumulators would be
wrong only mod R — and (t + M*p)/R needs exactness — so M must be
carry-normalized first; that chain plus the digit splits is the VPU cost
this trades against the interleaved reduction's ~2.5*L^2 vector ops.

Static op-count analysis (L = 18, BN254): interleaved reduction ~810
vector ops vs ~680 glue ops here + 2 matmuls — a <=15% delta on HALF of
each multiply, i.e. <=7% of a full madd.  This module exists to measure
that honestly on the chip (tools/ab_mont_mxu.py) rather than argue it;
the production pipeline keeps the interleaved form unless the A/B says
otherwise.  Bit-identical output class (normalized limbs, value < 2p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs
from .ntt_mxu import DIG_BITS, DIG_MAX, DIG_PER_LIMB

_MASK = np.uint32(LIMB_MASK)


@functools.lru_cache(maxsize=16)
def _reduce_mats(spec: FieldSpec):
    """(N'-map, p-map) int8 digit matrices for the reduction.

    N'-map: rows = input digit index i (3L), cols = output digit j (3L):
    digit_j(N' * 2^(5i) mod R).  p-map: digit_j(p * 2^(5i)) over the full
    6L output digits (m*p < R*p spans 2L limbs).
    """
    L = spec.n_limbs
    D = DIG_PER_LIMB * L
    R = spec.r
    # N' = -p^-1 mod R
    npr = (-pow(spec.modulus, -1, R)) % R

    def digs(v, d):
        return [(v >> (DIG_BITS * k)) & DIG_MAX for k in range(d)]

    m1 = np.zeros((D, D), np.int8)
    for i in range(D):
        m1[i, :] = digs((npr << (DIG_BITS * i)) % R, D)
    # m*p < R*p spans up to 2L limbs, so the p-map must emit the FULL 6L
    # digit planes — this doubling of the second matmul + regroup is the
    # structural cost that the interleaved form avoids (it never
    # materializes m*p; see the A/B writeup).
    Dout = 2 * D
    m2 = np.zeros((D, Dout), np.int8)
    for i in range(D):
        m2[i, :] = digs(spec.modulus << (DIG_BITS * i), Dout)
    # numpy out of the cache: jnp.asarray under an active trace would
    # cache a leaked tracer (tiny matrices — constant-folding is fine)
    return m1, m2


def _digits(x_limbs):
    """List of L normalized limb rows -> (3L, N) int8 digit plane stack."""
    rows = []
    for v in x_limbs:
        rows.append(v & DIG_MAX)
        rows.append((v >> DIG_BITS) & DIG_MAX)
        rows.append((v >> (2 * DIG_BITS)) & DIG_MAX)
    return jnp.stack(rows).astype(jnp.int8)


def fmul_mxu(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product with the reduction on the MXU (XLA form).

    a, b: uint32[L, N] normalized limbs, values < 2p.  Output: normalized
    limbs, value < 2p (same class as mont.mul; equal mod p and — with the
    same final carry convention — bit-identical on canonical inputs).
    """
    L = spec.n_limbs
    N = a.shape[-1]
    D = DIG_PER_LIMB * L
    p_np = spec.p_limbs
    m1, m2 = _reduce_mats(spec)

    # ---- schoolbook product (VPU, same tensorized form as mont.mul) -----
    prod = a[:, None] * b[None]              # (L, L, N) exact 16x16->32
    lo = prod & _MASK
    hi = prod >> LIMB_BITS

    def _skew(rows, off):
        shifted = [jnp.pad(rows[i], [(i + off, L - i + 1 - off), (0, 0)])
                   for i in range(L)]
        return sum(shifted)                  # (2L+1, N)

    t = _skew(lo, 0) + _skew(hi, 1)          # cols 0..2L, each < 2^22

    # ---- exact t mod R limbs (carry chain over the low half) ------------
    tlo = []
    carry = None
    for i in range(L):
        s = t[i] if carry is None else t[i] + carry
        tlo.append(s & _MASK)
        carry = s >> LIMB_BITS
    # carry flows into the high half at column L
    thi = [t[L] + carry] + [t[L + 1 + j] for j in range(L)]   # L+1 cols

    # ---- M = t_lo x N'-map on the MXU -----------------------------------
    dm = jax.lax.dot_general(m1, _digits(tlo), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)  # (3L, N)
    # regroup M digit accs -> limbs; carry-normalize; m = M mod R
    macc = dm.astype(jnp.uint32).reshape(L, DIG_PER_LIMB, N)
    a2 = macc[:, 2]
    spill = jnp.concatenate([jnp.zeros_like(a2[:1]),
                             a2[:-1] >> DIG_BITS], axis=0)
    ml = (macc[:, 0] + (macc[:, 1] << DIG_BITS)
          + ((a2 & DIG_MAX) << (2 * DIG_BITS)) + spill)         # (L, N)
    mfin = []
    carry = None
    for i in range(L):
        s = ml[i] if carry is None else ml[i] + carry
        mfin.append(s & _MASK)
        carry = s >> LIMB_BITS
    # bits >= R of M are dropped: m = M mod R exactly.

    # ---- t2 = m * p on the MXU ------------------------------------------
    dp = jax.lax.dot_general(m2, _digits(mfin), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)  # (6L, N)
    Le = 2 * L
    pacc = dp.astype(jnp.uint32).reshape(Le, DIG_PER_LIMB, N)
    b2 = pacc[:, 2]
    spill = jnp.concatenate([jnp.zeros_like(b2[:1]),
                             b2[:-1] >> DIG_BITS], axis=0)
    pl = (pacc[:, 0] + (pacc[:, 1] << DIG_BITS)
          + ((b2 & DIG_MAX) << (2 * DIG_BITS)) + spill)         # (2L, N)

    # ---- (t + m*p) / R ---------------------------------------------------
    # Low half: only the carry out survives (low limbs == 0 mod 2^15 by
    # construction of m).
    carry = None
    for i in range(L):
        s = tlo[i] + pl[i] if carry is None else tlo[i] + pl[i] + carry
        carry = s >> LIMB_BITS
    out = []
    c = carry
    for i in range(L):
        s = thi[i] + pl[L + i] + c
        out.append(s & _MASK)
        c = s >> LIMB_BITS
    # remaining c is provably zero for in-class inputs (result < 2p), as
    # in mont.mul's deferred final reduction.
    return jnp.stack(out)
