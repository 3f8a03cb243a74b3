"""MXU (systolic-array) NTT engine: transforms as int8 limb-plane matmuls.

Every multiplication in an NTT is by a *known* constant (a root-of-unity
power), and multiplication by a known constant is a **linear map** over the
limb representation:

    c * x mod p  =  sum_i x_i * (c * 2^(5i) mod p)        x_i: 5-bit digits

so an entire length-K transform — all log2(K) butterfly stages together —
is ONE linear map y = F_K x whose matrix has small bounded entries.  In the
5-bit digit basis that is a (K*D, K*D) int8 matrix (D = 3*n_limbs digits of
5 bits; 15-bit limbs split exactly into 3 digits), and a batch of length-K
NTTs is a single int8 matmul that XLA places on the MXU
(`preferred_element_type=int32`).  Per element this costs the same MACs as
ONE constant multiply — the DFT matrix *absorbs* all stages — and the MXU
executes int8 MACs ~2 orders of magnitude faster than the VPU executes the
u32 schoolbook limb products of the Pallas butterfly kernel
(ops/ntt_pallas.py), which remains as the non-MXU fallback.

Large transforms use the same four-step recursion as ops/ntt_pallas.py
(reference radix-round contract: /root/reference/src/cuda/core/unit/ntt/
fft.cu:172-216): batched length-B pass, inter-step twiddle multiply
(variable per element -> stays on the VPU fmul kernel), transpose, batched
length-A matmul pass.  No bit-reversal anywhere: the DFT matrix maps
natural order to natural order.

Bound discipline (exact, asserted at plan-build time):
- matmul input: normalized 15-bit limbs, any value < R (digits cover all
  of R; the map is correct mod p for the full limb range);
- matmul accumulators: < K*D*31*31 per digit — int32-exact;
- regrouped value: < K*D*31*p; one fold of the bits above 15*(L-1) against
  precomputed 2^(S+5j) mod p brings it under ~2^8*p with normalized limbs,
  which composes with the Montgomery fmul (needs vb_a*vb_b <= R*p, and
  R >= 4096*p by FieldSpec construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.config import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs

DIG_BITS = 5
DIG_RADIX = 1 << DIG_BITS          # 32
DIG_MAX = DIG_RADIX - 1            # 31
DIG_PER_LIMB = LIMB_BITS // DIG_BITS
assert DIG_PER_LIMB * DIG_BITS == LIMB_BITS


def _digits5(value: int, d: int) -> np.ndarray:
    """Little-endian base-32 digits of ``value`` as int8[d]."""
    nbytes = (DIG_BITS * d + 7) // 8
    raw = np.frombuffer(value.to_bytes(nbytes, "little"), np.uint8)
    bits = np.unpackbits(raw, bitorder="little")[:DIG_BITS * d]
    return (bits.reshape(d, DIG_BITS)
            << np.arange(DIG_BITS, dtype=np.uint8)).sum(
        axis=1, dtype=np.int64).astype(np.int8)


@functools.lru_cache(maxsize=64)
def dft_matrix(spec: FieldSpec, log_k: int, omega: int,
               scale: int = 1) -> np.ndarray:
    """(K*D, K*D) int8 DFT-of-constants matrix.

    M[ki*D + i, ko*D + j] = digit_j(omega^(ki*ko) * scale * 2^(5i) mod p).
    Row blocks = input element index (natural order), column blocks =
    output element index (natural order).  ``scale`` (plain integer, e.g.
    n^-1 for the inverse transform) rides along for free.
    """
    K = 1 << log_k
    p = spec.modulus
    D = DIG_PER_LIMB * spec.n_limbs
    M = np.zeros((K * D, K * D), np.int8)
    for ko in range(K):
        w_ko = pow(omega, ko, p)
        c = scale % p
        for ki in range(K):
            v = c
            base = ki * D
            col = slice(ko * D, (ko + 1) * D)
            for i in range(D):
                M[base + i, col] = _digits5(v, D)
                v = (v << DIG_BITS) % p
            c = c * w_ko % p
    return M


@functools.lru_cache(maxsize=64)
def dft_matrix_grouped(spec: FieldSpec, log_k: int, omega: int,
                       scale: int = 1) -> np.ndarray:
    """Row/column-permuted :func:`dft_matrix` for :func:`dft_apply2`.

    Index order on BOTH axes: (t, l, k) — digit position major, limb,
    element — chosen so the operand/accumulator of the digit matmul are
    plain reshapes of the (L, K, nb) limb tensor with NO transposes:

      * input rows t*(L*K) + l*K + ki are ``(x >> 5t) & 31`` of the
        natural (L*K, nb) view, three stacked shift/mask copies;
      * output rows group the three digit-position planes contiguously,
        so the regroup reads whole (L, K, nb) blocks and the inter-limb
        spill is a K-row shift.
    """
    M = dft_matrix(spec, log_k, omega, scale)
    K = 1 << log_k
    L = spec.n_limbs
    D = DIG_PER_LIMB * L
    tt, ll, kk = np.meshgrid(np.arange(DIG_PER_LIMB), np.arange(L),
                             np.arange(K), indexing="ij")
    new2old = (kk * D + ll * DIG_PER_LIMB + tt).reshape(-1)
    return np.ascontiguousarray(M[new2old][:, new2old])


class _FoldPlan:
    """Exact bound bookkeeping + fold constants for one (spec, K)."""

    def __init__(self, spec: FieldSpec, log_k: int):
        K = 1 << log_k
        L = spec.n_limbs
        D = DIG_PER_LIMB * L
        p = spec.modulus
        self.acc_bound = K * D * DIG_MAX * DIG_MAX        # per int32 digit
        assert self.acc_bound < (1 << 31), "int32 accumulator overflow"
        # regroup: limb_i = a0 + (a1<<5) + ((a2 & 31)<<10) + (prev_a2>>5)
        limb_bound = (self.acc_bound * (1 + (1 << DIG_BITS))
                      + (DIG_MAX << (2 * DIG_BITS))
                      + (self.acc_bound >> DIG_BITS) + 1)
        assert limb_bound < (1 << 32), "uint32 limb regroup overflow"
        self.value_bound = K * D * DIG_MAX * p
        # limbs needed to hold the carried value
        self.n_limbs_ext = -(-self.value_bound.bit_length() // LIMB_BITS)
        assert self.n_limbs_ext >= L
        # fold split: bits >= S = 15*(L-1) (lo occupies limbs 0..L-2)
        self.split = LIMB_BITS * (L - 1)
        hi_limbs = self.n_limbs_ext - (L - 1)
        self.n_hi_digits = DIG_PER_LIMB * hi_limbs
        self.fold = np.stack([
            int_to_limbs(pow(2, self.split + DIG_BITS * j, p), L)
            for j in range(self.n_hi_digits)])            # (nh, L)
        self.out_vb = (1 << self.split) + self.n_hi_digits * DIG_MAX * p
        # folded limb accumulators: lo (<2^15) + nh products (<31*2^15)
        assert (1 << LIMB_BITS) * (1 + self.n_hi_digits * DIG_MAX) < (1 << 32)
        # output must compose with a Montgomery mul by a < 2p operand
        assert self.out_vb * 2 * p <= spec.r * p, "fold insufficient"


@functools.lru_cache(maxsize=64)
def _fold_plan(spec: FieldSpec, log_k: int) -> _FoldPlan:
    return _FoldPlan(spec, log_k)


def dft_apply(spec: FieldSpec, x: jnp.ndarray, log_k: int,
              mat: jnp.ndarray) -> jnp.ndarray:
    """Batched length-K NTT along axis 1 of (L, K, nb) via one int8 matmul.

    x: normalized 15-bit limbs, any represented value < R.  Output:
    normalized limbs, value < _fold_plan(...).out_vb (~2^8 * p), natural
    order both sides.
    """
    L, K, nb = x.shape
    assert K == 1 << log_k
    fp = _fold_plan(spec, log_k)
    D = DIG_PER_LIMB * L
    # --- limbs -> 5-bit digit planes, (K*D, nb) BATCH-MINOR ---------------
    # nb stays the minor (lane) dimension end-to-end: the only transpose
    # permutes the small leading axes over contiguous nb-rows (near-free),
    # where the previous (nb, K*D)-major form paid two full-tensor
    # relayouts per pass (measured ~4 ms/pass of the 6.25 ms dft_apply,
    # tools/profile_ntt3.py round 4).
    d = jnp.stack([x & DIG_MAX, (x >> DIG_BITS) & DIG_MAX,
                   (x >> (2 * DIG_BITS)) & DIG_MAX], axis=0)   # (3,L,K,nb)
    d = d.transpose(2, 1, 0, 3).reshape(K * D, nb).astype(jnp.int8)
    # --- the MXU pass: out[j, b] = sum_i M[i, j] * d[i, b] ----------------
    acc = jax.lax.dot_general(mat, d, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)  # (K*D, nb)
    # --- regroup digits -> limbs (uint32, exact) --------------------------
    # The third digit lands at bit 10 of limb i; only its low 5 bits fit —
    # the rest spills into limb i+1.  This keeps every uint32 cell below
    # 2^32 for any K the int32-accumulator bound admits (K=128 included).
    acc = acc.reshape(K, L, DIG_PER_LIMB, nb).astype(jnp.uint32)
    a2 = acc[:, :, 2]                                          # (K, L, nb)
    spill = jnp.concatenate(
        [jnp.zeros_like(a2[:, :1]), a2[:, :-1] >> DIG_BITS], axis=1)
    limbs = (acc[:, :, 0] + (acc[:, :, 1] << DIG_BITS)
             + ((a2 & DIG_MAX) << (2 * DIG_BITS)) + spill)     # (K, L, nb)
    limbs = jnp.moveaxis(limbs, 1, 0)                          # (L, K, nb)
    # Spill out of the last limb's third digit lands at position L.  When
    # the value bound fits L limbs it is provably zero (a nonzero word
    # there would put the value >= 2^(15L)); otherwise it must be added.
    spill_top = a2[:, -1] >> DIG_BITS                          # (K, nb)
    # --- carry-propagate over n_limbs_ext limbs ---------------------------
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(fp.n_limbs_ext):
        if i < L:
            s = limbs[i] + carry
        elif i == L:
            s = spill_top + carry
        else:
            s = carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    # --- fold bits >= split against 2^(S+5j) mod p ------------------------
    lo = out[:L - 1]
    hi = out[L - 1:]
    res = lo + [jnp.zeros_like(lo[0])]                         # L limbs
    t = 0
    for h in hi:
        for sub in range(DIG_PER_LIMB):
            dig = (h >> (DIG_BITS * sub)) & DIG_MAX
            f = fp.fold[t]
            res = [r + dig * np.uint32(f[j]) for j, r in enumerate(res)]
            t += 1
    # final carry-propagate to normalized limbs
    outp = []
    carry = None
    for i in range(L):
        s = res[i] if carry is None else res[i] + carry
        outp.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(outp)


def dft_apply2(spec: FieldSpec, x: jnp.ndarray, log_k: int,
               mat: jnp.ndarray) -> jnp.ndarray:
    """Transpose-free :func:`dft_apply`: batched length-K NTT along axis 1
    of (L, K, nb) via one int8 matmul against the GROUPED matrix
    (:func:`dft_matrix_grouped`).

    Mathematically identical to ``dft_apply`` (same digit planes, same
    accumulators, reordered), and bit-identical in output; the digit
    build and regroup are pure elementwise ops + contiguous row slices of
    the natural (L*K, nb) layout, where ``dft_apply`` pays a
    (3, L, K, nb) -> (K*D, nb) relayout on both sides of the matmul.
    """
    L, K, nb = x.shape
    assert K == 1 << log_k
    fp = _fold_plan(spec, log_k)
    xf = x.reshape(L * K, nb)
    d = jnp.concatenate(
        [xf & DIG_MAX, (xf >> DIG_BITS) & DIG_MAX,
         (xf >> (2 * DIG_BITS)) & DIG_MAX], axis=0).astype(jnp.int8)
    acc = jax.lax.dot_general(mat, d, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)  # (3LK, nb)
    a = acc.reshape(DIG_PER_LIMB, L, K, nb).astype(jnp.uint32)
    a0, a1, a2 = a[0], a[1], a[2]                                # (L, K, nb)
    spill = jnp.concatenate(
        [jnp.zeros_like(a2[:1]), a2[:-1] >> DIG_BITS], axis=0)
    limbs = (a0 + (a1 << DIG_BITS) + ((a2 & DIG_MAX) << (2 * DIG_BITS))
             + spill)                                            # (L, K, nb)
    spill_top = a2[-1] >> DIG_BITS                               # (K, nb)
    out = []
    carry = jnp.zeros_like(limbs[0])
    for i in range(fp.n_limbs_ext):
        if i < L:
            s = limbs[i] + carry
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
    outp = []
    carry = None
    for i in range(L):
        s = res[i] if carry is None else res[i] + carry
        outp.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(outp)


def _vmul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
          vb_a: int, vb_b: int) -> jnp.ndarray:
    """Variable (elementwise) Montgomery multiply: fused Pallas kernel on
    TPU, bit-identical jnp path elsewhere."""
    from . import backend
    if backend.kernels_enabled() and a.shape[-1] % 1024 == 0:
        from . import point_pallas
        return point_pallas.fmul(spec, a, b, vb_a=vb_a, vb_b=vb_b,
                                 interpret=backend.interpret())
    return mont.mul(spec, mont.FE(a, 1 << LIMB_BITS, vb_a),
                    mont.FE(b, 1 << LIMB_BITS, vb_b)).v


class MxuNttPlan:
    """Device tables for one (spec, log_n, omega, maxk) MXU transform.

    ``levels``: top-down four-step splits (log_a, log_b, T1 (L, A, B)
    Montgomery < 2p, outer DFT matrix); ``leaf``: final matrix.  The
    inverse-transform n^-1 scaling is absorbed into the TOP level's matrix
    (one scaled constant set — zero runtime cost).
    """

    def __init__(self, spec: FieldSpec, log_n: int, omega: int,
                 maxk: int = 7, scale: int = 1, grouped: bool = True,
                 fused: bool = False):
        self.spec = spec
        self.log_n = log_n
        self.grouped = grouped
        self.fused = fused
        if fused:
            assert grouped, "fused kernel consumes the grouped matrices"
            assert maxk <= 6, "fused kernel needs the DFT matrix in VMEM"
        mk = dft_matrix_grouped if grouped else dft_matrix
        self.levels = []
        log, w = log_n, omega
        first = True
        while log > maxk:
            la = maxk
            lb = log - la
            A, B = 1 << la, 1 << lb
            wA = pow(w, B, spec.modulus)
            from .ntt_pallas import FusedNttPlan
            t1 = FusedNttPlan._t1_table(spec, w, la, lb)       # (L, B, A)
            t1t = jnp.swapaxes(t1, 1, 2)                       # (L, A, B)
            mat = jnp.asarray(mk(spec, la, wA, scale if first else 1))
            self.levels.append((la, lb, t1t, mat))
            log, w, first = lb, pow(w, A, spec.modulus), False
        self.leaf = (log, jnp.asarray(mk(spec, log, w,
                                         scale if first else 1)))
        self.mid_vb = _fold_plan(spec, maxk).out_vb
        self.leaf_vb = _fold_plan(spec, log).out_vb


@functools.lru_cache(maxsize=16)
def mxu_plan(spec: FieldSpec, log_n: int, inverse: bool = False,
             maxk: int = 7, omega: int | None = None,
             grouped: bool = True, fused: bool = False) -> MxuNttPlan:
    if omega is None:
        omega = spec.root_of_unity(log_n)
    scale = 1
    if inverse:
        omega = pow(omega, -1, spec.modulus)
        scale = pow(1 << log_n, -1, spec.modulus)
    # Force the table computations (T1 build is a chain of wide device
    # muls) to run EAGERLY even when the caller is tracing: otherwise the
    # whole setup would inline into the jitted graph and rerun per call,
    # and the cache would hold leaked tracers.
    with jax.ensure_compile_time_eval():
        return MxuNttPlan(spec, log_n, omega, maxk, scale, grouped, fused)


def plan_tables(plan: MxuNttPlan):
    """The plan's device arrays as a pytree, for passing to a jitted
    transform as ARGUMENTS.  Closing over them instead would embed them
    as program constants — at 2^22 the top T1 table alone is ~300 MB,
    bloating every compile (and overflowing remote-compile transports)."""
    return (tuple((t1t, mat) for _, _, t1t, mat in plan.levels),
            plan.leaf[1])


def _transform(plan: MxuNttPlan, level: int, x: jnp.ndarray,
               tables) -> jnp.ndarray:
    """NTT along axis 1 of (L, M, batch), natural in/out order.  Output
    limbs normalized, value < plan.{leaf,mid}_vb."""
    spec = plan.spec
    if plan.fused:
        from . import backend
        if backend.kernels_enabled():
            from .ntt_fused import _BLK, dft_apply_fused
            interp = backend.interpret()

            def dapply(sp, xx, lk, mm):
                if xx.shape[-1] % _BLK == 0:
                    return dft_apply_fused(sp, xx, lk, mm,
                                           interpret=interp)
                return dft_apply2(sp, xx, lk, mm)
        else:
            dapply = dft_apply2
    else:
        dapply = dft_apply2 if plan.grouped else dft_apply
    lvl_tabs, leaf_mat = tables
    if level == len(plan.levels):
        log_k, _ = plan.leaf
        return dapply(spec, x, log_k, leaf_mat)
    la, lb, _, _ = plan.levels[level]
    t1t, mat = lvl_tabs[level]
    A, B = 1 << la, 1 << lb
    L, M, batch = x.shape
    assert M == A * B
    # inner: length-B over j2
    y = _transform(plan, level + 1, x.reshape(L, B, A * batch), tables)
    in_vb = plan.leaf_vb if level + 1 == len(plan.levels) else plan.mid_vb
    # four-step twiddle w^(j1*k2): variable per element -> VPU fmul
    y = y.reshape(L, B, A, batch)
    z = jnp.swapaxes(y, 1, 2).reshape(L, A, B * batch)
    pre = (t1t if batch == 1 else
           jnp.broadcast_to(t1t[..., None], (L, A, B, batch))
           .reshape(L, A, B * batch))
    z = _vmul(spec, z.reshape(L, -1), pre.reshape(L, -1),
              vb_a=in_vb, vb_b=2 * spec.modulus).reshape(L, A, B * batch)
    # outer: length-A matmul pass
    return dapply(spec, z, la, mat).reshape(L, A * B, batch)


def apply_ntt(plan: MxuNttPlan, x: jnp.ndarray, tables) -> jnp.ndarray:
    """Transform with explicit table arguments (see ``plan_tables``)."""
    spec = plan.spec
    n = 1 << plan.log_n
    L = x.shape[0]
    batch = x.shape[1:-1]
    xb = x.reshape(L, -1, n)
    xb = jnp.moveaxis(xb, 1, 2)                 # (L, n, nb)
    y = _transform(plan, 0, xb, tables)
    y = jnp.moveaxis(y, 2, 1).reshape((L,) + batch + (n,))
    top_vb = (plan.mid_vb if plan.levels else plan.leaf_vb)
    return mont.canonical(spec, mont.FE(y, 1 << LIMB_BITS, top_vb))


def mxu_ntt(spec: FieldSpec, x: jnp.ndarray, log_n: int,
            inverse: bool = False, maxk: int = 7,
            omega: int | None = None) -> jnp.ndarray:
    """Full MXU NTT along the LAST axis of (L, *batch, n).

    Montgomery in/out; output canonical in [0, p), matching
    ``ops/ntt.py``'s contract bit-for-bit (INTT includes n^-1 scaling).
    """
    plan = mxu_plan(spec, log_n, inverse, maxk, omega)
    return apply_ntt(plan, x, plan_tables(plan))


def mxu_ntt_jitted(spec: FieldSpec, log_n: int, inverse: bool = False,
                   maxk: int = 7, omega: int | None = None):
    """Jitted transform with tables passed as arguments (not constants)."""
    plan = mxu_plan(spec, log_n, inverse, maxk, omega)
    tables = plan_tables(plan)
    jfn = jax.jit(functools.partial(apply_ntt, plan))
    return lambda x: jfn(x, tables)
