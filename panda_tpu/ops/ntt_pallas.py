"""Fused multi-stage NTT Pallas kernels (four-step / six-step driver).

The stagewise jnp NTT in ``ops/ntt.py`` pays ~log2(n) full HBM round trips
(each butterfly stage reads and writes every limb of the whole array, plus
relayouts for the stage reshape).  On TPU the arithmetic is far from the
bottleneck — HBM bandwidth is — so the fused formulation processes
``K = 2^maxk`` butterfly stages per HBM pass: each grid step loads an
(L, K, 128) tile (transform axis on sublanes, 128 independent transforms
on lanes), runs all log2(K) decimation-in-time stages unrolled inside the
kernel with every intermediate in registers/VMEM, and writes the finished
length-K transforms back.

Large transforms decompose by the classic four-step scheme (the same
factorization ``parallel/ntt_sharded.py`` uses across chips, here applied
within one chip): with n = A·B and w the length-n root,

    X[B·k1 + k2] = NTT_A( w^(j1·k2) · NTT_B(x[j1 + A·j2], over j2), over j1 )

i.e. one batched length-B pass, one elementwise twiddle multiply, one
transpose, one batched length-A pass (``B`` recurses until it fits the
kernel).  Reference NTT contract (omega table, Montgomery I/O):
``/root/reference/src/cuda/core/unit/ntt/fft.cu:63-216`` — the reference's
radix-2^deg shared-memory rounds (deg <= 8, ``fft.cu:9-11``) are the same
blocking idea; this is its TPU-native form.

All values are Montgomery limb arrays; kernel outputs are normalized with
value < 2p (a final in-kernel multiply by the Montgomery one collapses the
lazy butterfly bounds), so passes compose without host-side fixups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import mont
from ..fields.config import LIMB_BITS, FieldSpec
from .kernel_field import LF, _add, _mul, _sub

_LANES = 128


# ---------------------------------------------------------------------------
# Host-side tables
# ---------------------------------------------------------------------------


def stage_twiddle_rows(spec: FieldSpec, log_k: int, omega: int) -> np.ndarray:
    """Stacked per-stage DIT twiddle rows, Montgomery, lane-broadcast.

    Stage s (half-block m = 2^s) multiplies the odd half by
    w^(t * K/(2m)) for t in [0, m); its m rows live at [m-1, 2m-1).
    Total K-1 rows, padded to K.  Shape (1, L, K, 128) uint32.
    """
    K = 1 << log_k
    L = spec.n_limbs
    rows = np.zeros((L, K), dtype=np.uint32)
    for s in range(log_k):
        m = 1 << s
        stride = K // (2 * m)
        for t in range(m):
            w = pow(omega, t * stride, spec.modulus)
            rows[:, m - 1 + t] = spec.mont_limbs(w)
    return np.broadcast_to(rows[None, :, :, None],
                           (1, L, K, _LANES)).copy()


def _bitrev(log_k: int) -> np.ndarray:
    n = 1 << log_k
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for _ in range(log_k):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)


# ---------------------------------------------------------------------------
# The fused stage-group kernel
# ---------------------------------------------------------------------------


def _kernel(spec: FieldSpec, log_k: int, vb_in: int, fuse_tw: bool,
            *refs):
    if fuse_tw:
        x_ref, tw_ref, pre_ref, o_ref = refs
    else:
        x_ref, tw_ref, o_ref = refs
        pre_ref = None
    L = spec.n_limbs
    K = 1 << log_k
    X = LF([x_ref[0, i] for i in range(L)], 1 << LIMB_BITS, vb_in)
    if pre_ref is not None:
        # Fused inter-step twiddle (four-step T1): one multiply at load
        # replaces a whole separate fmul pass over HBM.
        pre = LF([pre_ref[0, i] for i in range(L)], 1 << LIMB_BITS,
                 2 * spec.modulus)
        X = _mul(spec, X, pre)
    for s in range(log_k):
        m = 1 << s
        g = K // (2 * m)
        xr = [v.reshape(g, 2, m, _LANES) for v in X.v]
        u = LF([v[:, 0] for v in xr], X.lb, X.vb)
        v = LF([w[:, 1] for w in xr], X.lb, X.vb)
        if s == 0:
            t = v                        # twiddle w^0 = 1
        else:
            tw = LF([tw_ref[0, i, m - 1:2 * m - 1, :] for i in range(L)],
                    1 << LIMB_BITS, 2 * spec.modulus)
            t = _mul(spec, v, tw)
        hi = _add(spec, u, t)
        lo = _sub(spec, u, t)
        X = LF([jnp.stack([a, b], axis=1).reshape(K, _LANES)
                for a, b in zip(hi.v, lo.v)],
               max(hi.lb, lo.lb), max(hi.vb, lo.vb))
    # Collapse the lazy bounds: one Montgomery multiply by ONE (= R mod p)
    # leaves the value in-domain, < 2p, limbs normalized.
    one = LF([jnp.full((K, _LANES), np.uint32(c)) for c in spec.one_limbs],
             1 << LIMB_BITS, spec.modulus)
    X = _mul(spec, X, one)
    for i in range(L):
        o_ref[0, i] = X.v[i]


def small_ntt_batch(spec: FieldSpec, x: jnp.ndarray, log_k: int,
                    tw_rows: jnp.ndarray, vb_in: int | None = None,
                    pre_tw: jnp.ndarray | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Batch of length-K NTTs along axis 1.

    x: uint32[L, K, Nb] with the transform axis BIT-REVERSED (output comes
    back in natural order); Nb is padded here to a multiple of 128.
    tw_rows: ``stage_twiddle_rows`` array for (log_k, omega).  pre_tw
    (optional, same shape as x): per-element Montgomery factor applied at
    load — the four-step inter-step twiddle fused into the kernel.  Values
    Montgomery, normalized limbs, value < vb_in (default 2p); output < 2p.
    """
    L, K, nb = x.shape
    assert K == 1 << log_k and K >= 8
    if vb_in is None:
        vb_in = 2 * spec.modulus
    T = -(-nb // _LANES)
    P = T * _LANES
    if P != nb:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, P - nb)))
        if pre_tw is not None:
            pre_tw = jnp.pad(pre_tw, ((0, 0), (0, 0), (0, P - nb)))

    def to_tiles(a):
        return jnp.transpose(a.reshape(L, K, T, _LANES), (2, 0, 1, 3))

    bspec = pl.BlockSpec((1, L, K, _LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, L, K, _LANES), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    fuse = pre_tw is not None
    ins = [to_tiles(x), tw_rows] + ([to_tiles(pre_tw)] if fuse else [])
    out = pl.pallas_call(
        functools.partial(_kernel, spec, log_k, vb_in, fuse),
        grid=(T,),
        in_specs=[bspec, tspec] + ([bspec] if fuse else []),
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((T, L, K, _LANES), jnp.uint32),
        # The unrolled stages keep ~3 tile-sized intermediates live; the
        # default 16 MB scoped-vmem budget is a soft limit well below the
        # chip's VMEM (v5e: 128 MB) — raise it instead of shrinking K.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    out = jnp.transpose(out, (1, 2, 0, 3)).reshape(L, K, P)
    return out[:, :, :nb]


# ---------------------------------------------------------------------------
# Four-step recursion
# ---------------------------------------------------------------------------


class FusedNttPlan:
    """Device tables for one (spec, log_n, omega, maxk) fused transform.

    ``levels`` lists the recursion top-down; each level holds the
    (log_a, log_b) split and the (L, B, A) inter-step twiddle table
    T1[k2, j1] = w^(j1*k2); the leaf holds its stage-twiddle rows.  Tables
    are device arrays built once (the analog of the reference's setup-time
    omega table, ``fft.cu:63-73``).
    """

    def __init__(self, spec: FieldSpec, log_n: int, omega: int,
                 maxk: int = 8):
        self.spec = spec
        self.log_n = log_n
        self.maxk = maxk
        self.levels = []            # [(log_a, log_b, T1t_br, leafA_tw, brA)]
        self.leaf = None            # (log_k, tw_rows, bitrev)
        assert log_n >= 3, "fused NTT needs n >= 8"
        log, w = log_n, omega
        # Balanced splits minimize recursion depth and keep every factor
        # kernel-sized (>= 8 rows, i.e. >= 3 bits); a 4-5 bit residue
        # can't split into two such factors and becomes a slightly
        # oversized leaf instead (maxk is a VMEM-sizing target, not a cap).
        while log > maxk and log >= 6:
            la = min(maxk, (log + 1) // 2)
            lb = log - la
            A, B = 1 << la, 1 << lb
            wA = pow(w, B, spec.modulus)   # outer length-A root
            brA = _bitrev(la)
            t1 = self._t1_table(spec, w, la, lb)        # (L, B, A)
            # Stored transposed to the outer kernel's (rows=j1, lanes=k2)
            # layout with rows already bit-reversed, so it feeds the
            # kernel's fused load-side multiply with no runtime reshuffle.
            t1t = jnp.take(jnp.swapaxes(t1, 1, 2), jnp.asarray(brA), axis=1)
            self.levels.append((la, lb, t1t,
                                jnp.asarray(stage_twiddle_rows(spec, la, wA)),
                                jnp.asarray(brA)))
            log, w = lb, pow(w, A, spec.modulus)
        self.leaf = (log, jnp.asarray(stage_twiddle_rows(spec, log, w)),
                     jnp.asarray(_bitrev(log)))

    @staticmethod
    def _t1_table(spec: FieldSpec, w: int, la: int, lb: int) -> jnp.ndarray:
        """T1[k2, j1] = w^(j1*k2), Montgomery (L, B, A).

        Built HOST-SIDE (big-int row cumprods, ~5-10s at 2^20 entries):
        the previous device chain issued A-1 sequential muls plus a
        doubling power table — dozens of remote compiles per cold
        process on axon."""
        from ..fields import codec
        A, B = 1 << la, 1 << lb
        p = spec.modulus
        vals = [0] * (B * A)          # row-major (k2, j1)
        step = 1                      # w^{k2}
        for k2 in range(B):
            acc = 1
            base = k2 * A
            for j1 in range(A):
                vals[base + j1] = spec.to_mont_int(acc)
                acc = acc * step % p
            step = step * w % p
        limbs = codec.ints_to_limbs(spec, vals)            # (L, B*A)
        return jnp.asarray(limbs.reshape(spec.n_limbs, B, A))


@functools.lru_cache(maxsize=16)
def fused_plan(spec: FieldSpec, log_n: int, inverse: bool = False,
               maxk: int = 8, omega: int | None = None) -> FusedNttPlan:
    if omega is None:
        omega = spec.root_of_unity(log_n)
    if inverse:
        omega = pow(omega, -1, spec.modulus)
    # Tables must be concrete even when the caller is tracing (see
    # ntt_mxu.mxu_plan): otherwise the T1 doubling chains inline into the
    # jitted graph and rerun per call, and the cache holds leaked tracers.
    with jax.ensure_compile_time_eval():
        return FusedNttPlan(spec, log_n, omega, maxk)


def _transform(plan: FusedNttPlan, level: int, x: jnp.ndarray,
               interpret: bool) -> jnp.ndarray:
    """NTT along axis 1 of (L, M, batch), natural in/out order."""
    spec = plan.spec
    if level == len(plan.levels):
        log_k, tw, br = plan.leaf
        return small_ntt_batch(spec, jnp.take(x, br, axis=1), log_k, tw,
                               interpret=interpret)
    la, lb, t1t, twA, brA = plan.levels[level]
    A, B = 1 << la, 1 << lb
    L, M, batch = x.shape
    assert M == A * B
    # inner: length-B over j2; x[j1 + A*j2] -> reshape (B, A*batch)
    y = _transform(plan, level + 1,
                   x.reshape(L, B, A * batch), interpret)
    # outer: length-A over j1 -> transpose to (A, B*batch); the four-step
    # twiddle w^(j1*k2) rides the kernel's fused load-side multiply
    # (t1t is pre-transposed and row-bit-reversed to this layout).
    y = y.reshape(L, B, A, batch)
    z = jnp.swapaxes(y, 1, 2).reshape(L, A, B * batch)
    pre = t1t if batch == 1 else jnp.broadcast_to(
        t1t[..., None], (L, A, B, batch)).reshape(L, A, B * batch)
    out = small_ntt_batch(spec, jnp.take(z, brA, axis=1), la, twA,
                          pre_tw=pre, interpret=interpret)
    return out.reshape(L, A * B, batch)


def fused_ntt(spec: FieldSpec, x: jnp.ndarray, log_n: int,
              inverse: bool = False, maxk: int = 8,
              omega: int | None = None,
              interpret: bool = False) -> jnp.ndarray:
    """Full fused NTT along the LAST axis of (L, *batch, n).

    Montgomery in/out; output canonical in [0, p) (INTT includes the n^-1
    scaling), matching ``ops/ntt.py``'s contract bit-for-bit.
    """
    plan = fused_plan(spec, log_n, inverse, maxk, omega)
    n = 1 << log_n
    L = x.shape[0]
    batch = x.shape[1:-1]
    xb = x.reshape(L, -1, n)                    # (L, nb, n)
    xb = jnp.moveaxis(xb, 1, 2)                 # (L, n, nb)
    y = _transform(plan, 0, xb, interpret)      # (L, n, nb) < 2p
    y = jnp.moveaxis(y, 2, 1).reshape((L,) + batch + (n,))
    fe = mont.FE(y, 1 << LIMB_BITS, 2 * spec.modulus)
    if inverse:
        n_inv = spec.mont_limbs(pow(n, -1, spec.modulus))
        n_inv = jnp.asarray(n_inv).reshape(
            (L,) + (1,) * (y.ndim - 1))
        fe = mont.mul(spec, fe, mont.FE(n_inv, 1 << LIMB_BITS,
                                        2 * spec.modulus))
    return mont.canonical(spec, fe)
