"""Multi-chip NTT: four-step decomposition with all_to_all transposes.

New surface required by the build plan (SURVEY.md §5 "long-context" analog,
§7.6): the radix-round plan of the reference (``fft.cu:193-210``) factors
n = n1 * n2 and becomes

    view x as A[j1, j2] (row-major)                         [rows sharded]
    all_to_all -> columns sharded
    step 1: NTT_n1 along columns (local)
    step 2: twiddle by w^(j2 * k1) (local)
    all_to_all -> rows sharded
    step 3: NTT_n2 along rows (local)
    all_to_all + local transpose -> natural-order output, rows sharded

with X[k1 + n1*k2] = C[k1, k2].  The all_to_alls ride ICI; the local
transforms run on the PRODUCTION single-chip engine — the MXU int8
digit-plane matmul NTT (ops/ntt_mxu.py), the same engine the unsharded
byte API defaults to, so multi-chip scaling starts from the single-chip
throughput rather than the stagewise-jnp fallback's (round-4 verdict
weak #4).  ``engine="jnp"`` keeps the old butterfly path for A/B.

The step-2 twiddle w^(j2*k1) is applied from two FACTORED power tables
(k1 = kh*2^s + kl -> one table over w^(2^s) powers, one over w powers,
each ~n/sqrt(n1) entries) instead of a full n-entry table: at 2^24 the
full table is 1.2 GB *replicated per device* and its gather falls in
XLA's slow large-table regime; the factored tables stay a few MB (fast
gather regime) at the cost of one extra elementwise Montgomery multiply.

Bit-exact vs the single-device transform (both end canonical in [0, p)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import mont
from ..fields.config import FieldSpec
from ..ops import ntt as ntt_ops
from ..ops import ntt_mxu


def _split_log(log_n: int) -> tuple[int, int]:
    log_n1 = log_n // 2
    return log_n1, log_n - log_n1


@functools.lru_cache(maxsize=16)
def _tables(spec: FieldSpec, log_n: int, omega: int | None):
    """Sub-transform tables + full power table for the twiddle matrix
    (jnp-engine path)."""
    n = 1 << log_n
    log_n1, log_n2 = _split_log(log_n)
    if omega is None:
        omega = spec.root_of_unity(log_n)
    om1 = pow(omega, 1 << log_n2, spec.modulus)   # omega_n1 = w^(n2)
    om2 = pow(omega, 1 << log_n1, spec.modulus)   # omega_n2 = w^(n1)
    t1 = ntt_ops.make_tables(spec, log_n1, om1)
    t2 = ntt_ops.make_tables(spec, log_n2, om2)
    wfull = ntt_ops._power_table(spec, omega, n)   # (L, n)
    # inverse variants
    om_inv = pow(omega, -1, spec.modulus)
    wfull_inv = ntt_ops._power_table(spec, om_inv, n)
    n_inv = spec.mont_limbs(pow(n, -1, spec.modulus))
    return t1, t2, wfull, wfull_inv, n_inv


@functools.lru_cache(maxsize=16)
def _mxu_local(spec: FieldSpec, log_n: int, omega: int | None,
               inverse: bool):
    """MXU plans + factored twiddle tables for the four-step local work.

    The n^-1 scaling of the inverse transform factors as n1^-1 * n2^-1,
    which the two inverse sub-plans bake into their top-level matrices;
    inverse twiddles come from the w^-1 tables.
    """
    n = 1 << log_n
    log_n1, log_n2 = _split_log(log_n)
    if omega is None:
        omega = spec.root_of_unity(log_n)
    om1 = pow(omega, 1 << log_n2, spec.modulus)
    om2 = pow(omega, 1 << log_n1, spec.modulus)
    p1 = ntt_mxu.mxu_plan(spec, log_n1, inverse=inverse, omega=om1)
    p2 = ntt_mxu.mxu_plan(spec, log_n2, inverse=inverse, omega=om2)
    w = pow(omega, -1, spec.modulus) if inverse else omega
    # factored twiddle: k1 = kh*2^s + kl
    s = (log_n1 + 1) // 2
    n1 = 1 << log_n1
    wa = pow(w, 1 << s, spec.modulus)            # order n >> s
    ta = ntt_ops._power_table(spec, wa, n >> s)              # (L, n/2^s)
    tb = ntt_ops._power_table(spec, w, (1 << log_n2) << s)   # (L, n2*2^s)
    return p1, p2, s, ta, tb


def ntt_sharded_fn(spec: FieldSpec, mesh: Mesh, axis: str, log_n: int,
                   omega: int | None = None, inverse: bool = False,
                   engine: str = "mxu"):
    """Build a shard_map'd NTT over ``mesh``.

    Input/output: uint32[L, n] Montgomery, last axis sharded over ``axis``.
    ``engine``: "mxu" (production int8 digit-plane engine) or "jnp" (the
    stagewise butterfly fallback, kept for A/B).
    """
    n = 1 << log_n
    log_n1, log_n2 = _split_log(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    d = mesh.shape[axis]
    if n1 % d or n2 % d:
        raise ValueError(f"n1={n1}, n2={n2} must be divisible by mesh size {d}")
    L = spec.n_limbs
    if engine == "mxu":
        p1, p2, s, ta, tb = _mxu_local(spec, log_n, omega, inverse)
        tabs1, tabs2 = ntt_mxu.plan_tables(p1), ntt_mxu.plan_tables(p2)
        p2m = 2 * spec.modulus

        def local(x):
            # x: (L, n/d) local contiguous chunk == (L, n1/d, n2) rows of A.
            me = jax.lax.axis_index(axis)
            a = x.reshape(L, n1 // d, n2)
            # rows -> columns sharded: (L, n1, n2/d)
            a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
            # step 1: NTT_n1 along j1 (put j1 last for the engine)
            a = jnp.swapaxes(a, 1, 2)                    # (L, n2/d, n1)
            a = ntt_mxu.apply_ntt(p1, a, tabs1)          # canonical < p
            # step 2: twiddle w^(j2_global * k1), factored tables
            j2 = me * (n2 // d) + jnp.arange(n2 // d,
                                             dtype=jnp.uint32)[:, None]
            k1 = jnp.arange(n1, dtype=jnp.uint32)[None, :]
            kh, kl = k1 >> np.uint32(s), k1 & np.uint32((1 << s) - 1)
            ia = ((j2 * kh) % np.uint32(n >> s)).astype(jnp.int32)
            ib = (j2 * kl).astype(jnp.int32)             # < n2 * 2^s
            twa = jnp.take(ta, ia, axis=1)               # (L, n2/d, n1)
            twb = jnp.take(tb, ib, axis=1)
            flat = (L, -1)
            a = ntt_mxu._vmul(spec, a.reshape(flat), twa.reshape(flat),
                              vb_a=p2m, vb_b=p2m)
            a = ntt_mxu._vmul(spec, a, twb.reshape(flat),
                              vb_a=p2m, vb_b=p2m).reshape(L, n2 // d, n1)
            # back to rows sharded
            a = jnp.swapaxes(a, 1, 2)                    # (L, n1, n2/d)
            a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2,
                                   tiled=True)
            # (L, n1/d, n2): step 3 NTT_n2 along j2 (already last axis)
            a = ntt_mxu.apply_ntt(p2, a, tabs2)          # canonical < p
            # natural-order output: one more all_to_all + local transpose
            a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
            a = jnp.swapaxes(a, 1, 2)
            return a.reshape(L, n // d)

        shard = jax.shard_map(
            local, mesh=mesh, in_specs=(P(None, axis),),
            out_specs=P(None, axis), check_vma=False)
        return shard

    t1, t2, wfull, wfull_inv, n_inv = _tables(spec, log_n, omega)
    wtab = wfull_inv if inverse else wfull

    def local(x, bitrev1, w1, bitrev2, w2, wpow):
        # x: (L, n/d) local contiguous chunk == (L, n1/d, n2) rows of A.
        me = jax.lax.axis_index(axis)
        a = x.reshape(L, n1 // d, n2)
        # rows -> columns sharded: (L, n1, n2/d)
        a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=True)
        # step 1: NTT_n1 along j1: move j1 last
        a = jnp.swapaxes(a, 1, 2)                    # (L, n2/d, n1)
        a = jnp.take(a, bitrev1, axis=-1)
        a, vb1 = ntt_ops._butterfly_stages(spec, a, w1, log_n1)
        # step 2: twiddle w^(j2_global * k1); j2_global = me*(n2/d) + local idx
        j2 = me * (n2 // d) + jnp.arange(n2 // d, dtype=jnp.uint32)[:, None]
        k1 = jnp.arange(n1, dtype=jnp.uint32)[None, :]
        tw_idx = (j2 * k1) % np.uint32(n)            # (n2/d, n1)
        tw = jnp.take(wpow, tw_idx.astype(jnp.int32), axis=1)  # (L, n2/d, n1)
        af = mont.mul(spec, mont.FE(a, 1 << 15, vb1),
                      mont.FE(tw, 1 << 15, 2 * spec.modulus))
        # back to rows sharded: currently (L, n2/d, n1) = B^T chunks
        a = jnp.swapaxes(af.v, 1, 2)                 # (L, n1, n2/d)
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=True)
        # (L, n1/d, n2): rows k1 local, full j2 extent
        # step 3: NTT_n2 along j2 (already last axis)
        a = jnp.take(a, bitrev2, axis=-1)
        a, vb2 = ntt_ops._butterfly_stages(
            spec, a, w2, log_n2,
            in_mult=-(-af.vb // spec.modulus))
        # output in natural order: X[k1 + n1 k2] = C[k1, k2] -> X viewed as
        # (n2, n1) is C^T; transpose via one more all_to_all.
        a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=True)
        # (L, n1, n2/d) -> local transpose -> (L, n2/d, n1) = X rows
        a = jnp.swapaxes(a, 1, 2)
        a = ntt_ops._finish(spec, a, vb2, inverse,
                            jnp.asarray(n_inv) if inverse else None)
        return a.reshape(L, n // d)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None), P(None), P(None), P(None), P(None)),
        out_specs=P(None, axis),
        check_vma=False,
    )

    def run(x):
        return shard(x, t1.bitrev, t1.w_pows if not inverse else t1.w_inv_pows,
                     t2.bitrev, t2.w_pows if not inverse else t2.w_inv_pows,
                     wtab)

    return run


@functools.lru_cache(maxsize=16)
def ntt_sharded_jitted(spec: FieldSpec, mesh: Mesh, axis: str, log_n: int,
                       omega: int | None = None, inverse: bool = False,
                       engine: str = "mxu"):
    return jax.jit(ntt_sharded_fn(spec, mesh, axis, log_n, omega, inverse,
                                  engine))
