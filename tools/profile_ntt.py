"""Stage-level wall-clock profile of the MXU NTT engine on the local device.

Times each component of ops/ntt_mxu.py separately (jitted, completion
forced by fetching a tiny checksum — axon's block_until_ready does not
wait) so optimization targets the real bottleneck:

  full      end-to-end mxu transform (the engine run_ntt dispatches to)
  digits    limb -> 5-bit digit-plane build at the level-0 shape
  einsum    the int8 MXU matmul alone at the level-0 shape
  regroup   int32 digit accumulators -> folded normalized limbs
  vmul      the four-step inter-level twiddle multiply (VPU fmul kernel)
  jnp       the stagewise jnp engine at the same size, for comparison

It also prints a ROOFLINE frame: total int8 MACs of the matmul passes at
MXU peak, plus minimum HBM traffic at peak bandwidth (BENCH_HISTORY's MSM
framing, applied to NTT per the round-3 verdict).

Usage: PANDA_PROF_NTT_LOG_N=20 python tools/profile_ntt.py
"""

import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from panda_tpu.fields import codec
from panda_tpu.fields.config import BN254_FR
from panda_tpu.ops import ntt as ntt_ops
from panda_tpu.ops import ntt_mxu

LOG_N = int(os.environ.get("PANDA_PROF_NTT_LOG_N", "20"))
REPS = int(os.environ.get("PANDA_PROF_NTT_REPS", "3"))

# v5e single-chip peaks (public spec): 394 TOPS int8, 819 GB/s HBM.
MXU_INT8 = 394e12
HBM_BPS = 819e9


def timed(fn, *args):
    csum = jax.jit(lambda *a: sum(
        x.astype(jnp.int32).sum(dtype=jnp.int32)
        for x in jax.tree.leaves(fn(*a))))
    np.asarray(csum(*args))                  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    out = fn(*args)
    return float(np.median(ts)), jax.tree.map(lambda a: a, out)


def main():
    spec = BN254_FR
    n = 1 << LOG_N
    L = spec.n_limbs
    D = ntt_mxu.DIG_PER_LIMB * L
    rng = np.random.default_rng(7)

    import random as _r
    pr = _r.Random(7)
    POOL = min(n, 1 << 14)
    pool_vals = [pr.randrange(spec.modulus) for _ in range(POOL)]
    pool = codec.ints_to_limbs(spec,
                               [spec.to_mont_int(v) for v in pool_vals])
    x = jnp.asarray(np.take(pool, rng.integers(POOL, size=n), axis=1))

    plan = ntt_mxu.mxu_plan(spec, LOG_N)
    tables = ntt_mxu.plan_tables(plan)
    print(f"n=2^{LOG_N} L={L} D={D} levels="
          f"{[(la, lb) for la, lb, _, _ in plan.levels]} "
          f"leaf=2^{plan.leaf[0]}", flush=True)

    # --- roofline frame ---------------------------------------------------
    macs = 0
    log = LOG_N
    for la, lb, _, _ in plan.levels:
        macs += n * (1 << la) * D * D          # outer pass at this level
        log = lb
    macs += n * (1 << log) * D * D             # leaf pass
    bytes_min = 0
    passes = len(plan.levels) + 1
    per_elem = L * 4
    # per pass: read + write the limb array (digit planes/accumulators are
    # intermediates XLA may or may not materialize; this is the floor)
    bytes_min = passes * 2 * n * per_elem
    print(f"roofline: {macs / 1e9:.0f} GMACs -> {macs / MXU_INT8 * 1e3:.2f} ms"
          f" MXU; >= {bytes_min / 1e9:.2f} GB -> "
          f"{bytes_min / HBM_BPS * 1e3:.2f} ms HBM", flush=True)

    # --- full transform ---------------------------------------------------
    jfull = jax.jit(lambda a, t: ntt_mxu.apply_ntt(plan, a, t))
    t, y = timed(jfull, x, tables)
    print(f"full     {t * 1e3:9.2f} ms   ({n / t / 1e6:.1f} M elem/s)",
          flush=True)

    # --- level-0 outer-pass components ------------------------------------
    if plan.levels:
        la, lb, t1t, mat = plan.levels[0]
        K = 1 << la
        nb = n // K
        xb = jnp.moveaxis(x.reshape(L, 1, n), 1, 2)     # (L, n, 1)
        z = jax.block_until_ready(
            jax.jit(lambda a: a.reshape(L, K, nb))(x))

        def digits_only(a):
            d = jnp.stack([a & ntt_mxu.DIG_MAX,
                           (a >> ntt_mxu.DIG_BITS) & ntt_mxu.DIG_MAX,
                           (a >> (2 * ntt_mxu.DIG_BITS)) & ntt_mxu.DIG_MAX],
                          axis=-1)
            return d.transpose(2, 1, 0, 3).reshape(nb, K * D).astype(jnp.int8)

        t, d8 = timed(jax.jit(digits_only), z)
        print(f"digits   {t * 1e3:9.2f} ms", flush=True)
        d8 = jax.block_until_ready(d8)
        m8 = jax.block_until_ready(mat)

        t, acc = timed(jax.jit(lambda a, m: jnp.einsum(
            "bi,ij->bj", a, m, preferred_element_type=jnp.int32)), d8, m8)
        pass_macs = nb * (K * D) ** 2
        print(f"einsum   {t * 1e3:9.2f} ms   "
              f"({pass_macs / t / 1e12:.1f} TMAC/s of {MXU_INT8 / 1e12:.0f})",
              flush=True)
        acc = jax.block_until_ready(acc)

        t, _ = timed(jax.jit(functools.partial(
            ntt_mxu.dft_apply, spec, log_k=la, mat=m8)), z)
        print(f"dftapply {t * 1e3:9.2f} ms   (digits+einsum+regroup)",
              flush=True)

        # vmul at the level-0 twiddle shape
        B = 1 << lb
        pre = jnp.broadcast_to(t1t[..., None], (L, K, B, 1)).reshape(L, -1)
        yv = jax.block_until_ready(
            jax.jit(lambda a: a.reshape(L, -1))(x))
        t, _ = timed(jax.jit(lambda a, b: ntt_mxu._vmul(
            spec, a, b, vb_a=plan.mid_vb, vb_b=2 * spec.modulus)), yv, pre)
        print(f"vmul     {t * 1e3:9.2f} ms", flush=True)

    # --- stagewise jnp engine comparison ----------------------------------
    tabs = ntt_ops.make_tables(spec, LOG_N)
    jfn = ntt_ops.ntt_jitted(spec, LOG_N, False, "off")
    t, _ = timed(lambda a: jfn(a, tabs.bitrev, tabs.w_pows,
                               jnp.asarray(tabs.n_inv)), x)
    print(f"jnp      {t * 1e3:9.2f} ms   ({n / t / 1e6:.1f} M elem/s)",
          flush=True)


if __name__ == "__main__":
    main()
