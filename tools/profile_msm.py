"""Phase-level wall-clock profile of the MSM pipeline on the local device.

Times each stage of ops/msm.py separately (jitted, block_until_ready,
median of REPS) so optimization targets the real bottleneck:

  recode   signed-digit recode kernel (digits_pallas)
  sort     batched sort_key_val over all windows
  gather   the packed-coordinate stream gather (jnp.take)
  phase_a  the fused Pallas scan kernel alone (pre-gathered inputs)
  tables   full _bucket_tables (includes all of the above + assembly)
  wsum     weighted_window_sum over the bucket tables
  full     end-to-end window_sums

Usage: PANDA_PROF_LOG_N=20 python tools/profile_msm.py
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

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from panda_tpu.curves.config import CURVES
from panda_tpu.fields import codec
from panda_tpu.ops import msm as msm_ops
from panda_tpu.ops import reduce as red
from panda_tpu.reference import curve_ref

LOG_N = int(os.environ.get("PANDA_PROF_LOG_N", "20"))
CURVE = os.environ.get("PANDA_PROF_CURVE", "bn254")
REPS = int(os.environ.get("PANDA_PROF_REPS", "3"))


def timed(fn, *args):
    """Time a jitted stage.  On the axon platform block_until_ready does
    not actually wait, so completion is forced by fetching a tiny checksum
    computed from every output leaf inside the same jit."""
    csum = jax.jit(lambda *a: sum(
        x.sum(dtype=jnp.uint32) if x.dtype == jnp.uint32 else
        x.astype(jnp.int32).sum(dtype=jnp.int32).astype(jnp.uint32)
        for x in jax.tree.leaves(fn(*a))))
    np.asarray(csum(*args))                  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    out = jax.block_until_ready(fn(*args))
    return np.median(ts), out


def main():
    n = 1 << LOG_N
    curve = CURVES[CURVE]
    fp, fr = curve.fp, curve.fr
    rng = np.random.default_rng(1)
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(64):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    idx = rng.integers(64, size=n)
    px = jnp.asarray(codec.ints_to_limbs(
        fp, [fp.to_mont_int(table[i][0]) for i in idx]))
    py = jnp.asarray(codec.ints_to_limbs(
        fp, [fp.to_mont_int(table[i][1]) for i in idx]))
    sv = [int(x) for x in rng.integers(1 << 62, size=n)]
    scalars = jnp.asarray(codec.ints_to_limbs(
        fr, [fr.to_mont_int(v) for v in sv]))

    c = msm_ops.window_bits(LOG_N, bits=fr.bits)
    W_all = msm_ops.signed_window_count(fr.bits, c)
    # PANDA_PROF_WG profiles a window GROUP of this size (the real
    # pipeline's per-pass unit at large n, where staging all W windows at
    # once would blow HBM); full(ws) below always runs the real pipeline.
    W = int(os.environ.get("PANDA_PROF_WG", W_all))
    m = msm_ops.default_lanes(n, W)
    print(f"{CURVE} n=2^{LOG_N} c={c} W={W} (of {W_all}) lanes={m} "
          f"steps={n // m}", flush=True)

    # --- recode ----------------------------------------------------------
    rec = jax.jit(functools.partial(
        msm_ops.signed_digit_arrays, fr, c=c, scalars_in_mont=True))
    t, (mags, negs) = timed(rec, scalars)
    print(f"recode   {t * 1e3:9.2f} ms", flush=True)
    mags, negs = jax.block_until_ready((mags, negs))
    mags_all, negs_all = mags, negs      # full set for the end-to-end run
    if W < W_all:               # staged sections profile one window group
        mags, negs = mags[:W], negs[:W]

    # --- sort ------------------------------------------------------------
    def do_sort(digits, signs):
        idx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.uint32)[None], (W, n))
        idx = idx | (signs.astype(jnp.uint32) << np.uint32(31))
        return jax.lax.sort_key_val(digits.astype(jnp.uint32), idx,
                                    dimension=1)

    t, (keys, sidx) = timed(jax.jit(do_sort), mags, negs)
    print(f"sort     {t * 1e3:9.2f} ms", flush=True)

    steps = -(-n // m)
    T = (W * m) // 1024
    oi = sidx & np.uint32(0x7FFFFFFF)

    from panda_tpu.ops import phase_a_pallas

    def tile_k(a):
        return jnp.transpose(a.reshape(W, m, steps),
                             (2, 0, 1)).reshape(steps, T, 8, 128)

    # --- gather ----------------------------------------------------------
    pk = jax.block_until_ready(jax.jit(
        lambda a, b: phase_a_pallas.pack_coords_words(fp, a, b))(px, py))

    def do_gather(pk, oi):
        q = jnp.take(pk, tile_k(oi), axis=0)
        return phase_a_pallas.split_words(q)

    t, q5 = timed(jax.jit(do_gather), pk, oi)
    print(f"gather   {t * 1e3:9.2f} ms   ({q5.size * 4 / 1e9:.2f} GB out)", flush=True)

    # --- phase-A kernel --------------------------------------------------
    D = 1 << (c - 1)
    B = D + 1
    k5 = jax.block_until_ready(jax.jit(tile_k)(keys))
    s5 = jax.block_until_ready(jax.jit(tile_k)(sidx >> np.uint32(31)))

    pak = jax.jit(functools.partial(
        phase_a_pallas.phase_a_scan_tiles, curve, dead=int(B)))
    pa = lambda a, b, q: phase_a_pallas.phase_a_scan_tiles(curve, a, b, q, int(B))
    t, outs = timed(jax.jit(pa), k5, s5, q5)
    emit_gb = sum(o.size * 4 for o in outs) / 1e9
    print(f"phase_a  {t * 1e3:9.2f} ms   ({emit_gb:.2f} GB emitted)")

    # --- full bucket tables ---------------------------------------------
    bt = jax.jit(lambda a, b, d, s: tuple(msm_ops._bucket_tables(
        curve, a, b, d, c, m, signs=s)))
    t, buckets = timed(bt, px, py, mags, negs)
    print(f"tables   {t * 1e3:9.2f} ms")

    # --- weighted window sum --------------------------------------------
    from panda_tpu.curves.point import ProjPoint
    wsum = jax.jit(lambda b: tuple(red.weighted_window_sum(
        curve, ProjPoint(*b))))
    t, sums = timed(wsum, buckets)
    print(f"wsum     {t * 1e3:9.2f} ms")

    # --- end to end ------------------------------------------------------
    full = jax.jit(lambda a, b, d, s: tuple(
        msm_ops.window_sums(curve, a, b, d, c, signs=s)))
    t, _ = timed(full, px, py, mags_all, negs_all)
    print(f"full(ws) {t * 1e3:9.2f} ms", flush=True)
    tput = n / t
    print(f"window_sums throughput {tput / 1e6:.2f} M points/s", flush=True)


if __name__ == "__main__":
    main()
