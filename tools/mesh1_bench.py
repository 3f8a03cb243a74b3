"""Mesh-of-1 shard_map overhead artifact (round-4 verdict item #3).

The distributed paths now run the PRODUCTION engines for their local work
(MXU NTT, fused-kernel MSM pipeline).  This tool proves it on the real
chip: a single-TPU mesh-of-1 shard_map run must be within ~10% of the
unsharded throughput at 2^20, and bit-exact against it.

Writes one JSON line to stdout (-> MESH1_r05.json); progress to stderr.

Usage: python tools/mesh1_bench.py [log_n=20]
"""

import json
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

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
REPS = 3
T0 = time.perf_counter()
out = {"log_n": LOG_N}


def log(msg):
    print(f"[mesh1 +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def timed(jfn, *args):
    csum = jax.jit(lambda *a: sum(
        x.astype(jnp.uint32).sum(dtype=jnp.uint32)
        for x in jax.tree.leaves(jfn(*a))))
    np.asarray(csum(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import random

    from jax.sharding import Mesh

    from panda_tpu.curves.config import BN254
    from panda_tpu.fields import codec
    from panda_tpu.ops import msm as msm_ops
    from panda_tpu.ops import ntt_mxu
    from panda_tpu.parallel import msm_sharded, ntt_sharded
    from panda_tpu.reference import curve_ref

    curve = BN254
    fp, fr = curve.fp, curve.fr
    n = 1 << LOG_N
    rng = np.random.default_rng(9)
    mesh = Mesh(np.array(jax.devices()[:1]), ("points",))

    # ---- inputs (pool points) -------------------------------------------
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
    log("inputs staged")

    # ---- MSM window sums: unsharded vs mesh-of-1 shard_map --------------
    c = msm_ops.window_bits(LOG_N)
    plain = msm_ops.window_sums_jitted(curve, c)
    t_plain = timed(plain, px, py, scalars)
    log(f"unsharded window_sums {t_plain*1e3:.1f} ms")
    sums_plain = [np.asarray(a) for a in plain(px, py, scalars)]

    spx, spy, ss = msm_sharded.shard_inputs(mesh, "points", px, py, scalars)
    shard = msm_sharded.msm_sharded_jitted(curve, mesh, "points", c)
    t_shard = timed(shard, spx, spy, ss)
    log(f"mesh-of-1 window_sums {t_shard*1e3:.1f} ms")
    sums_shard = [np.asarray(a) for a in shard(spx, spy, ss)]
    for a, b in zip(sums_plain, sums_shard):
        assert np.array_equal(a, b), "mesh-of-1 MSM != unsharded (bytes)"
    out["msm_unsharded_ms"] = round(t_plain * 1e3, 1)
    out["msm_mesh1_ms"] = round(t_shard * 1e3, 1)
    out["msm_overhead_pct"] = round((t_shard / t_plain - 1) * 100, 1)
    out["msm_bit_exact"] = True

    # ---- NTT: unsharded MXU engine vs mesh-of-1 four-step ---------------
    pool = 1 << 12
    pr = random.Random(3)
    vals = [pr.randrange(fr.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(fr, [fr.to_mont_int(v) for v in vals])
    x = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))

    from panda_tpu.ops import backend as _backend
    from panda_tpu.ops import ntt as _ntt_ops
    fused = _ntt_ops._ntt_fused_flag(_backend.mode())
    plan = ntt_mxu.mxu_plan(fr, LOG_N, maxk=5 if fused else 7, fused=fused)
    tabs = ntt_mxu.plan_tables(plan)
    # tables as ARGUMENTS: closures embed them as program constants
    ntt_plain_fn = jax.jit(lambda a, t: ntt_mxu.apply_ntt(plan, a, t))
    ntt_plain = lambda a: ntt_plain_fn(a, tabs)
    t_nplain = timed(ntt_plain_fn, x, tabs)
    log(f"unsharded MXU ntt {t_nplain*1e3:.1f} ms")
    y_plain = np.asarray(ntt_plain(x))

    ntt_fn = ntt_sharded.ntt_sharded_jitted(fr, mesh, "points", LOG_N)
    (xs,) = msm_sharded.shard_inputs(mesh, "points", x)
    t_nshard = timed(ntt_fn, xs)
    log(f"mesh-of-1 four-step ntt {t_nshard*1e3:.1f} ms")
    y_shard = np.asarray(ntt_fn(xs))
    assert np.array_equal(y_plain, y_shard), "mesh-of-1 NTT != unsharded"
    out["ntt_unsharded_ms"] = round(t_nplain * 1e3, 1)
    out["ntt_mesh1_ms"] = round(t_nshard * 1e3, 1)
    out["ntt_overhead_pct"] = round((t_nshard / t_nplain - 1) * 100, 1)
    out["ntt_bit_exact"] = True
    out["note"] = ("mesh-of-1 shard_map on one v5e; sharded paths run the "
                   "production engines (MXU NTT / fused-kernel MSM). The "
                   "four-step NTT pays one extra twiddle pass + transposes "
                   "vs the flat plan by construction.")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
