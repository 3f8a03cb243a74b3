"""Round-5 NTT large-size breakdown (v5e via axon).

NOTE (post-mortem): the original full-chain timing CLOSED OVER the plan
tables, embedding >1 GB of constants in the program — the remote compile
ground for 20+ min and never returned.  Kept for the component probes;
pass tables as arguments if reviving the full-chain section.

Why: VERDICT r04 weak #2 — NTT throughput drops 52.4M -> 34.5M elem/s
from 2^20 to 2^24 ("large-footprint HBM regime").  Before redesigning,
measure WHERE the 2^24 wall time goes, per component, with the
dispatch-floor-corrected in-jit repeat methodology of profile_ntt3.py:

  * full apply_ntt at 2^24 (and 2^20 for contrast);
  * dft_apply at each level shape the 2^24 plan uses
    (K=128/nb=2^17 x3 levels, K=8/nb=2^21 leaf);
  * vmul (fused fmul) at 2^24 full width;
  * swapaxes relayout at the level-0 shape;
  * canonical at 2^24.

Usage: python tools/profile_r05_ntt.py [log_n=24]
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

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
REPS = 3
R = 4            # in-jit repeats

T0 = time.perf_counter()
out = {}


def log(msg):
    print(f"[r05ntt +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def timed(fn, *args):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))                   # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op):
    def f(x):
        def body(carry, i):
            return op(carry ^ i.astype(carry.dtype)), ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32) if y.dtype == jnp.uint32 \
            else y.astype(jnp.int32).sum(dtype=jnp.int32)
    return f


def main():
    from panda_tpu.fields import codec, mont
    from panda_tpu.fields.config import BN254_FR as spec
    from panda_tpu.ops import ntt_mxu, point_pallas

    rng = np.random.default_rng(5)
    n = 1 << LOG_N
    L = spec.n_limbs

    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda a: (a + 1).sum(dtype=jnp.uint32), tiny)
    out["floor_ms"] = round(floor * 1e3, 2)
    log(f"dispatch floor {floor*1e3:.1f} ms")

    import random as _r
    pr = _r.Random(3)
    pool = 1 << 12
    vals = [pr.randrange(spec.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in vals])
    x = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    log("inputs staged")

    plan = ntt_mxu.mxu_plan(spec, LOG_N)
    tabs = ntt_mxu.plan_tables(plan)
    shapes = [(la, lb) for la, lb, _, _ in plan.levels] + [plan.leaf[0]]
    log(f"plan levels {shapes}")

    def m15(a):
        return a & np.uint32(0x7FFF)

    # full transform
    t = timed(chain(lambda a: ntt_mxu.apply_ntt(plan, m15(a), tabs)), x)
    per = (t - floor) / R
    out["full_ms"] = round(per * 1e3, 2)
    out["full_Melem_s"] = round(n / per / 1e6, 1)
    log(f"full {per*1e3:.1f} ms = {n/per/1e6:.1f} M/s")

    # per-level dft_apply shapes
    out["dft"] = {}
    for la, lb, _, mat in plan.levels:
        K = 1 << la
        nb = n // K
        def dft_op(a, _K=K, _la=la, _mat=mat):
            y = ntt_mxu.dft_apply(spec, m15(a).reshape(L, _K, nb), _la, _mat)
            return y.reshape(L, -1)
        t = timed(chain(dft_op), x)
        per = (t - floor) / R
        out["dft"][f"K{K}_nb{nb}"] = round(per * 1e3, 2)
        log(f"dft_apply K={K} nb={nb}: {per*1e3:.1f} ms")
        break    # level shapes repeat (K=128); leaf measured below

    lk, lmat = plan.leaf
    K = 1 << lk
    nb = n // K
    def leaf_op(a):
        y = ntt_mxu.dft_apply(spec, m15(a).reshape(L, K, nb), lk, lmat)
        return y.reshape(L, -1)
    t = timed(chain(leaf_op), x)
    per = (t - floor) / R
    out["dft"][f"K{K}_nb{nb}_leaf"] = round(per * 1e3, 2)
    log(f"leaf dft_apply K={K} nb={nb}: {per*1e3:.1f} ms")

    # vmul full width
    b = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    p2 = 2 * spec.modulus
    def vmul_op(a):
        return point_pallas.fmul(spec, m15(a), b, vb_a=p2, vb_b=p2)
    t = timed(chain(vmul_op), x)
    per = (t - floor) / R
    out["vmul_ms"] = round(per * 1e3, 2)
    log(f"vmul: {per*1e3:.1f} ms")

    # swapaxes at level-0 shape
    la0, lb0 = shapes[0] if isinstance(shapes[0], tuple) else (shapes[0], 0)
    A0, B0 = 1 << la0, n >> la0
    def swap_op(a):
        y = m15(a).reshape(L, B0, A0)
        return jnp.swapaxes(y, 1, 2).reshape(L, -1)
    t = timed(chain(swap_op), x)
    per = (t - floor) / R
    out["swap_ms"] = round(per * 1e3, 2)
    log(f"swapaxes(B={B0},A={A0}): {per*1e3:.1f} ms")

    # canonical at full width
    vb = plan.mid_vb if plan.levels else plan.leaf_vb
    def canon_op(a):
        return mont.canonical(spec, mont.FE(m15(a), 1 << 15, vb))
    t = timed(chain(canon_op), x)
    per = (t - floor) / R
    out["canonical_ms"] = round(per * 1e3, 2)
    log(f"canonical: {per*1e3:.1f} ms")

    out["log_n"] = LOG_N
    print(json.dumps(out))


if __name__ == "__main__":
    main()
