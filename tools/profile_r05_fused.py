"""Component costs of the FUSED NTT engine at large size (v5e via axon).

The fused engine reaches 90.6M elem/s @2^20 but 44M @2^24 — this tool
locates the residual large-size cost.  All chains pass tables as
ARGUMENTS (a closure embeds them as constants and hangs the remote
compiler).  Components at the 2^24 maxk=5 plan shapes:

  fused dft pass (K=32) at full width
  vmul (fmul kernel) at full width
  swapaxes relayout at the level-0 shape
  canonical at full width
  full fused transform (for the sum check)

Usage: python tools/profile_r05_fused.py [log_n=24]
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
R = 4
T0 = time.perf_counter()
out = {"log_n": LOG_N}


def log(msg):
    print(f"[r05f +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def timed(fn, *args):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op):
    def f(x, *extra):
        def body(carry, i):
            return op(carry ^ i.astype(carry.dtype), *extra), ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32)
    return f


def main():
    import random

    from panda_tpu.fields import codec, mont
    from panda_tpu.fields.config import BN254_FR as spec
    from panda_tpu.ops import ntt_mxu, point_pallas
    from panda_tpu.ops.ntt_fused import dft_apply_fused

    n = 1 << LOG_N
    L = spec.n_limbs
    pr = random.Random(3)
    rng = np.random.default_rng(5)
    pool = 1 << 12
    vals = [pr.randrange(spec.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in vals])
    x = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    b = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    m15 = lambda z: z & np.uint32(0x7FFF)

    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda z: (z + 1).sum(dtype=jnp.uint32), tiny)
    out["floor_ms"] = round(floor * 1e3, 2)
    log(f"floor {floor*1e3:.1f} ms")

    plan = ntt_mxu.mxu_plan(spec, LOG_N, maxk=5, fused=True)
    tabs = ntt_mxu.plan_tables(plan)
    shapes = [(la, lb) for la, lb, _, _ in plan.levels] + [plan.leaf[0]]
    out["levels"] = str(shapes)
    log(f"levels {shapes}")

    # full fused transform
    t = timed(chain(lambda a, tt: ntt_mxu.apply_ntt(plan, m15(a), tt)),
              x, tabs)
    per = (t - floor) / R
    out["full_ms"] = round(per * 1e3, 2)
    out["full_Melem_s"] = round(n / per / 1e6, 1)
    log(f"full {per*1e3:.1f} ms = {n/per/1e6:.1f} M/s")

    # one fused dft pass at K=32 full width
    K = 32
    nb = n // K
    mat = jnp.asarray(ntt_mxu.dft_matrix_grouped(spec, 5, 5))

    def dft_op(a, mm):
        y = dft_apply_fused(spec, m15(a).reshape(L, K, nb), 5, mm)
        return y.reshape(L, -1)
    t = timed(chain(dft_op), x, mat)
    out["fused_dft_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"fused dft {(t-floor)/R*1e3:.1f} ms")

    # vmul at full width (b as an ARGUMENT — closure would embed 1.2 GB)
    p2 = 2 * spec.modulus
    t = timed(chain(lambda a, bb: point_pallas.fmul(spec, m15(a), bb,
                                                    vb_a=p2, vb_b=p2)), x, b)
    out["vmul_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"vmul {(t-floor)/R*1e3:.1f} ms")

    # swapaxes at the level-0 shape
    la0, lb0 = shapes[0]
    A0, B0 = 1 << la0, 1 << lb0

    def swap_op(a):
        y = m15(a).reshape(L, B0, A0)
        return jnp.swapaxes(y, 1, 2).reshape(L, -1)
    t = timed(chain(swap_op), x)
    out["swap_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"swap {(t-floor)/R*1e3:.1f} ms")

    # canonical at full width
    vb = plan.mid_vb

    def canon_op(a):
        return mont.canonical(spec, mont.FE(m15(a), 1 << 15, vb))
    t = timed(chain(canon_op), x)
    out["canonical_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"canonical {(t-floor)/R*1e3:.1f} ms")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
