"""A/B: MXU-assisted Montgomery reduction vs the production paths.

VERDICT r04 #1 asks for variable Montgomery multiplication on the MXU —
"prototype on the fmul kernel path first, A/B on chip, keep bit-identity
gates on... or a committed profile proving the MXU form loses and why".

Contestants, timed with the dispatch-floor-corrected in-jit chain at
N = 2^20 (BN254 base field, L = 18):

  fmul_pallas   production fused kernel (interleaved reduction, VPU)
  fmul_mxu      ops/mont_mxu.py — reduction as two int8 digit matmuls
  mont_mul_jnp  the tensorized XLA fallback (interleaved, VPU)

Writes one JSON line to stdout; progress to stderr.
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

REPS = 3
R = 8
T0 = time.perf_counter()
out = {}


def log(msg):
    print(f"[ab_mxu +{time.perf_counter()-T0:6.1f}s] {msg}",
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
    def f(x):
        def body(carry, i):
            return op(carry ^ i.astype(carry.dtype)), ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32)
    return f


def main():
    import random

    from panda_tpu.fields import codec, mont
    from panda_tpu.fields.config import BN254_FP as spec
    from panda_tpu.ops import mont_mxu, point_pallas

    n = 1 << 20
    pr = random.Random(5)
    pool = 1 << 12
    rng = np.random.default_rng(2)
    vals = [pr.randrange(spec.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in vals])
    a = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    b = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))
    p2 = 2 * spec.modulus
    m15 = lambda x: x & np.uint32(0x7FFF)

    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda z: (z + 1).sum(dtype=jnp.uint32), tiny)
    out["floor_ms"] = round(floor * 1e3, 2)
    log(f"floor {floor*1e3:.1f} ms")

    # correctness gate on-device first: bit-identity at a slice
    g1 = np.asarray(jax.jit(lambda x, y: mont_mxu.fmul_mxu(
        spec, x[:, :8192], y[:, :8192]))(a, b))
    g2 = np.asarray(jax.jit(lambda x, y: point_pallas.fmul(
        spec, x[:, :8192], y[:, :8192], vb_a=p2, vb_b=p2))(a, b))
    assert np.array_equal(g1, g2), "fmul_mxu != fmul on chip"
    out["bit_identity"] = "fmul_mxu == fmul_pallas on 8192 lanes"
    log("bit-identity gate ok")

    t = timed(chain(lambda x: point_pallas.fmul(spec, m15(x), b,
                                                vb_a=p2, vb_b=p2)), a)
    out["fmul_pallas_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"fmul_pallas {(t-floor)/R*1e3:.2f} ms")

    t = timed(chain(lambda x: mont_mxu.fmul_mxu(spec, m15(x), b)), a)
    out["fmul_mxu_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"fmul_mxu {(t-floor)/R*1e3:.2f} ms")

    t = timed(chain(lambda x: mont.mont_mul(spec, m15(x), b, mult=2)), a)
    out["mont_mul_jnp_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"mont_mul_jnp {(t-floor)/R*1e3:.2f} ms")

    out["n"] = n
    out["note"] = ("reduction-on-MXU variable Montgomery multiply vs the "
                   "interleaved VPU forms; static analysis in "
                   "ops/mont_mxu.py (m*p needs 6L digit planes, so the "
                   "glue alone matches the interleaved cost)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
