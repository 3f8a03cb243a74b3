"""On-chip A/B of the NTT engine variants at one size (default 2^20).

Variants (all bit-identical by construction; asserted on-device):

  maxk7        production r04 engine, grouped matrices, XLA dft_apply2
  maxk7_legacy the r04 transpose-carrying dft_apply (for the delta)
  maxk5        grouped, XLA dft_apply2 at K=32 (more levels, smaller mats)
  maxk5_fused  ONE Pallas kernel per pass (ops/ntt_fused.py)
  maxk6_fused  fused at K=64 (11.9 MB matrix in VMEM)

Writes one JSON line; progress to stderr.

Usage: python tools/ab_ntt_fused.py [log_n=20]
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
R = 4
T0 = time.perf_counter()
out = {"log_n": LOG_N}


def log(msg):
    print(f"[ab_ntt +{time.perf_counter()-T0:7.1f}s] {msg}",
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
    # Tables ride as ARGUMENTS (closing over them embeds hundreds of MB
    # of plan constants in the program — the remote compiler rejects the
    # request at 2^22+).
    def f(x, tabs):
        def body(carry, i):
            return op(carry ^ i.astype(carry.dtype), tabs), ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32)
    return f


def main():
    import random

    from panda_tpu.fields import codec
    from panda_tpu.fields.config import BN254_FR as spec, limbs_to_int
    from panda_tpu.ops import ntt_mxu

    n = 1 << LOG_N
    pr = random.Random(3)
    rng = np.random.default_rng(5)
    pool = 1 << 12
    vals = [pr.randrange(spec.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in vals])
    idx = rng.integers(pool, size=n)
    x = jnp.asarray(np.take(lp, idx, axis=1))
    m15 = lambda z: z & np.uint32(0x7FFF)

    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda z: (z + 1).sum(dtype=jnp.uint32), tiny)
    out["floor_ms"] = round(floor * 1e3, 2)
    log(f"floor {floor*1e3:.1f} ms")

    variants = [
        ("maxk7", dict(maxk=7, grouped=True, fused=False)),
        ("maxk7_legacy", dict(maxk=7, grouped=False, fused=False)),
        ("maxk5", dict(maxk=5, grouped=True, fused=False)),
        ("maxk5_fused", dict(maxk=5, grouped=True, fused=True)),
        ("maxk6_fused", dict(maxk=6, grouped=True, fused=True)),
    ]
    if len(sys.argv) > 2:     # substring filter, e.g. "fused" / "only:maxk5_fused"
        keep = sys.argv[2]
        if keep.startswith("only:"):
            variants = [v for v in variants if v[0] == keep[5:]]
        else:
            variants = [v for v in variants
                        if keep in v[0] or v[0] == "maxk7"]
    ref = None
    for name, kw in variants:
        try:
            plan = ntt_mxu.mxu_plan(spec, LOG_N, **kw)
            tabs = ntt_mxu.plan_tables(plan)
            y = np.asarray(jax.jit(
                lambda a, t, p=plan: ntt_mxu.apply_ntt(p, a, t))(x, tabs))
            if ref is None:
                ref = y
                # spot-oracle on the reference output
                m = spec.modulus
                rinv = pow(spec.r, -1, m)
                w = spec.root_of_unity(LOG_N)
                for k in [int(v) for v in rng.integers(n, size=2)]:
                    wk = pow(w, k, m)
                    acc = 0
                    for i in idx[::-1]:
                        acc = (acc * wk + vals[i]) % m
                    got = limbs_to_int(y[:, k]) * rinv % m
                    assert got == acc, f"spot {k} mismatch"
                log("spot oracle ok (2 spots)")
            else:
                assert np.array_equal(y, ref), f"{name} output differs"
            t = timed(chain(lambda a, tt, p=plan:
                            ntt_mxu.apply_ntt(p, m15(a), tt)), x, tabs)
            per = (t - floor) / R
            out[name + "_ms"] = round(per * 1e3, 2)
            out[name + "_Melem_s"] = round(n / per / 1e6, 1)
            log(f"{name}: {per*1e3:.1f} ms = {n/per/1e6:.1f} M/s")
        except Exception as e:  # noqa: BLE001 - record and continue
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"{name}: FAILED {type(e).__name__}: {e}")
    out["oracle"] = "2 spots + cross-variant bit-identity"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
