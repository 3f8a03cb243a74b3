"""Large-size NTT capability/throughput artifact (single chip).

Closes the BASELINE north-star NTT size axis: runs the forward BN254 NTT
at LOG_N (default 24 — the reference's design envelope is 2^32
``fft.cu:9-11``, its *tested* envelope far smaller) with the same gates
bench.py uses:

  * spot-oracle: Y[k] == P(omega^k) by host big-int Horner at random k;
  * streaming throughput: CHAIN data-dependent transforms in ONE program.

Writes one JSON line to stdout; progress to stderr.

Usage: python tools/ntt_large.py [log_n]
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
T0 = time.perf_counter()


def log(msg):
    print(f"[ntt_large +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import random

    from panda_tpu.curves.config import CURVES
    from panda_tpu.fields import codec
    from panda_tpu.fields.config import limbs_to_int
    from panda_tpu.ops import ntt as ntt_ops
    from panda_tpu.ops import ntt_mxu

    fr = CURVES["bn254"].fr
    n = 1 << LOG_N
    rng = np.random.default_rng(7)
    log(f"building pool inputs (2^{LOG_N})")
    pr = random.Random(7)
    POOL = 1 << 14
    pool_vals = [pr.randrange(fr.modulus) for _ in range(POOL)]
    pool = codec.ints_to_limbs(fr, [fr.to_mont_int(v) for v in pool_vals])
    idx = rng.integers(POOL, size=n)
    x = jnp.asarray(np.take(pool, idx, axis=1))
    tables = ntt_ops.make_tables(fr, LOG_N)
    log("inputs on device; compiling forward transform")

    csum = jax.jit(lambda a: a.sum(dtype=jnp.uint32))
    t0 = time.perf_counter()
    y = ntt_ops.run_ntt(fr, x, tables, inverse=False)
    np.asarray(csum(y))
    t_compile = time.perf_counter() - t0
    log(f"forward compile+first run {t_compile:.1f}s")

    # Spot-oracle gate (independent big-int evaluation of the definition).
    m = fr.modulus
    rinv = pow(fr.r, -1, m)
    w = tables.omega
    y_np = np.asarray(y)
    vals = [pool_vals[i] for i in idx]
    for k in [int(v) for v in rng.integers(n, size=2)]:
        wk = pow(w, k, m)
        acc = 0
        for coeff in reversed(vals):
            acc = (acc * wk + coeff) % m
        got = limbs_to_int(y_np[:, k]) * rinv % m
        assert got == acc, f"NTT spot {k} != P(w^{k})"
    log("spot-oracle gate ok (2 spots)")
    del y, y_np

    # Streaming throughput: data-dependent chain inside one program.
    CHAIN = 4
    plan = ntt_mxu.mxu_plan(fr, LOG_N)
    tabs = ntt_mxu.plan_tables(plan)

    def stream(a, t):
        def body(carry, _):
            return ntt_mxu.apply_ntt(plan, carry, t), None
        out, _ = jax.lax.scan(body, a, None, length=CHAIN)
        return out.sum(dtype=jnp.uint32)

    sfn = jax.jit(stream)
    np.asarray(sfn(x, tabs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sfn(x, tabs))
        best = min(best, time.perf_counter() - t0)
    tput = n / (best / CHAIN)
    log(f"streaming {best:.3f}s / {CHAIN} transforms")
    print(json.dumps({
        "metric": f"bn254_ntt_2^{LOG_N}_throughput",
        "value": round(tput, 1),
        "unit": "elements/s",
        "oracle": f"2 spots of 2^{LOG_N} == P(w^k) ok",
        "chain": CHAIN,
        "compile_s": round(t_compile, 1),
        "wall_s": round(time.perf_counter() - T0, 1),
    }))


if __name__ == "__main__":
    main()
