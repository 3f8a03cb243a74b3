"""Large-size NTT capability/throughput artifact (single chip).

Closes the BASELINE north-star NTT size axis: runs the forward BN254 NTT
at LOG_N (default 24 — the reference's design envelope is 2^32
``fft.cu:9-11``, its *tested* envelope far smaller) with the same gates
bench.py uses:

  * spot-oracle: Y[k] == P(omega^k) by host big-int Horner at random k
    (4 spots, same count as bench.py), evaluated against the SAME engine
    that is timed (the MXU plan, pinned — no env-dependent divergence);
  * bit-exact INTT(NTT(x)) == x roundtrip (skip: PANDA_NTT_LARGE_ROUNDTRIP=0);
  * streaming throughput: CHAIN data-dependent transforms in ONE program.

Writes one JSON line to stdout; progress to stderr.

Usage: python tools/ntt_large.py [log_n]   (12 <= log_n <= 26)
"""

import json
import os
import pathlib
import sys
import time

if len(sys.argv) > 1:
    try:
        LOG_N = int(sys.argv[1])
    except ValueError:
        sys.exit(f"usage: {sys.argv[0]} [log_n]  (log_n an integer 12..26)")
    if not 12 <= LOG_N <= 26:
        sys.exit(f"log_n {LOG_N} out of supported range [12, 26]")
else:
    LOG_N = 24

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.perf_counter()


def log(msg):
    print(f"[ntt_large +{time.perf_counter()-T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import random

    from panda_tpu.curves.config import CURVES
    from panda_tpu.fields import codec
    from panda_tpu.fields.config import limbs_to_int
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
    log("inputs on device; compiling forward transform (MXU engine)")

    # The gated transform IS the timed transform: the MXU plan applied
    # directly (run_ntt's engine selection follows PANDA_NTT_IMPL /
    # PANDA_PALLAS env vars and could diverge from the streamed path).
    from panda_tpu.ops import backend as _backend
    from panda_tpu.ops import ntt as ntt_ops
    fused = ntt_ops._ntt_fused_flag(_backend.mode())
    plan = ntt_mxu.mxu_plan(fr, LOG_N, maxk=5 if fused else 7, fused=fused)
    tabs = ntt_mxu.plan_tables(plan)
    fwd = jax.jit(lambda a, t: ntt_mxu.apply_ntt(plan, a, t))

    t0 = time.perf_counter()
    y = fwd(x, tabs)
    y.block_until_ready()
    t_compile = time.perf_counter() - t0
    log(f"forward compile+first run {t_compile:.1f}s")

    # Spot-oracle gate (independent big-int evaluation of the definition).
    m = fr.modulus
    rinv = pow(fr.r, -1, m)
    w = fr.root_of_unity(LOG_N)
    y_np = np.asarray(y)
    n_spots = 4
    for k in [int(v) for v in rng.integers(n, size=n_spots)]:
        wk = pow(w, k, m)
        acc = 0
        # Horner over the index stream directly: materializing the 2^24
        # coefficient list would cost hundreds of MB of host RAM.
        for i in idx[::-1]:
            acc = (acc * wk + pool_vals[i]) % m
        got = limbs_to_int(y_np[:, k]) * rinv % m
        assert got == acc, f"NTT spot {k} != P(w^{k})"
    log(f"spot-oracle gate ok ({n_spots} spots)")
    del y_np

    # Streaming throughput: data-dependent chain inside one program.
    # (Before the roundtrip: the inverse plan's top twiddle table is
    # n-sized — at 2^24, forward + inverse tables resident together with
    # the streaming transients exhausted HBM.)
    CHAIN = 4

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

    if os.environ.get("PANDA_NTT_LARGE_ROUNDTRIP", "1") != "0":
        # Free the forward plan's device tables (the lru cache pins them)
        # before building the inverse plan.
        del plan, tabs, sfn
        ntt_mxu.mxu_plan.cache_clear()
        log("roundtrip gate: compiling inverse transform")
        iplan = ntt_mxu.mxu_plan(fr, LOG_N, inverse=True,
                                 maxk=5 if fused else 7, fused=fused)
        itabs = ntt_mxu.plan_tables(iplan)
        ifwd = jax.jit(lambda a, t: ntt_mxu.apply_ntt(iplan, a, t))
        xr = np.asarray(ifwd(y, itabs))
        assert np.array_equal(xr, np.asarray(x)), "INTT(NTT(x)) != x"
        roundtrip = f"2^{LOG_N} bit-exact ok"
        log("roundtrip gate ok (bit-exact)")
        del xr, iplan, itabs, ifwd
    else:
        roundtrip = "skipped"
    del y
    print(json.dumps({
        "metric": f"bn254_ntt_2^{LOG_N}_throughput",
        "value": round(tput, 1),
        "unit": "elements/s",
        "oracle": f"{n_spots} spots of 2^{LOG_N} == P(w^k) ok (MXU engine)",
        "roundtrip": roundtrip,
        "chain": CHAIN,
        "compile_s": round(t_compile, 1),
        "wall_s": round(time.perf_counter() - T0, 1),
    }))


if __name__ == "__main__":
    main()
