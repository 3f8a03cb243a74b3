"""Headline benchmark: BN254 Pippenger MSM throughput on the local device.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference (JasonHopeSpace/panda) publishes no numbers (BASELINE.md), so
``vs_baseline`` is the ratio against the recorded first-round figure in
``BENCH_HISTORY.json`` when present, else 1.0.
"""

import json
import os
import pathlib
import sys
import time

import jax
import numpy as np

# Set directly on the config: a sitecustomize may have imported jax before
# this script runs, in which case env vars are read too late.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

LOG_N = int(os.environ.get("PANDA_BENCH_LOG_N", "20"))
REPS = int(os.environ.get("PANDA_BENCH_REPS", "3"))
HIST = pathlib.Path(__file__).resolve().parent / "BENCH_HISTORY.json"


def main():
    import jax
    import jax.numpy as jnp

    from panda_tpu.curves.config import BN254
    from panda_tpu.fields import codec
    from panda_tpu.ops import msm as msm_ops

    n = 1 << LOG_N
    fp, fr = BN254.fp, BN254.fr
    rng = np.random.default_rng(20260816)

    # Generate a pool of distinct small multiples of G on host (cheap) and
    # a pool of full-range Montgomery scalars, then draw n columns from
    # each with numpy takes — O(pool) Python big-int work instead of O(n),
    # so 2^24-point benches build inputs in seconds.  All device inputs
    # are Montgomery limb arrays.
    from panda_tpu.reference import curve_ref
    POOL = min(n, 4096)
    table = []
    acc = None
    g = (BN254.gen_x, BN254.gen_y)
    for _ in range(POOL):
        acc = curve_ref.ec_add(BN254, acc, g)
        table.append(acc)
    idx = rng.integers(POOL, size=n)
    px_pool = codec.ints_to_limbs(fp, [fp.to_mont_int(x) for x, _ in table])
    py_pool = codec.ints_to_limbs(fp, [fp.to_mont_int(y) for _, y in table])
    px = jnp.asarray(np.take(px_pool, idx, axis=1))
    py = jnp.asarray(np.take(py_pool, idx, axis=1))
    # Scalar pool large enough that window digits stay ~uniform over the
    # bucket range (distinct digit values >> 2^(c-1)).  FULL-RANGE scalars
    # (the round-1 bench drew < 2^62, leaving most windows' digits zero —
    # structurally easier sorts than a real prover workload).
    import random as _random
    SPOOL = min(n, 1 << 16)
    _pr = _random.Random(20260816)
    sv_pool = [_pr.randrange(fr.modulus) for _ in range(SPOOL)]
    sc_pool = codec.ints_to_limbs(fr, [fr.to_mont_int(v) for v in sv_pool])
    sidx = rng.integers(SPOOL, size=n)
    sv = [sv_pool[i] for i in sidx]
    scalars = jnp.asarray(np.take(sc_pool, sidx, axis=1))

    c = msm_ops.window_bits(LOG_N)
    ws = msm_ops.window_sums_fn(BN254, c)
    # One stacked output -> one device->host fetch; the ~bits sequential
    # doublings of the Horner tail are host work (microseconds in big-int,
    # pure latency on an accelerator), exactly like the reference's split
    # (msm_cuda.cuh:738-743).
    fn = jax.jit(lambda a, b, s: jnp.stack(ws(a, b, s)))

    def run():
        sums = np.asarray(fn(px, py, scalars))           # (3, W, L)
        return msm_ops.host_horner(BN254, list(sums), c)

    res = run()                            # compile + warm-up

    # Guard: the timed artifact must be the correct MSM result.  Up to
    # 2^16 the Python big-int oracle is affordable; above that, require
    # agreement with an independently parameterized run (different window
    # width -> entirely different digit/bucket decomposition).
    if os.environ.get("PANDA_BENCH_CHECK", "1") == "1":
        if LOG_N <= 16:
            exp = curve_ref.msm_oracle(BN254, [table[i] for i in idx], sv)
        else:
            c2 = c - 1 if c > 4 else c + 1
            ws2 = msm_ops.window_sums_fn(BN254, c2)
            fn2 = jax.jit(lambda a, b, s: jnp.stack(ws2(a, b, s)))
            sums2 = np.asarray(fn2(px, py, scalars))
            exp = msm_ops.host_horner(BN254, list(sums2), c2)
        assert res == exp, "bench result != oracle"

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    value = n / best                        # points per second
    vs = 1.0
    if HIST.exists():
        try:
            base = json.loads(HIST.read_text()).get("msm_points_per_s")
            if base:
                vs = value / base
        except Exception:
            pass
    print(json.dumps({
        "metric": f"bn254_msm_2^{LOG_N}_throughput",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
