"""Headline benchmark: BN254 MSM + NTT throughput on the local device.

Prints exactly ONE JSON line (stdout):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
Progress/timing detail goes to stderr so a driver timeout still leaves a
diagnosis trail.

Budget discipline (round-3 verdict: BENCH_r03 rc=124 — the driver's
wall-clock budget expired before anything printed).  Cold-start cost in
this environment is dominated by remote XLA compiles (~3-20 min per
distinct jitted shape), so the restructure minimizes COMPILES, not work:

  * ONE MSM compile: the headline run itself.  Correctness gate = the
    FULL big-int oracle at headline size — possible in O(pool) host work
    because inputs are pool-structured (aggregate scalars by the <=4096
    distinct points, then oracle-MSM the pool).  This is strictly
    stronger than round-3's small-k slice + dual-window cross-check
    (which cost two extra full compiles) — it verifies the exact
    headline result against an independent big-int implementation.
  * ONE NTT compile: the forward headline transform.  Gate = direct
    evaluation of the transform definition Y[k] = P(omega^k) at random
    spots via host big-int Horner (O(n) mults per spot, seconds), plus
    bit-exact INTT roundtrip when budget remains (the roundtrip costs a
    second compile, so it is deadline-gated via PANDA_BENCH_BUDGET_S).

A failed gate is a FAILED BENCH (rc != 0), by design: an rc!=0 bench
means a broken build, never ship on top of one.

Timing note: on the axon platform ``block_until_ready`` does NOT wait
(tools/profile_msm.py); every timed section fetches a small host value
derived from the full output so the clock covers real completion.
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
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.perf_counter()
LOG_N = int(os.environ.get("PANDA_BENCH_LOG_N", "20"))
LOG_NTT = int(os.environ.get("PANDA_BENCH_NTT_LOG_N", "20"))
REPS = int(os.environ.get("PANDA_BENCH_REPS", "3"))
CHECK = os.environ.get("PANDA_BENCH_CHECK", "1") == "1"
# Soft deadline (seconds of total bench wall-clock): optional sections are
# skipped when the projected finish would cross it.  The required
# headline sections always run to completion.
BUDGET = float(os.environ.get("PANDA_BENCH_BUDGET_S", "1500"))
HIST = pathlib.Path(__file__).resolve().parent / "BENCH_HISTORY.json"

_SECS = {}


def _elapsed():
    return time.perf_counter() - T0


def _log(msg):
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


class _section:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        _log(f"{self.name}...")
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        _SECS[self.name] = round(dt, 2)
        _log(f"{self.name}: {dt:.1f}s")


def _build_inputs(curve, n, rng, seed):
    """Pool-structured random inputs: O(pool) host big-int work, O(n)
    numpy takes — 2^24-point benches build in seconds.  Returns device
    Montgomery limb arrays plus the plain-int views the oracle needs."""
    import jax.numpy as jnp

    from panda_tpu.fields import codec
    from panda_tpu.reference import curve_ref

    fp, fr = curve.fp, curve.fr
    POOL = min(n, 4096)
    table = []
    acc = None
    g = (curve.gen_x, curve.gen_y)
    for _ in range(POOL):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    idx = rng.integers(POOL, size=n)
    px_pool = codec.ints_to_limbs(fp, [fp.to_mont_int(x) for x, _ in table])
    py_pool = codec.ints_to_limbs(fp, [fp.to_mont_int(y) for _, y in table])
    px = jnp.asarray(np.take(px_pool, idx, axis=1))
    py = jnp.asarray(np.take(py_pool, idx, axis=1))
    # Scalar pool large enough that window digits stay ~uniform over the
    # bucket range (distinct digit values >> 2^(c-1)); FULL-RANGE scalars.
    import random as _random
    SPOOL = min(n, 1 << 16)
    _pr = _random.Random(seed)
    sv_pool = [_pr.randrange(fr.modulus) for _ in range(SPOOL)]
    sc_pool = codec.ints_to_limbs(fr, [fr.to_mont_int(v) for v in sv_pool])
    sidx = rng.integers(SPOOL, size=n)
    sv = [sv_pool[i] for i in sidx]
    scalars = jnp.asarray(np.take(sc_pool, sidx, axis=1))
    pts = [table[i] for i in idx]
    return px, py, scalars, pts, sv


def _msm_run_fn(curve, c):
    import jax.numpy as jnp

    from panda_tpu.ops import msm as msm_ops

    ws = msm_ops.window_sums_fn(curve, c)
    # One stacked output -> one device->host fetch; the ~bits sequential
    # doublings of the Horner tail are host work (microseconds in big-int,
    # pure latency on an accelerator), exactly like the reference's split
    # (msm_cuda.cuh:738-743).
    fn = jax.jit(lambda a, b, s: jnp.stack(ws(a, b, s)))

    def run(px, py, scalars):
        sums = np.asarray(fn(px, py, scalars))           # (3, W, L)
        return msm_ops.host_horner(curve, list(sums), c)

    return run


def bench_msm(curve, extras):
    from panda_tpu.ops import msm as msm_ops
    from panda_tpu.reference import curve_ref

    n = 1 << LOG_N
    rng = np.random.default_rng(20260816)
    with _section("msm inputs"):
        px, py, scalars, pts, sv = _build_inputs(curve, n, rng, 20260816)

    c = msm_ops.window_bits(LOG_N)
    run = _msm_run_fn(curve, c)
    with _section("msm compile+first run"):
        res = run(px, py, scalars)

    if CHECK:
        # FULL-oracle gate at headline size: aggregate the scalars by the
        # <=4096 distinct pooled points (MSM is linear in repeated
        # points), then run the independent big-int oracle on the pool.
        # One compile total, and the gate covers the exact timed result.
        with _section("msm full-oracle gate"):
            agg = {}
            for p, s in zip(pts, sv):
                agg[p] = (agg.get(p, 0) + s) % curve.fr.modulus
            exp = curve_ref.msm_oracle(curve, list(agg), list(agg.values()))
            assert res == exp, f"bench MSM result != big-int oracle (2^{LOG_N})"
        extras["msm_oracle"] = f"full @2^{LOG_N} ok (pool-aggregated)"

    with _section("msm timing"):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            run(px, py, scalars)
            best = min(best, time.perf_counter() - t0)
    return n / best                         # points per second


def bench_ntt(curve, extras):
    import jax.numpy as jnp

    from panda_tpu.fields import codec
    from panda_tpu.ops import ntt as ntt_ops

    fr = curve.fr
    n = 1 << LOG_NTT
    rng = np.random.default_rng(3)
    with _section("ntt inputs+tables"):
        import random as _random
        _pr = _random.Random(3)
        POOL = min(n, 1 << 14)
        pool_vals = [_pr.randrange(fr.modulus) for _ in range(POOL)]
        pool = codec.ints_to_limbs(fr, [fr.to_mont_int(v) for v in pool_vals])
        idx = rng.integers(POOL, size=n)
        x = jnp.asarray(np.take(pool, idx, axis=1))
        vals = [pool_vals[i] for i in idx]      # plain-int view for the gate
        tables = ntt_ops.make_tables(fr, LOG_NTT)

    fwd = lambda a: ntt_ops.run_ntt(fr, a, tables, inverse=False)
    # Axon's block_until_ready does not wait; fetching a tiny reduction of
    # the output is the only honest completion barrier.  The checksum is a
    # separate dispatch, so the timed graph is exactly the transform.
    csum = jax.jit(lambda a: a.sum(dtype=jnp.uint32))
    with _section("ntt compile+first run"):
        y = fwd(x)
        np.asarray(csum(y))

    if CHECK:
        # Direct-definition gate: Y[k] = sum_j x_j w^(jk) = P(w^k),
        # evaluated at random spots by host big-int Horner — O(n) mults
        # per spot, no extra compile, covers the exact headline output.
        with _section("ntt spot-oracle gate"):
            m = fr.modulus
            rinv = pow(fr.r, -1, m)
            w = tables.omega
            y_np = np.asarray(y)
            spots = [int(k) for k in rng.integers(n, size=4)]
            from panda_tpu.fields.config import limbs_to_int
            for k in spots:
                wk = pow(w, k, m)
                acc = 0
                for coeff in reversed(vals):
                    acc = (acc * wk + coeff) % m
                got = limbs_to_int(y_np[:, k]) * rinv % m
                assert got == acc, f"NTT spot {k} != P(w^{k})"
        extras["ntt_oracle"] = f"4 spots of 2^{LOG_NTT} == P(w^k) ok"

    # Single-call latency (includes the axon per-dispatch floor, ~27 ms
    # in this harness — see tools/profile_ntt3.py) ...
    with _section("ntt timing"):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(csum(fwd(x)))
            best = min(best, time.perf_counter() - t0)
        extras["ntt_single_call_ms"] = round(best * 1e3, 1)

    # ... and streaming throughput: CHAIN data-dependent transforms inside
    # ONE compiled program (each output feeds the next input, so XLA
    # cannot elide repeats).  This is the production-shaped number — a
    # prover transforms many polynomials per proof, and the tunnel's
    # per-dispatch floor is a dev-harness artifact, not chip time.
    if LOG_NTT >= 23:
        # Marginal HBM at 2^24: the 8-chain's transients plus x, y and
        # the n-sized forward twiddle table just tip over 16 GB.  Drop y
        # for the streaming section (the roundtrip gate recomputes it —
        # a cached sub-second call).
        del y
    with _section("ntt streaming timing"):
        from panda_tpu.ops import backend as _backend
        from panda_tpu.ops import ntt_mxu
        CHAIN = 8
        # Same engine the gated forward call used: run_ntt's production
        # plan selection (fused Pallas dft passes on kernel backends) —
        # the timed path and the oracle-gated path must not diverge.
        fused = ntt_ops._ntt_fused_flag(_backend.mode())
        plan = ntt_mxu.mxu_plan(fr, LOG_NTT, maxk=5 if fused else 7,
                                fused=fused)
        tabs = ntt_mxu.plan_tables(plan)

        def stream(a, t):
            def body(carry, _):
                return ntt_mxu.apply_ntt(plan, carry, t), None
            y, _ = jax.lax.scan(body, a, None, length=CHAIN)
            return y.sum(dtype=jnp.uint32)

        sfn = jax.jit(stream)
        np.asarray(sfn(x, tabs))            # compile + warm
        sbest = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(sfn(x, tabs))
            sbest = min(sbest, time.perf_counter() - t0)
        extras["ntt_stream_chain"] = CHAIN
        best = sbest / CHAIN                # per-transform, amortized

    # Optional (budget-gated): bit-exact INTT roundtrip at headline size.
    # Costs a second NTT compile, so project its cost from the measured
    # forward compile and skip cleanly if the deadline would be crossed.
    if CHECK:
        est = 1.3 * _SECS.get("ntt compile+first run", 300.0) + 30.0
        if _elapsed() + est <= BUDGET:
            with _section("ntt roundtrip gate"):
                if LOG_NTT >= 23:
                    y = fwd(x)              # recompute (compiled, cached)
                    # Free the forward plan's device tables first: the
                    # n-sized forward + inverse twiddle tables co-resident
                    # with the roundtrip transients exhaust HBM at 2^24
                    # (1.2 GB each; observed ResourceExhausted).
                    del plan, tabs, sfn
                    ntt_ops._mxu_jitted.cache_clear()
                    ntt_mxu.mxu_plan.cache_clear()
                back = np.asarray(ntt_ops.run_ntt(fr, y, tables, inverse=True))
                assert (back == np.asarray(x)).all(), \
                    "NTT/INTT roundtrip mismatch"
            extras["ntt_roundtrip"] = f"2^{LOG_NTT} bit-exact ok"
        else:
            _log(f"skipping INTT roundtrip (est {est:.0f}s would cross "
                 f"budget {BUDGET:.0f}s)")
            extras["ntt_roundtrip"] = "skipped (budget)"

    return n / best                         # elements per second


def main():
    from panda_tpu.curves.config import CURVES

    # PANDA_BENCH_CURVE selects the curve (default bn254; BASELINE
    # config 4 measures bls12_377).
    cname = os.environ.get("PANDA_BENCH_CURVE", "bn254")
    curve = CURVES[cname]
    _log(f"budget {BUDGET:.0f}s, curve {cname}, MSM 2^{LOG_N}, "
         f"NTT 2^{LOG_NTT}, checks {'on' if CHECK else 'OFF'}")
    extras = {}
    msm_ps = bench_msm(curve, extras)
    ntt_ps = bench_ntt(curve, extras)
    extras["ntt_metric"] = f"{cname}_ntt_2^{LOG_NTT}_throughput"
    extras["ntt_value"] = round(ntt_ps, 1)
    extras["ntt_unit"] = "elements/s"
    extras["secs"] = _SECS

    vs = 1.0
    if HIST.exists() and cname == "bn254":
        try:
            hist = json.loads(HIST.read_text())
            base = hist.get(f"msm_points_per_s_2^{LOG_N}") \
                or hist.get("msm_points_per_s")
            if base:
                vs = msm_ps / base
        except Exception:
            pass
    print(json.dumps({
        "metric": f"{cname}_msm_2^{LOG_N}_throughput",
        "value": round(msm_ps, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 4),
        **extras,
    }))
    _log(f"done in {_elapsed():.1f}s")


if __name__ == "__main__":
    sys.exit(main())
