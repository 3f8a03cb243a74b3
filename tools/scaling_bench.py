"""Scaling-efficiency harness: MSM points/s and NTT elements/s vs mesh size.

The BASELINE north star asks for >=80% linear scaling from 1 chip to 2
hosts (BASELINE.md).  Real multi-chip hardware is not attached in this
environment, so by default this runs on the virtual CPU mesh (correct
collectives, meaningless absolute times, still validates that the sharded
program compiles/executes at every mesh size and reports the efficiency
calculation end-to-end).  On a real pod slice run with
``PANDA_SCALE_PLATFORM=tpu`` (and ``panda_tpu.parallel.cluster.initialize``
for multi-host) to get true numbers.

Usage:
    python tools/scaling_bench.py                 # CPU mesh 1,2,4,8
    PANDA_SCALE_LOG_N=18 PANDA_SCALE_PLATFORM=tpu python tools/scaling_bench.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_PLATFORM = os.environ.get("PANDA_SCALE_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", _PLATFORM)
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_compile_cache" if _PLATFORM == "cpu"
                  else "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
from jax.sharding import Mesh

LOG_N = int(os.environ.get("PANDA_SCALE_LOG_N", "12"))
REPS = int(os.environ.get("PANDA_SCALE_REPS", "3"))


def msm_points_per_s(curve, mesh, n):
    import jax.numpy as jnp

    from panda_tpu.fields import codec
    from panda_tpu.ops import msm as msm_ops
    from panda_tpu.parallel import msm_sharded
    from panda_tpu.reference import curve_ref

    fp, fr = curve.fp, curve.fr
    rng = np.random.default_rng(5)
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(min(n, 256)):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    idx = rng.integers(len(table), size=n)
    px = jnp.asarray(np.take(codec.ints_to_limbs(
        fp, [fp.to_mont_int(x) for x, _ in table]), idx, axis=1))
    py = jnp.asarray(np.take(codec.ints_to_limbs(
        fp, [fp.to_mont_int(y) for _, y in table]), idx, axis=1))
    import random as _r
    pr = _r.Random(5)
    sv = [pr.randrange(fr.modulus) for _ in range(min(n, 4096))]
    sc = jnp.asarray(np.take(codec.ints_to_limbs(
        fr, [fr.to_mont_int(v) for v in sv]),
        rng.integers(len(sv), size=n), axis=1))

    c = msm_ops.window_bits(max(n - 1, 1).bit_length())
    spx, spy, ssc = msm_sharded.shard_inputs(mesh, "d", px, py, sc)
    fn = msm_sharded.msm_sharded_jitted(curve, mesh, "d", c)
    jax.block_until_ready(fn(spx, spy, ssc))        # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(spx, spy, ssc))
        best = min(best, time.perf_counter() - t0)
    return n / best


def ntt_elements_per_s(curve, mesh, n, log_n):
    import jax.numpy as jnp

    from panda_tpu.fields import codec
    from panda_tpu.parallel import msm_sharded, ntt_sharded

    fr = curve.fr
    import random as _r
    pr = _r.Random(9)
    pool = min(n, 4096)
    vals = [pr.randrange(fr.modulus) for _ in range(pool)]
    x = jnp.asarray(np.take(codec.ints_to_limbs(
        fr, [fr.to_mont_int(v) for v in vals]),
        np.random.default_rng(9).integers(pool, size=n), axis=1))
    (xs,) = msm_sharded.shard_inputs(mesh, "d", x)
    fn = ntt_sharded.ntt_sharded_jitted(fr, mesh, "d", log_n)
    jax.block_until_ready(fn(xs))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(xs))
        best = min(best, time.perf_counter() - t0)
    return n / best


def main():
    from panda_tpu.curves.config import BN254

    devs = jax.devices()
    # PANDA_SCALE_SIZES: comma list of mesh sizes for THIS process.  On
    # the virtual CPU mesh the accumulated XLA:CPU JIT state from smaller
    # meshes makes the 8-device compile die with an internal LLVM
    # allocation failure (observed twice, r04) — running each size in a
    # fresh process avoids it; rows merge into the --out file.
    env_sizes = os.environ.get("PANDA_SCALE_SIZES")
    wanted = ([int(x) for x in env_sizes.split(",")] if env_sizes
              else [1, 2, 4, 8])
    sizes = [s for s in wanted if s <= len(devs)]
    n = 1 << LOG_N
    path = pathlib.Path(
        sys.argv[sys.argv.index("--out") + 1]
        if "--out" in sys.argv else "SCALING.json")
    out = {"platform": jax.default_backend(), "log_n": LOG_N, "rows": []}
    if path.exists():
        try:
            prev = json.loads(path.read_text())
            if prev.get("log_n") == LOG_N:
                out["rows"] = [r for r in prev.get("rows", [])
                               if r["devices"] not in sizes]
        except Exception:
            pass
    base_msm = base_ntt = None
    for r in out["rows"]:
        if r["devices"] == 1:
            base_msm = r["msm_points_per_s"]
            base_ntt = r["ntt_elements_per_s"]
    from panda_tpu.ops import msm as _msm_ops
    from panda_tpu.parallel import msm_sharded as _ms
    c_all = _msm_ops.window_bits(LOG_N)
    for s in sizes:
        mesh = Mesh(np.array(devs[:s]), ("d",))
        msm_ps = msm_points_per_s(BN254, mesh, n)
        ntt_ps = ntt_elements_per_s(BN254, mesh, n, LOG_N)
        if s == 1:
            base_msm, base_ntt = msm_ps, ntt_ps
        # Analytic per-device communication volumes — the quantities that
        # predict pod-scale efficiency before hardware exists (round-4
        # verdict weak #5).  Points sharding: one all_gather of the (W, L)
        # window-sum stacks; NTT four-step: three all_to_alls that each
        # move (d-1)/d of the local shard.
        W = _msm_ops.signed_window_count(BN254.fr.bits, c_all)
        Lf = BN254.fp.n_limbs
        stack = 3 * Lf * 4
        msm_ag = (s - 1) * W * stack
        ntt_a2a = 3 * ((s - 1) * (n // max(s, 1)) // max(s, 1)
                       ) * BN254.fr.n_limbs * 4
        vol2d = (_ms.comm_volume_2d(BN254, max(s // 2, 1), 2, c_all)
                 if s >= 2 else None)
        row = {
            "devices": s,
            "msm_points_per_s": round(msm_ps, 1),
            "msm_scaling_eff": (round(msm_ps / (base_msm * s), 3)
                                if base_msm else None),
            "ntt_elements_per_s": round(ntt_ps, 1),
            "ntt_scaling_eff": (round(ntt_ps / (base_ntt * s), 3)
                                if base_ntt else None),
            "msm_allgather_recv_bytes_per_dev": msm_ag,
            "ntt_all_to_all_recv_bytes_per_dev": ntt_a2a,
            "msm_2d_mesh_volumes": vol2d,
        }
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        out["rows"].sort(key=lambda r: r["devices"])
        path.write_text(json.dumps(out, indent=1))   # incremental


if __name__ == "__main__":
    main()
