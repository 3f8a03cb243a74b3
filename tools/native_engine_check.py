"""On-chip native-ABI -> TPU-engine check (SURVEY C1/C2 closure evidence).

This process NEVER imports jax: it plays the role of a native (non-Python)
prover linking libpanda_host.so.  It creates a session, routes execution
to the accelerated engine (``panda_session_set_execution_target(1)``), and
verifies the MSM/NTT results against the pure big-int oracle — so the only
process touching the TPU is the worker the C ABI spawned, exactly the
topology a Rust prover would produce.

Usage: python tools/native_engine_check.py [--log-n 12] [--out FILE.json]
"""

import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from panda_tpu.interop import native          # ctypes only
from panda_tpu.reference import curve_ref, ntt_ref
from panda_tpu.curves.config import BN254


def _assert_no_backend(stage: str) -> None:
    """The host sitecustomize imports jax into every process, so the
    meaningful invariant is that THIS process never initializes a jax
    backend (never touches the TPU); the worker must be the only claimant.
    """
    if "jax" in sys.modules:
        from jax._src import xla_bridge
        assert not xla_bridge._backends, \
            f"parent initialized a jax backend ({stage})"


_assert_no_backend("import")


def main():
    log_n = int(sys.argv[sys.argv.index("--log-n") + 1]) \
        if "--log-n" in sys.argv else 12
    out_path = pathlib.Path(sys.argv[sys.argv.index("--out") + 1]) \
        if "--out" in sys.argv else None
    curve = BN254
    fp, fr = curve.fp, curve.fr
    rng = random.Random(99)
    n = 1 << log_n

    # Pool-structured points so the big-int oracle is O(pool).
    pool = min(n, 512)
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(pool):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    pts = [table[rng.randrange(pool)] for _ in range(n)]
    scalars = [rng.randrange(fr.modulus) for _ in range(n)]
    bases = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    sblob = b"".join(
        fr.to_wire_int(s).to_bytes(fr.n_bytes, "little") for s in scalars)

    res = {"log_n": log_n, "checks": []}
    t0 = time.time()
    with native.NativeSession(curve) as s:
        s.set_execution_target(1)
        s.engine_warmup()
        res["checks"].append({"name": "engine_warmup", "ok": True,
                              "secs": round(time.time() - t0, 2)})
        t0 = time.time()
        blob = s.msm(sblob, bases)
        x, y, z = (fp.from_wire_int(int.from_bytes(
            blob[i * fp.n_bytes:(i + 1) * fp.n_bytes], "little"))
            for i in range(3))
        p = fp.modulus
        agg = {}
        for pt, sc in zip(pts, scalars):
            agg[pt] = (agg.get(pt, 0) + sc) % fr.modulus
        want = curve_ref.msm_oracle(curve, list(agg), list(agg.values()))
        if z == 0:
            got = None
        else:
            zi = pow(z, -1, p)
            got = (x * zi * zi % p, y * zi * zi % p * zi % p)
        ok = got == want
        res["checks"].append({"name": f"engine_msm_2^{log_n}_vs_oracle",
                              "ok": bool(ok),
                              "secs": round(time.time() - t0, 2)})
        print(f"{'OK' if ok else 'FAIL'} engine msm 2^{log_n}", flush=True)

        t0 = time.time()
        kn = 8
        vals = [rng.randrange(fr.modulus) for _ in range(1 << kn)]
        data = b"".join(fr.to_wire_int(v).to_bytes(fr.n_bytes, "little")
                        for v in vals)
        out = s.ntt(data, kn)
        got_vals = [fr.from_wire_int(int.from_bytes(
            out[i * fr.n_bytes:(i + 1) * fr.n_bytes], "little"))
            for i in range(1 << kn)]
        exp = ntt_ref.ntt_oracle(fr, vals, fr.root_of_unity(kn))
        ok1 = got_vals == exp
        ok2 = s.ntt(out, kn, inverse=True) == data
        res["checks"].append({"name": f"engine_ntt_2^{kn}_oracle_roundtrip",
                              "ok": bool(ok1 and ok2),
                              "secs": round(time.time() - t0, 2)})
        print(f"{'OK' if ok1 and ok2 else 'FAIL'} engine ntt 2^{kn}",
              flush=True)

    _assert_no_backend("exit")
    res["all_ok"] = all(c["ok"] for c in res["checks"])
    if out_path:
        out_path.write_text(json.dumps(res, indent=1))
    print(json.dumps({"all_ok": res["all_ok"]}))
    return 0 if res["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
