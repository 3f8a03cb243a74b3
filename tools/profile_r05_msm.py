"""Round-5 MSM glue breakdown (v5e via axon).

profile_msm.py showed tables(316ms) = gather(135) + phase_a(84) + ~97ms of
"assembly glue" at 2^20, plus wsum(34) and recode(26).  This tool times
the glue pieces individually (dispatch-floor-corrected in-jit chains) to
target the round-5 fusion work:

  hist      _cum_counts one-hot matmul histogram (W, D)
  tails     segmented_prefix_scan over (L, W, m) tail lanes
  tableadd  one complete add of two (L, W, D) dense bucket tables
            (the per-chunk accumulation cost that killed 2^17 chunking)
  wsum      weighted_window_sum over one (L, W, D) table
  pick      the interior-pick gather + unpack from emission tiles

Usage: python tools/profile_r05_msm.py [log_n=20]
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
    print(f"[r05msm +{time.perf_counter()-T0:7.1f}s] {msg}",
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
    # Shape-free chain: the op's output reduces to one bit xor'd into the
    # carry, so arbitrary-output components stay data-dependent across
    # repeats (no CSE) without matching carry shapes.
    def f(x):
        def body(carry, i):
            out = op(carry ^ i.astype(carry.dtype))
            scal = sum(v.astype(jnp.uint32).sum(dtype=jnp.uint32)
                       for v in jax.tree.leaves(out))
            return carry ^ (scal & np.uint32(1)), ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32)
    return f


def main():
    from panda_tpu.curves import point as cp
    from panda_tpu.curves.config import BN254 as curve
    from panda_tpu.curves.point import ProjPoint
    from panda_tpu.fields import codec
    from panda_tpu.ops import msm as msm_ops
    from panda_tpu.ops import reduce as red

    fp, fr = curve.fp, curve.fr
    n = 1 << LOG_N
    rng = np.random.default_rng(2)
    L = fp.n_limbs

    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda a: (a + 1).sum(dtype=jnp.uint32), tiny)
    out["floor_ms"] = round(floor * 1e3, 2)
    log(f"floor {floor*1e3:.1f} ms")

    c = msm_ops.window_bits(LOG_N)
    W = msm_ops.signed_window_count(fr.bits, c)
    D = 1 << (c - 1)
    m = msm_ops.default_lanes(n, W)
    out.update(c=c, W=W, D=D, m=m)
    log(f"c={c} W={W} D={D} m={m}")

    digits = jnp.asarray(rng.integers(0, D + 1, size=(W, n)).astype(np.uint32))

    # hist
    def hist_op(d):
        hi = msm_ops._cum_counts(d % np.uint32(D + 1), D, n)
        return hi.astype(jnp.uint32)
    t = timed(chain(hist_op), digits)
    out["hist_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"hist {(t-floor)/R*1e3:.1f} ms")

    # random (L, W, D) coordinate tables (values only drive timing)
    def rnd(shape):
        return jnp.asarray(
            rng.integers(0, 1 << 15, size=shape).astype(np.uint32))

    tab = tuple(rnd((L, W, D)) for _ in range(3))
    one = np.uint32(1)

    # tableadd: one complete projective add of two dense tables
    def tadd_op(x0):
        a = ProjPoint(tab[0] ^ x0[0, 0], tab[1], tab[2])
        b = ProjPoint(tab[0], tab[1] ^ x0[0, 0], tab[2])
        s = cp.add(curve, a, b)
        return s.x
    t = timed(chain(lambda z: tadd_op(z)), rnd((8, 128)))
    out["tableadd_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"tableadd {(t-floor)/R*1e3:.1f} ms")

    # wsum
    def wsum_op(x0):
        s = red.weighted_window_sum(
            curve, ProjPoint(tab[0] ^ x0[0, 0], tab[1], tab[2]))
        return s[0]
    t = timed(chain(wsum_op), rnd((8, 128)))
    out["wsum_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"wsum {(t-floor)/R*1e3:.1f} ms")

    # tails: segmented scan over (L, W, m)
    tl = tuple(rnd((L, W, m)) for _ in range(3))
    starts = jnp.asarray(rng.integers(0, 2, size=(W, m)).astype(bool))

    def tails_op(x0):
        s = red.segmented_prefix_scan(
            curve, ProjPoint(tl[0] ^ x0[0, 0], tl[1], tl[2]), starts,
            max_seg=m)
        return s.x
    t = timed(chain(tails_op), rnd((8, 128)))
    out["tails_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"tails {(t-floor)/R*1e3:.1f} ms")

    # pick: emission-tile gather + unpack (the interior-pick block)
    steps = -(-n // m)
    T = (W * m) // 1024
    Lp = -(-L // 2)
    ep5 = rnd((steps, T, 3 * Lp, 8, 128))
    ek5 = rnd((steps, T, 8, 128))
    hi = jnp.asarray(rng.integers(0, m * steps, size=(W, D)).astype(np.int32))
    slot = jnp.clip(hi, 0, m * steps - 1)

    def pick_op(x0):
        s_i = (slot + x0[0, 0].astype(jnp.int32) % 2) % steps
        j = jnp.arange(W, dtype=jnp.int32)[:, None] * m + slot // steps
        t_i, r = j // 1024, j % 1024
        sub, lane = r // 128, r % 128
        k_at = ek5[s_i, t_i, sub, lane]
        epick = ep5[s_i, t_i, :, sub, lane]

        def unpack(block):
            w = jnp.moveaxis(block, -1, 0)
            return jnp.stack([w & np.uint32(0xFFFF), w >> np.uint32(16)],
                             axis=1).reshape(2 * Lp, *w.shape[1:])[:L]
        return (unpack(epick[..., :Lp])[0] + k_at).astype(jnp.uint32)
    t = timed(chain(pick_op), rnd((8, 128)))
    out["pick_ms"] = round((t - floor) / R * 1e3, 2)
    log(f"pick {(t-floor)/R*1e3:.1f} ms")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
