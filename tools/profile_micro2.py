"""Second round of micro-benchmarks: locate/searchsorted vs
matmul-histogram, segmented scan, final dense add, k_at pick."""

import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REPS = 3


def timed(fn, *args):
    csum = jax.jit(lambda *a: sum(
        x.astype(jnp.uint32).sum(dtype=jnp.uint32)
        for x in jax.tree.leaves(fn(*a))))
    np.asarray(csum(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    return np.median(ts)


def main():
    n = 1 << 20
    WIN, c = 16, 16
    D = 1 << (c - 1)
    rng = np.random.default_rng(0)
    keys = jnp.asarray(np.sort(
        rng.integers(D + 1, size=(WIN, n)), axis=1).astype(np.uint32))
    targets = jnp.arange(1, D + 1, dtype=jnp.uint32)

    # --- locate via searchsorted (current) ------------------------------
    def locate(k):
        f = jax.vmap(lambda kk: jnp.searchsorted(kk, targets, side="right"))
        return f(k).astype(jnp.int32)

    t = timed(jax.jit(locate), keys)
    print(f"locate searchsorted (W={WIN}, n=2^20, D=2^15): {t * 1e3:8.2f} ms")

    # --- locate via matmul histogram ------------------------------------
    HI, LO = 1 << 8, 1 << (c - 1 - 8)

    def locate_mm(digits):
        # digits (W, n) in [0, D]; cumulative counts hi_b = #elements <= b.
        dh = (digits >> np.uint32(c - 1 - 8)).astype(jnp.int32)   # hi 8 bits
        dl = (digits & np.uint32(LO - 1)).astype(jnp.int32)
        A = (dh[:, None, :] == jnp.arange(HI, dtype=jnp.int32)[None, :, None]
             ).astype(jnp.int8)                                   # (W, HI, n)
        B = (dl[:, :, None] == jnp.arange(LO, dtype=jnp.int32)[None, None, :]
             ).astype(jnp.int8)                                   # (W, n, LO)
        cnt = jax.lax.dot_general(
            A, B, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                     # (W, HI, LO)
        hist = cnt.reshape(WIN, HI * LO)                          # counts 0..D+
        return jnp.cumsum(hist, axis=1)[:, :D + 1]                # hi_b

    t = timed(jax.jit(locate_mm), keys)
    print(f"locate matmul-hist:                           {t * 1e3:8.2f} ms")

    # equality check (hi_b = cumhist[b] for b in 1..D)
    a = np.asarray(jax.jit(locate)(keys))
    b = np.asarray(jax.jit(locate_mm)(keys))[:, 1:D + 1]
    assert (a == b).all(), "locate mismatch"
    print("locate implementations agree")

    # --- tails: segmented scan + final add at real sizes ----------------
    from panda_tpu.curves.config import BN254
    from panda_tpu.curves import point as cp
    from panda_tpu.curves.point import ProjPoint
    from panda_tpu.ops import reduce as red
    L = BN254.fp.n_limbs
    m = 4096
    Wg = 4

    def rnd_pts(shape):
        return ProjPoint(*(jnp.asarray(
            rng.integers(1 << 15, size=(L,) + shape, dtype=np.uint64)
            .astype(np.uint32)) for _ in range(3)))

    tpts = rnd_pts((Wg, m))
    tstarts = jnp.asarray(rng.integers(2, size=(Wg, m)).astype(bool))
    seg = jax.jit(lambda p, s: tuple(
        red.segmented_prefix_scan(BN254, ProjPoint(*p), s, max_seg=m)))
    t = timed(seg, tuple(tpts), tstarts)
    print(f"tail segmented scan (Wg=4, m=4096) x4 groups: {4 * t * 1e3:8.2f} ms")

    ipts = rnd_pts((Wg, D))
    tp2 = rnd_pts((Wg, D))
    fadd = jax.jit(lambda a, b: tuple(
        cp.add(BN254, ProjPoint(*a), ProjPoint(*b))))
    t = timed(fadd, tuple(ipts), tuple(tp2))
    print(f"final dense add (Wg=4, D=2^15) x4 groups:     {4 * t * 1e3:8.2f} ms")

    # --- k_at pick (tiny gather over ekeys tiles) -----------------------
    S, T = 256, 16
    ek = jnp.asarray(rng.integers(D, size=(S, T, 8, 128), dtype=np.uint64)
                     .astype(np.uint32))
    s_i = jnp.asarray(rng.integers(S, size=(Wg, D), dtype=np.int32))
    j = jnp.asarray(rng.integers(T * 1024, size=(Wg, D), dtype=np.int32))
    t_i, r = j // 1024, j % 1024
    sub, lane = r // 128, r % 128
    t = timed(jax.jit(lambda e, a, b, cc, d: e[a, b, cc, d]),
              ek, s_i, t_i, sub, lane)
    print(f"k_at pick (Wg=4, D) x4 groups:                {4 * t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
