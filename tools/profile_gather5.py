"""End-to-end cost of the u64-packed gather feeding the phase-A kernel
layout (16, S, T, 8, 128) u32, for both table layouts:

  A. row table (n, 8) u64: take axis=0 -> (S,T,8,128,8) u64
     -> split + transpose to (16,S,T,8,128)
  B. plane table (8, n) u64: take axis=1 -> (8,S,T,8,128) u64
     -> split lo/hi + interleave to (16,S,T,8,128)

Compare against the current 18-plane u32 gather (166-175 ms measured).
"""

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

REPS = 5


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
    rng = np.random.default_rng(0)
    n = 1 << 20
    W, m = 16, 1024
    steps = n // m
    S, T = steps, (W * m) // 1024
    NI = W * n
    oi5 = jnp.asarray(rng.integers(n, size=NI, dtype=np.uint32)
                      ).reshape(S, T, 8, 128)

    tab_row = jnp.asarray(rng.integers(1 << 63, size=(n, 8), dtype=np.uint64))
    tab_pl = jnp.asarray(rng.integers(1 << 63, size=(8, n), dtype=np.uint64))

    def variant_a(tab, i):
        q = jnp.take(tab, i, axis=0)                  # (S,T,8,128,8) u64
        lo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (q >> np.uint64(32)).astype(jnp.uint32)
        qq = jnp.stack([lo, hi], axis=-1).reshape(S, T, 8, 128, 16)
        return jnp.transpose(qq, (4, 0, 1, 2, 3))     # (16,S,T,8,128)

    t = timed(jax.jit(variant_a), tab_row, oi5)
    print(f"A row (n,8)u64 gather+split+transpose: {t*1e3:8.2f} ms")

    def variant_a_raw(tab, i):
        return jnp.take(tab, i, axis=0)

    t = timed(jax.jit(variant_a_raw), tab_row, oi5)
    print(f"A row gather alone:                    {t*1e3:8.2f} ms")

    def variant_b(tab, i):
        q = jnp.take(tab, i, axis=1)                  # (8,S,T,8,128) u64
        lo = (q & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (q >> np.uint64(32)).astype(jnp.uint32)
        return jnp.stack([lo, hi], axis=1).reshape(16, S, T, 8, 128)

    t = timed(jax.jit(variant_b), tab_pl, oi5)
    print(f"B plane (8,n)u64 gather+split:         {t*1e3:8.2f} ms")

    def variant_b_raw(tab, i):
        return jnp.take(tab, i, axis=1)

    t = timed(jax.jit(variant_b_raw), tab_pl, oi5)
    print(f"B plane gather alone:                  {t*1e3:8.2f} ms")

    # C: leave the u64 planes as-is for the kernel (split in-kernel);
    # cost is just the plane gather (B raw) — kernel reads (8,...) u64.
    # Mosaic u64 support is doubtful; D: two u32 half-tables instead:
    # lo table (8, n) u32 + hi table (8, n) u32, two gathers.
    tab_lo = jnp.asarray(rng.integers(1 << 32, size=(8, n), dtype=np.uint64)
                         .astype(np.uint32))
    tab_hi = jnp.asarray(rng.integers(1 << 32, size=(8, n), dtype=np.uint64)
                         .astype(np.uint32))

    def variant_d(tl, th, i):
        a = jnp.take(tl, i, axis=1)
        b = jnp.take(th, i, axis=1)
        return jnp.concatenate([a, b], axis=0)

    t = timed(jax.jit(variant_d), tab_lo, tab_hi, oi5)
    print(f"D two (8,n)u32 plane gathers:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
