"""Gather layout experiments: can any formulation beat ~100M idx/s?"""

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
    n = 1 << 20
    W = 16
    R = 18
    rng = np.random.default_rng(0)
    nidx = W * n
    idx5 = jnp.asarray(rng.integers(n, size=(256, 16, 8, 128),
                                    dtype=np.uint32))
    pk = jnp.asarray(rng.integers(1 << 32, size=(R, n), dtype=np.uint64)
                     .astype(np.uint32))
    pkT = jnp.asarray(np.ascontiguousarray(np.asarray(pk).T))   # (n, R)

    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk, idx5)
    print(f"take axis=1 (R,n):              {t * 1e3:8.2f} ms "
          f"({nidx / t / 1e6:.0f} M idx/s)")

    # lax.gather: operand (n, R), slice (1, R), offset dim FIRST in output
    from jax.lax import GatherDimensionNumbers, gather

    def g_first(p, i):
        dn = GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(), start_index_map=(0,))
        out = gather(p, i.reshape(-1, 1), dn, slice_sizes=(1, R))
        return out  # (R?, ...) check shape

    try:
        shape = jax.eval_shape(g_first, pkT, idx5)
        print("g_first out shape:", shape.shape)
        t = timed(jax.jit(g_first), pkT, idx5)
        print(f"gather (n,R) offset-first:      {t * 1e3:8.2f} ms")
    except Exception as e:
        print("g_first failed:", str(e)[:200])

    # take along axis 0 of (n, R): output (..., R)
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), pkT,
              idx5.reshape(-1))
    print(f"take axis=0 (n,R) flat idx:     {t * 1e3:8.2f} ms")

    # split into two half-width gathers run "concurrently" in one jit
    def two(p, i):
        a = jnp.take(p[:R // 2], i, axis=1)
        b = jnp.take(p[R // 2:], i, axis=1)
        return a, b

    t = timed(jax.jit(two), pk, idx5)
    print(f"two half gathers axis=1:        {t * 1e3:8.2f} ms")

    # one u32 row only, many times -> pure index rate
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk[:1], idx5)
    print(f"take axis=1 single row:         {t * 1e3:8.2f} ms")

    # sorted indices (locality): does it matter?
    idx_sorted = jnp.sort(idx5.reshape(-1)).reshape(idx5.shape)
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk, idx_sorted)
    print(f"take axis=1 sorted idx:         {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
