"""Isolate the real-pipeline gather's components: pack_coords, tile_k
index transpose, the take itself, and layout alternatives."""

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
    W, m = 16, 1024
    steps = n // m
    T = (W * m) // 1024
    R = 18
    L = 18
    rng = np.random.default_rng(0)
    oi = jnp.asarray(rng.integers(n, size=(W, n), dtype=np.uint32))
    px = jnp.asarray(rng.integers(1 << 15, size=(L, n), dtype=np.uint32))
    py = jnp.asarray(rng.integers(1 << 15, size=(L, n), dtype=np.uint32))
    pk = jnp.asarray(rng.integers(1 << 32, size=(R, n), dtype=np.uint64)
                     .astype(np.uint32))

    def tile_k(a):
        return jnp.transpose(a.reshape(W, m, steps),
                             (2, 0, 1)).reshape(steps, T, 8, 128)

    from panda_tpu.ops import phase_a_pallas

    t = timed(jax.jit(lambda x, y: phase_a_pallas.pack_coords(
        __import__("panda_tpu.curves.config", fromlist=["BN254"]).BN254.fp,
        x, y)), px, py)
    print(f"pack_coords:                  {t*1e3:8.2f} ms")

    t = timed(jax.jit(tile_k), oi)
    print(f"tile_k transpose (67MB):      {t*1e3:8.2f} ms")

    oi5 = jax.block_until_ready(jax.jit(tile_k)(oi))
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk, oi5)
    print(f"take pre-tiled idx:           {t*1e3:8.2f} ms")

    t = timed(jax.jit(lambda p, i: jnp.take(p, tile_k(i), axis=1)), pk, oi)
    print(f"take(tile_k(oi)) fused:       {t*1e3:8.2f} ms")

    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk, oi)
    print(f"take (W,n) idx order:         {t*1e3:8.2f} ms")

    def take_tr(p, i):
        q = jnp.take(p, i, axis=1)          # (R, W, n)
        return jnp.transpose(q.reshape(R, W, m, steps),
                             (3, 2, 0, 1))  # hmm wrong target; bandwidth test
    t = timed(jax.jit(take_tr), pk, oi)
    print(f"take + 1.2GB transpose:       {t*1e3:8.2f} ms")

    # row-major table: (n, R); gather rows with tiled idx
    pkT = jnp.asarray(np.ascontiguousarray(np.asarray(pk).T))
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), pkT, oi5)
    print(f"row take (n,R) tiled idx:     {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
