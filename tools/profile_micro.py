"""Micro-benchmarks for MSM pipeline sub-stages on the local device.

Answers specific design questions:
  1. gather: is jnp.take index-bound or byte-bound? (vary record width
     and layout)
  2. assembly: cost of the interior-pick scattered gather vs the tail
     segmented scan vs the final dense add
  3. recode: where do 35 ms go?
"""

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
    rng = np.random.default_rng(0)
    WIN = 16

    # ---- 1. gather shapes ----------------------------------------------
    idx_all = jnp.asarray(rng.integers(n, size=(WIN, n), dtype=np.uint32))
    S, T = 256, WIN * 4096 // 1024

    def tile_k(a):
        m = 4096
        return jnp.transpose(a.reshape(WIN, m, S),
                             (2, 0, 1)).reshape(S, T, 8, 128)

    idx5 = jax.jit(tile_k)(idx_all)
    for rows in (1, 4, 18, 36):
        pk = jnp.asarray(rng.integers(1 << 32, size=(rows, n), dtype=np.uint64)
                         .astype(np.uint32))
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), pk, idx5)
        gb = rows * WIN * n * 4 / 1e9
        print(f"gather rows={rows:2d}: {t * 1e3:8.2f} ms  "
              f"({gb:.2f} GB, {WIN * n / t / 1e6:.0f} M idx/s)")

    # element-major layout: (n, rows) take along axis 0
    for rows in (8, 16):
        pkT = jnp.asarray(rng.integers(1 << 32, size=(n, rows), dtype=np.uint64)
                          .astype(np.uint32))
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), pkT, idx_all)
        print(f"gather elem-major rows={rows:2d}: {t * 1e3:8.2f} ms")

    # ---- 2. scattered pick from emission-like array --------------------
    D = 1 << 15
    L = 18
    em = jnp.asarray(rng.integers(1 << 15, size=(S, T, L, 8, 128),
                                  dtype=np.uint64).astype(np.uint32))
    s_i = jnp.asarray(rng.integers(S, size=(WIN, D), dtype=np.int32))
    j = jnp.asarray(rng.integers(T * 1024, size=(WIN, D), dtype=np.int32))
    t_i, r = j // 1024, j % 1024
    sub, lane = r // 128, r % 128

    def pick(em, s_i, t_i, sub, lane):
        return em[s_i, t_i, :, sub, lane]

    t = timed(jax.jit(pick), em, s_i, t_i, sub, lane)
    print(f"pick {WIN}x{D}x{L} from (S,T,L,8,128): {t * 1e3:8.2f} ms")

    # packed variant: half the planes
    emp = em[:, :, :9]
    t = timed(jax.jit(pick), emp, s_i, t_i, sub, lane)
    print(f"pick {WIN}x{D}x9  from (S,T,9,8,128):  {t * 1e3:8.2f} ms")

    # ---- 3. recode breakdown -------------------------------------------
    from panda_tpu.curves.config import BN254
    from panda_tpu.fields import mont
    from panda_tpu.ops import msm as msm_ops
    fr = BN254.fr
    sc = jnp.asarray(rng.integers(1 << 15, size=(fr.n_limbs, n),
                                  dtype=np.uint64).astype(np.uint32))
    t = timed(jax.jit(lambda s: mont.from_mont(fr, s)), sc)
    print(f"from_mont only:     {t * 1e3:8.2f} ms")
    t = timed(jax.jit(functools.partial(
        msm_ops.signed_digit_arrays, fr, c=16, scalars_in_mont=True)), sc)
    print(f"recode kernel:      {t * 1e3:8.2f} ms")
    t = timed(jax.jit(lambda s: msm_ops.extract_signed_digits(
        fr, mont.from_mont(fr, s), 16)), sc)
    print(f"recode jnp path:    {t * 1e3:8.2f} ms")

    # ---- 4. sort variants ----------------------------------------------
    digits = jnp.asarray(rng.integers(1 << 15, size=(WIN, n),
                                      dtype=np.uint64).astype(np.uint32))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], (WIN, n))

    def do_sort(d, i):
        return jax.lax.sort_key_val(d, i, dimension=1)

    t = timed(jax.jit(do_sort), digits, iota)
    print(f"sort (key,val):     {t * 1e3:8.2f} ms")

    def do_sort_packed(d):
        i = jax.lax.broadcasted_iota(jnp.uint32, (WIN, n), 1)
        packed = (d << np.uint32(17)) | i & np.uint32((1 << 17) - 1)
        s = jax.lax.sort(packed, dimension=1)
        return s

    # pack key+idx in one u32 when c+log_n+1 <= 32 (c=16 needs idx<=2^15
    # per block -> only valid blockwise; measure the raw sort cost anyway)
    t = timed(jax.jit(do_sort_packed), digits)
    print(f"sort single u32:    {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
