"""Two follow-ups to profile_gather3:

1. XLA HBM gather with R=16/12/9 u32 rows (full 32-bit repacking of a
   point = 16 u32) — alignment sweet spot hunt.
2. Mosaic tpu.dynamic_gather (jnp.take_along_axis inside a Pallas kernel)
   throughput: per-column table lookup at various depths R.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    NI = 1 << 24
    idx = jnp.asarray(rng.integers(n, size=NI, dtype=np.uint32)
                      ).reshape(NI // 1024, 8, 128)
    for R in (9, 12, 16):
        tab = jnp.asarray(rng.integers(1 << 32, size=(n, R), dtype=np.uint64)
                          .astype(np.uint32))
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        print(f"HBM row gather R={R:3d}: {t*1e3:8.2f} ms")
    # u64 rows
    for R in (8,):
        tab = jnp.asarray(rng.integers(1 << 63, size=(n, R), dtype=np.uint64))
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        print(f"HBM row gather R={R} u64: {t*1e3:8.2f} ms")

    # --- Mosaic dynamic_gather inside Pallas ------------------------------
    # Kernel: per grid step, table block (R, 128) and idx block (R, 128);
    # out[i, j] = tab[idx[i, j], j].  Throughput = NI_out / time where
    # NI_out = R * 128 per step.
    def dg_kernel(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(tab_ref[...],
                                           idx_ref[...], axis=0)

    for R in (8, 32, 256, 1024):
        G = max(1, (1 << 22) // (R * 128))     # total 4M lookups
        tab = jnp.asarray(
            rng.integers(1 << 31, size=(G, R, 128), dtype=np.int64)
            .astype(np.int32))
        idxs = jnp.asarray(
            rng.integers(R, size=(G, R, 128), dtype=np.int64)
            .astype(np.int32))
        spec = pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)

        def dg3(tab_ref, idx_ref, out_ref):
            out_ref[0] = jnp.take_along_axis(tab_ref[0], idx_ref[0], axis=0)

        fn = pl.pallas_call(
            dg3, grid=(G,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((G, R, 128), jnp.int32))
        try:
            t = timed(fn, tab, idxs)
            tot = G * R * 128
            print(f"pallas dynamic_gather depth R={R:5d}: {t*1e3:8.2f} ms "
                  f"for {tot/1e6:.1f} M lookups = {tot/t/1e6:8.1f} M/s")
        except Exception as e:
            print(f"pallas dynamic_gather depth R={R}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
