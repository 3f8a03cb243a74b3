"""How does XLA TPU gather cost scale?  Sweep #indices, row width R,
table rows n, dtype width.  Hypothesis from profile_gather2: cost is
per-index, not per-byte — if so, fewer/wider gathers win."""

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

    # 1. row width sweep at fixed 2^24 indices, row-major (n, R) table
    NI = 1 << 24
    idx = jnp.asarray(rng.integers(n, size=NI, dtype=np.uint32)
                      ).reshape(NI // 1024, 8, 128)
    for R in (1, 2, 4, 8, 18, 36):
        tab = jnp.asarray(rng.integers(1 << 32, size=(n, R), dtype=np.uint64)
                          .astype(np.uint32))
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        gb = NI * R * 4 / 1e9
        print(f"rows=2^20 R={R:3d} idx=2^24: {t*1e3:8.2f} ms "
              f"({gb:6.2f} GB, {gb/t:7.1f} GB/s)")

    # 2. index count sweep at fixed R=18
    tab = jnp.asarray(rng.integers(1 << 32, size=(n, 18), dtype=np.uint64)
                      .astype(np.uint32))
    for li in (20, 22, 24):
        NI = 1 << li
        idx = jnp.asarray(rng.integers(n, size=NI, dtype=np.uint32)
                          ).reshape(NI // 1024, 8, 128)
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        print(f"rows=2^20 R=18 idx=2^{li}: {t*1e3:8.2f} ms "
              f"({NI/t/1e6:7.1f} M idx/s)")

    # 3. table size sweep at fixed 2^24 indices, R=18
    for ln in (14, 17, 20):
        nn = 1 << ln
        NI = 1 << 24
        tab = jnp.asarray(rng.integers(1 << 32, size=(nn, 18),
                                       dtype=np.uint64).astype(np.uint32))
        idx = jnp.asarray(rng.integers(nn, size=NI, dtype=np.uint32)
                          ).reshape(NI // 1024, 8, 128)
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        print(f"rows=2^{ln} R=18 idx=2^24: {t*1e3:8.2f} ms")

    # 4. sorted / near-sorted indices (locality) at R=18, 2^24 idx
    NI = 1 << 24
    tab = jnp.asarray(rng.integers(1 << 32, size=(n, 18), dtype=np.uint64)
                      .astype(np.uint32))
    si = np.sort(rng.integers(n, size=NI, dtype=np.uint32))
    idx = jnp.asarray(si).reshape(NI // 1024, 8, 128)
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
    print(f"rows=2^20 R=18 idx=2^24 SORTED: {t*1e3:8.2f} ms")

    # 5. axis=1 plane-gather (the current pipeline's form) for reference
    NI = 1 << 24
    tabT = jnp.asarray(rng.integers(1 << 32, size=(18, n), dtype=np.uint64)
                       .astype(np.uint32))
    idx = jnp.asarray(rng.integers(n, size=NI, dtype=np.uint32)
                      ).reshape(NI // 1024, 8, 128)
    t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=1)), tabT, idx)
    print(f"plane (18,n) axis=1 idx=2^24: {t*1e3:8.2f} ms")

    # 6. one-hot matmul "gather" within 8K-chunks: is MXU permute viable?
    #    out[j] = sum_k onehot[j,k] * tab[k]  per 8K chunk of table
    CH = 8192
    NIc = 1 << 16          # indices per chunk's worth of output
    tabc = jnp.asarray(rng.integers(1 << 15, size=(CH, 36),
                                    dtype=np.uint32).astype(np.float32))
    idxc = rng.integers(CH, size=NIc, dtype=np.int32)

    def onehot_gather(tabf, ii):
        oh = (ii[:, None] == jnp.arange(CH, dtype=jnp.int32)[None]
              ).astype(jnp.bfloat16)
        return jnp.dot(oh, tabf.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    t = timed(jax.jit(onehot_gather), tabc, jnp.asarray(idxc))
    eq = NIc
    print(f"onehot-matmul gather {eq} idx from {CH} rows: {t*1e3:8.2f} ms "
          f"-> {eq/t/1e6:.1f} M idx/s (x256 scale = est "
          f"{1e3 * (1 << 24) / (eq / t):.1f} ms per 2^24)")


if __name__ == "__main__":
    main()
