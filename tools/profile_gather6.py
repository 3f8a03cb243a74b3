"""Per-index HBM row-gather cost vs TABLE SIZE (v5e).

Round-4 finding: the phase-A coordinate gather costs 8.1 ns/row from a
2^20-row (67 MB) table but 24 ns/row from a 2^22-row (268 MB) table —
table locality, not per-index issue rate, is the regime boundary.  This
sweep locates the knee so ops/msm.py's _CHUNK_N sits just below it.

Fixed 2^23 lookups of (row, 16) uint32 rows; table rows swept.
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
NI = 1 << 23


def timed(fn, *args):
    csum = jax.jit(lambda *a: jax.tree.leaves(fn(*a))[0]
                   .sum(dtype=jnp.uint32))
    np.asarray(csum(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    idx_full = rng.integers(0, 1 << 31, size=NI, dtype=np.int64)
    for log_rows in (16, 17, 18, 19, 20, 21, 22):
        rows = 1 << log_rows
        tab = jnp.asarray(
            rng.integers(1 << 32, size=(rows, 16), dtype=np.int64)
            .astype(np.uint32))
        idx = jnp.asarray((idx_full % rows).astype(np.uint32)
                          ).reshape(NI // 1024, 8, 128)
        t = timed(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), tab, idx)
        print(f"rows=2^{log_rows} ({rows * 64 / 1e6:7.1f} MB): "
              f"{t * 1e3:8.2f} ms for 2^23 rows = {t / NI * 1e9:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
