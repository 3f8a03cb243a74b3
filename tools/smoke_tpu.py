"""Quick TPU smoke: small MSM end-to-end vs oracle with kernels ON."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import random

from panda_tpu.curves.config import BN254
from panda_tpu.fields import codec
from panda_tpu.ops import msm as msm_ops
from panda_tpu.reference import curve_ref


def main():
    print("backend:", jax.default_backend())
    rng = random.Random(11)
    n, c = 4096, 12            # D = 2048 >= _HIST_MIN_D -> hist path
    curve = BN254
    fp, fr = curve.fp, curve.fr
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(64):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    pts = [table[rng.randrange(64)] for _ in range(n)]
    scalars = [rng.randrange(fr.modulus) for _ in range(n)]
    px = jnp.asarray(codec.ints_to_limbs(
        fp, [fp.to_mont_int(x) for x, _ in pts]))
    py = jnp.asarray(codec.ints_to_limbs(
        fp, [fp.to_mont_int(y) for _, y in pts]))
    sc = jnp.asarray(codec.ints_to_limbs(
        fr, [fr.to_mont_int(v) for v in scalars]))

    ws = msm_ops.window_sums_fn(curve, c)
    fn = jax.jit(lambda a, b, s: jnp.stack(ws(a, b, s)))
    sums = np.asarray(fn(px, py, sc))
    got = msm_ops.host_horner(curve, list(sums), c)
    want = curve_ref.msm_oracle(curve, pts, scalars)
    assert got == want, f"MISMATCH\n got={got}\nwant={want}"
    print("TPU smoke MSM n=4096 c=12: OK")


if __name__ == "__main__":
    main()
