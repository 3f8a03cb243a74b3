"""MXU NTT matmul + vmul variant experiments (v5e).

The round-4 stage profile (tools/profile_ntt.py) measured the int8
einsum at 14 of 394 TMAC/s and the fmul twiddle kernel at ~24 ms for
2^20 elements — both far off their roofline.  This sweeps drop-in
variants at the level-0 shape (nb=8192, KD=6912):

  matmul: s8*s8->s32 (current), bf16*bf16->f32 (EXACT here: 5-bit digit
  products <= 961 are f32-integers and partial sums <= K*D*961 = 6.6M
  < 2^24), f32*f32->f32, plus operand-order/layout flips.

  vmul: the Pallas fmul kernel vs the plain jnp mont.mul expansion at
  (L, 2^20).

Equality of outputs is asserted (bitwise after int32 round) so any
variant reported faster is also proven exact on real data.
"""

import functools
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
    csum = jax.jit(lambda *a: jax.tree.leaves(fn(*a))[0]
                   .astype(jnp.int32).sum(dtype=jnp.int32))
    np.asarray(csum(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(csum(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from panda_tpu.fields.config import BN254_FR as spec
    from panda_tpu.ops import ntt_mxu

    rng = np.random.default_rng(5)
    L = spec.n_limbs
    D = ntt_mxu.DIG_PER_LIMB * L
    K, nb = 128, 8192
    KD = K * D
    macs = nb * KD * KD
    print(f"L={L} D={D} KD={KD} nb={nb}  ({macs / 1e9:.0f} GMACs/pass)",
          flush=True)

    d8_np = rng.integers(0, 32, size=(nb, KD)).astype(np.int8)
    m8_np = rng.integers(0, 32, size=(KD, KD)).astype(np.int8)
    d8, m8 = jnp.asarray(d8_np), jnp.asarray(m8_np)
    ref = None

    def report(name, fn, *args):
        nonlocal ref
        t = timed(fn, *args)
        out = np.asarray(jax.jit(fn)(*args)).astype(np.int64)
        if ref is None:
            ref = out
        ok = (out == ref).all()
        print(f"{name:28s} {t * 1e3:8.2f} ms  {macs / t / 1e12:6.1f} TMAC/s"
              f"  exact={ok}", flush=True)

    report("s8,s8->s32 bi,ij",
           lambda a, b: jnp.einsum("bi,ij->bj", a, b,
                                   preferred_element_type=jnp.int32), d8, m8)
    report("s8,s8->s32 ij,bj (swapped)",
           lambda a, b: jnp.einsum("ji,bj->bi", b, a,
                                   preferred_element_type=jnp.int32), d8, m8)
    report("bf16,bf16->f32",
           lambda a, b: jnp.einsum(
               "bi,ij->bj", a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
               preferred_element_type=jnp.float32).astype(jnp.int32), d8, m8)
    report("f32,f32->f32",
           lambda a, b: jnp.einsum(
               "bi,ij->bj", a.astype(jnp.float32), b.astype(jnp.float32),
               preferred_element_type=jnp.float32).astype(jnp.int32), d8, m8)
    report("s8 dot_general NT",
           lambda a, b: jax.lax.dot_general(
               a, b.T, (((1,), (1,)), ((), ())),
               preferred_element_type=jnp.int32), d8, m8)
    report("bf16 NT",
           lambda a, b: jax.lax.dot_general(
               a.astype(jnp.bfloat16), b.T.astype(jnp.bfloat16),
               (((1,), (1,)), ((), ())),
               preferred_element_type=jnp.float32).astype(jnp.int32), d8, m8)

    # --- vmul variants ----------------------------------------------------
    from panda_tpu.fields import codec, mont
    from panda_tpu.ops import point_pallas

    n = 1 << 20
    import random as _r
    pr = _r.Random(3)
    pool = min(n, 1 << 12)
    av = [pr.randrange(spec.modulus) for _ in range(pool)]
    bv = [pr.randrange(spec.modulus) for _ in range(pool)]
    al = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in av])
    bl = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in bv])
    ia = rng.integers(pool, size=n)
    ib = rng.integers(pool, size=n)
    a = jnp.asarray(np.take(al, ia, axis=1))
    b = jnp.asarray(np.take(bl, ib, axis=1))
    p2 = 2 * spec.modulus

    t = timed(jax.jit(lambda x, y: point_pallas.fmul(
        spec, x, y, vb_a=p2, vb_b=p2)), a, b)
    print(f"{'fmul pallas kernel':28s} {t * 1e3:8.2f} ms", flush=True)
    t = timed(jax.jit(lambda x, y: mont.mul(
        spec, mont.FE(x, 1 << 15, p2), mont.FE(y, 1 << 15, p2)).v), a, b)
    print(f"{'mont.mul jnp':28s} {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
