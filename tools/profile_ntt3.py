"""Dispatch-floor-corrected NTT component costs (v5e via axon).

Round-4 discovery: every standalone op times at 24-29 ms regardless of
work (wsum, vmul, digits, einsum) — consistent with a fixed per-dispatch
round-trip floor through the axon tunnel, not with the ops' rooflines.
This tool (a) measures the floor with a trivial op, then (b) times each
component REPEATED R times inside ONE jitted program (a data-dependent
chain so XLA cannot CSE the repeats): true per-op cost =
(t_chain - floor) / R.

Usage: python tools/profile_ntt3.py
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
R = 8            # in-jit repeats


def timed(fn, *args):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))                   # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op, x0):
    """Repeat op R times with a data dependency (defeats CSE)."""
    def f(x):
        def body(carry, i):
            y = op(carry ^ i.astype(carry.dtype))
            return y, ()
        y, _ = jax.lax.scan(body, x, jnp.arange(R, dtype=jnp.uint32))
        return y.sum(dtype=jnp.uint32) if y.dtype == jnp.uint32 \
            else y.astype(jnp.int32).sum(dtype=jnp.int32)
    return f


def main():
    from panda_tpu.fields import codec, mont
    from panda_tpu.fields.config import BN254_FR as spec
    from panda_tpu.ops import ntt as ntt_ops
    from panda_tpu.ops import ntt_mxu

    rng = np.random.default_rng(5)

    # --- dispatch floor ---------------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.uint32)
    floor = timed(lambda a: (a + 1).sum(dtype=jnp.uint32), tiny)
    print(f"dispatch floor (trivial op): {floor * 1e3:8.2f} ms", flush=True)

    # --- full NTT, R-chained ---------------------------------------------
    n = 1 << 20
    L = spec.n_limbs
    import random as _r
    pr = _r.Random(3)
    pool = 1 << 12
    vals = [pr.randrange(spec.modulus) for _ in range(pool)]
    lp = codec.ints_to_limbs(spec, [spec.to_mont_int(v) for v in vals])
    x = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))

    plan = ntt_mxu.mxu_plan(spec, 20)
    tabs = ntt_mxu.plan_tables(plan)

    def full_op(a):
        # mask keeps limbs in range after the xor perturbation
        return ntt_mxu.apply_ntt(plan, a & np.uint32(0x7FFF), tabs)

    t = timed(chain(full_op, x), x)
    per = (t - floor) / R
    print(f"full mxu ntt 2^20 x{R}: {t * 1e3:8.2f} ms -> "
          f"{per * 1e3:8.2f} ms/op = {n / per / 1e6:.1f} M elem/s true",
          flush=True)

    # --- einsum, R-chained ------------------------------------------------
    D = ntt_mxu.DIG_PER_LIMB * L
    K, nb = 128, 8192
    KD = K * D
    d8 = jnp.asarray(rng.integers(0, 32, size=(nb, KD)).astype(np.int8))
    m8 = jnp.asarray(rng.integers(0, 32, size=(KD, KD)).astype(np.int8))
    macs = nb * KD * KD

    def ein_chain(a, m):
        def body(carry, _):
            y = jnp.einsum("bi,ij->bj", carry, m,
                           preferred_element_type=jnp.int32)
            return (y & 31).astype(jnp.int8), ()
        y, _ = jax.lax.scan(body, a, jnp.arange(R))
        return y.astype(jnp.int32).sum(dtype=jnp.int32)

    t = timed(ein_chain, d8, m8)
    per = (t - floor) / R
    print(f"s8 einsum x{R}: {t * 1e3:8.2f} ms -> {per * 1e3:8.2f} ms/op "
          f"= {macs / per / 1e12:.1f} TMAC/s true", flush=True)

    def ein_chain_bf(a, m):
        mb = m.astype(jnp.bfloat16)
        def body(carry, _):
            y = jnp.einsum("bi,ij->bj", carry.astype(jnp.bfloat16), mb,
                           preferred_element_type=jnp.float32)
            return (y.astype(jnp.int32) & 31).astype(jnp.int8), ()
        y, _ = jax.lax.scan(body, a, jnp.arange(R))
        return y.astype(jnp.int32).sum(dtype=jnp.int32)

    t = timed(ein_chain_bf, d8, m8)
    per = (t - floor) / R
    print(f"bf16 einsum x{R}: {t * 1e3:8.2f} ms -> {per * 1e3:8.2f} ms/op "
          f"= {macs / per / 1e12:.1f} TMAC/s true", flush=True)

    # --- vmul (fused Pallas fmul), R-chained ------------------------------
    from panda_tpu.ops import point_pallas
    p2 = 2 * spec.modulus
    b = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1))

    def vmul_op(a):
        # declared bounds are for the kernel's static plan only — this is
        # a pure timing probe, numerics are not checked
        return point_pallas.fmul(spec, a & np.uint32(0x7FFF), b,
                                 vb_a=p2, vb_b=p2)

    t = timed(chain(vmul_op, x), x)
    per = (t - floor) / R
    print(f"fmul 2^20 x{R}: {t * 1e3:8.2f} ms -> {per * 1e3:8.2f} ms/op",
          flush=True)

    # --- glue stages, R-chained ------------------------------------------
    K2 = 128
    nb2 = n // K2
    z0 = jnp.asarray(np.take(lp, rng.integers(pool, size=n), axis=1)
                     ).reshape(L, K2, nb2)
    DIG = ntt_mxu.DIG_BITS
    DM = ntt_mxu.DIG_MAX

    def digits_op(a):
        a = (a & np.uint32(0x7FFF)).reshape(L, K2, nb2)
        d = jnp.stack([a & DM, (a >> DIG) & DM, (a >> (2 * DIG)) & DM],
                      axis=-1)
        d = d.transpose(2, 1, 0, 3).reshape(nb2, K2 * D).astype(jnp.int8)
        # close the chain back to the input layout/dtype
        return d.reshape(nb2, K2, L, 3)[..., 0].transpose(2, 1, 0) \
            .reshape(L, -1).astype(jnp.uint32)

    t = timed(chain(digits_op, z0.reshape(L, -1)), z0.reshape(L, -1))
    per = (t - floor) / R
    print(f"digits+untranspose x{R}: {t * 1e3:8.2f} ms -> "
          f"{per * 1e3:8.2f} ms/op", flush=True)

    la0 = 7
    mat0 = jax.block_until_ready(jnp.asarray(
        ntt_mxu.dft_matrix(spec, la0, pow(3, 1))))

    def dftapply_op(a):
        y = ntt_mxu.dft_apply(spec, a.reshape(L, K2, nb2) & np.uint32(0x7FFF),
                              la0, mat0)
        return y.reshape(L, -1)

    t = timed(chain(dftapply_op, z0.reshape(L, -1)), z0.reshape(L, -1))
    per = (t - floor) / R
    print(f"dft_apply(K=128) x{R}: {t * 1e3:8.2f} ms -> "
          f"{per * 1e3:8.2f} ms/op", flush=True)

    def swap_op(a):
        y = a.reshape(L, 128, 8192)
        return jnp.swapaxes(y, 1, 2).reshape(L, -1)

    t = timed(chain(swap_op, z0.reshape(L, -1)), z0.reshape(L, -1))
    per = (t - floor) / R
    print(f"swapaxes(128,8192) x{R}: {t * 1e3:8.2f} ms -> "
          f"{per * 1e3:8.2f} ms/op", flush=True)

    from panda_tpu.fields import mont as _m

    def canon_op(a):
        return _m.canonical(spec, _m.FE(a & np.uint32(0x7FFF), 1 << 15,
                                        ntt_mxu._fold_plan(spec, 7).out_vb))

    t = timed(chain(canon_op, z0.reshape(L, -1)), z0.reshape(L, -1))
    per = (t - floor) / R
    print(f"canonical 2^20 x{R}: {t * 1e3:8.2f} ms -> "
          f"{per * 1e3:8.2f} ms/op", flush=True)

    # --- stagewise jnp engine for contrast --------------------------------
    tables = ntt_ops.make_tables(spec, 20)

    def jnp_op(a):
        return ntt_ops.ntt(spec, a & np.uint32(0x7FFF), tables)

    t = timed(chain(jnp_op, x), x)
    per = (t - floor) / R
    print(f"jnp ntt 2^20 x{R}: {t * 1e3:8.2f} ms -> {per * 1e3:8.2f} ms/op "
          f"= {n / per / 1e6:.1f} M elem/s true", flush=True)


if __name__ == "__main__":
    main()
