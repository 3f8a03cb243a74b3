"""Kernel/fallback equivalence of the fused MSM pipeline on CPU.

``kernels="interpret"`` runs the real Pallas kernels (phase-A scan, digit
recode, weighted scan, point kernels) under the Pallas interpreter, so
the TPU code path is exercised by the CPU suite — the analog of the
reference validating its device pipeline against the host path
(``/root/reference/tests/test.rs:115``).

The mode is passed as an EXPLICIT pipeline argument (not env-at-trace
time): the round-2 version of this test flipped PANDA_PALLAS between two
jits of the same function and jax's trace cache silently returned the
first executable, comparing the fallback with itself.  Each A/B test now
also asserts the traced jaxpr structurally contains / lacks pallas_call,
so a regression to a vacuous comparison fails loudly.
"""

import numpy as np
import pytest

from panda_tpu.curves.config import BN254
from panda_tpu.fields import codec
from panda_tpu.ops import msm as msm_ops
from panda_tpu.reference import curve_ref

from conftest import points_to_device, to_mont_limbs


def _inputs(rng, n, pool=32, full_range=True):
    curve = BN254
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(pool):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    pts = [table[rng.randrange(pool)] for _ in range(n)]
    px, py = points_to_device(curve, pts)
    top = curve.fr.modulus if full_range else 1 << 62
    scalars = [rng.randrange(top) for _ in range(n)]
    sc = to_mont_limbs(curve.fr, scalars)
    return pts, scalars, px, py, sc


def _has_pallas(jaxpr) -> bool:
    return "pallas_call" in str(jaxpr)


def test_pack_words_roundtrip(rng):
    """pack_coords_words -> row gather -> split_words -> in-kernel word
    unpack must reproduce the original limbs EXACTLY under the DEFAULT
    jax config (x64 off).

    Regression test for the round-2 corruption: the u64-row variant of
    the pack truncated to uint32 under jax_enable_x64=False, zeroing
    every odd 32-bit word of every coordinate.
    """
    import jax
    import jax.numpy as jnp
    from panda_tpu.ops import phase_a_pallas as pa

    assert not jax.config.jax_enable_x64
    fp = BN254.fp
    n = 256
    vals = [rng.randrange(2 * fp.modulus - 1) for _ in range(n)]
    valsy = [rng.randrange(2 * fp.modulus - 1) for _ in range(n)]
    px = jnp.asarray(codec.ints_to_limbs(fp, vals))
    py = jnp.asarray(codec.ints_to_limbs(fp, valsy))

    def roundtrip(px, py):
        pk = pa.pack_coords_words(fp, px, py)
        assert pk.dtype == jnp.uint32          # trace-time dtype guard
        idx = jnp.arange(n, dtype=jnp.uint32)[::-1]
        q = jnp.take(pk, idx.reshape(1, 1, 2, 128), axis=0)
        q5 = pa.split_words(q)                 # (2*W32, 1, 1, 2, 128)
        W32 = pa.n_words32(fp)
        rows = [q5[i] for i in range(2 * W32)]
        qx = pa._unpack_words(fp, rows[:W32])
        qy = pa._unpack_words(fp, rows[W32:])
        return jnp.stack(qx).reshape(fp.n_limbs, n), \
            jnp.stack(qy).reshape(fp.n_limbs, n)

    gx, gy = jax.jit(roundtrip)(px, py)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(px)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(py)[:, ::-1])
    # Value-level check against the plain integers, independent of the
    # limb codec: every word of every coordinate survives.
    got = codec.limbs_to_ints(fp, np.asarray(gx))
    assert got == vals[::-1]


def test_kernel_gate_structure(rng):
    """Cheap structural gate check in the default suite: tracing the
    pipeline with kernels='interpret' yields pallas_call ops, 'off' does
    not — guarantees the explicit mode argument really switches paths
    (the regression class behind round 2's vacuous A/B)."""
    import jax
    n, c, lanes = 1024, 8, 32
    _, _, px, py, sc = _inputs(rng, n, pool=4)

    def pipeline(kmode):
        def fn(px, py, sc):
            mags, negs = msm_ops.signed_digit_arrays(
                BN254.fr, sc, c, kernels=kmode)
            return tuple(msm_ops.window_sums(
                BN254, px, py, mags, c, signs=negs, lanes=lanes,
                kernels=kmode))
        return fn

    assert _has_pallas(jax.make_jaxpr(pipeline("interpret"))(px, py, sc))
    assert not _has_pallas(jax.make_jaxpr(pipeline("off"))(px, py, sc))


@pytest.mark.slow   # Pallas interpret mode costs >10 min for even a
                    # one-tile kernel on this 1-core host (measured); the
                    # authoritative kernel-vs-fallback A/B runs compiled
                    # on the TPU in tools/tpu_checks.py (recorded in
                    # TPU_CHECKS_r03.json) and bench.py's oracle gates.
def test_phase_a_scan_tiles_direct(rng):
    """The fused phase-A scan kernel (interpreted) against the lax.scan
    fallback branch, on one tiny (S, T) tile problem — a direct unit test
    of phase_a_scan_tiles I/O (emission slots, packed emissions, tails),
    not routed through _bucket_tables."""
    import jax
    import jax.numpy as jnp
    from panda_tpu.curves.point import ProjPoint
    from panda_tpu.ops import phase_a_pallas as pa
    from conftest import proj_to_oracle

    curve = BN254
    n, c, m = 64, 4, 16         # W=64 windows; 64*16 = 1024 — one tile
    pts, scalars, px, py, sc = _inputs(rng, n, pool=8)
    mags, negs = jax.jit(lambda s: msm_ops.signed_digit_arrays(
        BN254.fr, s, c, kernels="off"))(sc)
    W = mags.shape[0]
    assert (W * m) % 1024 == 0

    def tables(kmode):
        return jax.jit(lambda a, b, d, s: tuple(msm_ops._bucket_tables(
            curve, a, b, d, c, m, signs=s, kernels=kmode)))

    jx_int = jax.make_jaxpr(tables("interpret"))(px, py, mags, negs)
    jx_off = jax.make_jaxpr(tables("off"))(px, py, mags, negs)
    assert _has_pallas(jx_int) and not _has_pallas(jx_off)

    got = tables("interpret")(px, py, mags, negs)
    ref = tables("off")(px, py, mags, negs)
    ref_pts = proj_to_oracle(curve, ProjPoint(*ref))
    got_pts = proj_to_oracle(curve, ProjPoint(*got))
    assert got_pts == ref_pts


@pytest.mark.slow   # see test_phase_a_scan_tiles_direct's marker note
def test_window_sums_kernel_matches_fallback(rng):
    """window_sums via interpreted Pallas kernels == jnp/lax fallback,
    and both match the big-int oracle.  Sizes are the smallest that keep
    every kernel eligible: n = 1024 (the recode kernel needs n % 1024
    == 0) at c = 8 (W = 32 windows) with 32 lanes — phase-A interpret
    cost scales with W*n/1024 tile-steps, and interpret-mode Pallas
    costs minutes per extra tile-step batch on this 1-core host; the
    larger-shape behavior is covered on real hardware by bench.py's
    always-on oracle gates."""
    n, c, lanes = 1024, 8, 32
    pts, scalars, px, py, sc = _inputs(rng, n)

    import jax

    def pipeline(kmode):
        def fn(px, py, sc):
            mags, negs = msm_ops.signed_digit_arrays(
                BN254.fr, sc, c, kernels=kmode)
            return (mags, negs) + tuple(msm_ops.window_sums(
                BN254, px, py, mags, c, signs=negs, lanes=lanes,
                kernels=kmode))
        return fn

    # Structural gate check: the interpret trace must contain Pallas
    # kernels; the fallback trace must not.
    assert _has_pallas(jax.make_jaxpr(pipeline("interpret"))(px, py, sc))
    assert not _has_pallas(jax.make_jaxpr(pipeline("off"))(px, py, sc))

    mags, negs, *ref = [np.asarray(a)
                        for a in jax.jit(pipeline("off"))(px, py, sc)]
    mags_k, negs_k, *got = [np.asarray(a)
                            for a in jax.jit(pipeline("interpret"))(px, py, sc)]
    np.testing.assert_array_equal(mags_k, mags)
    np.testing.assert_array_equal(negs_k, negs)

    # The kernel's fused _mul2 point formulas are equal mod p but not
    # bit-identical to the XLA path, so compare as curve points.
    from panda_tpu.curves.point import ProjPoint
    from conftest import proj_to_oracle
    ref_pts = proj_to_oracle(
        BN254, ProjPoint(*(np.transpose(a) for a in ref)))
    got_pts = proj_to_oracle(
        BN254, ProjPoint(*(np.transpose(a) for a in got)))
    assert got_pts == ref_pts

    # Oracle check of the full MSM through the Horner tail (sum of
    # scalar-weighted points; the pool structure keeps the oracle cheap:
    # sum per distinct point first).
    total = msm_ops.host_horner(BN254, list(got), c)
    agg = {}
    for p, s in zip(pts, scalars):
        agg[p] = (agg.get(p, 0) + s) % BN254.fr.modulus
    want = curve_ref.msm_oracle(BN254, list(agg), list(agg.values()))
    assert total == want
