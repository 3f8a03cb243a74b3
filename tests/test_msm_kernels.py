"""Kernel/fallback equivalence of the fused MSM pipeline on CPU.

PANDA_PALLAS=interpret runs the real Pallas kernels (phase-A scan, digit
recode, weighted scan, point kernels) under the Pallas interpreter, so
the TPU code path is exercised by the CPU suite — the analog of the
reference validating its device pipeline against the host path
(``/root/reference/tests/test.rs:115``).
"""

import numpy as np
import pytest

from panda_tpu.curves.config import BN254
from panda_tpu.fields import codec
from panda_tpu.ops import msm as msm_ops
from panda_tpu.reference import curve_ref

from conftest import points_to_device, to_mont_limbs


def _inputs(rng, n):
    import jax.numpy as jnp
    curve = BN254
    g = (curve.gen_x, curve.gen_y)
    acc, table = None, []
    for _ in range(32):
        acc = curve_ref.ec_add(curve, acc, g)
        table.append(acc)
    pts = [table[rng.randrange(32)] for _ in range(n)]
    px, py = points_to_device(curve, pts)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    sc = to_mont_limbs(curve.fr, scalars)
    return pts, scalars, px, py, sc


def test_window_sums_kernel_matches_fallback(rng, monkeypatch):
    """window_sums via interpreted Pallas kernels == jnp/lax fallback,
    and both match the big-int oracle."""
    n, c = 1024, 4                   # W * lanes = 64 * 256 — kernel-eligible
    pts, scalars, px, py, sc = _inputs(rng, n)

    import jax

    # Eager dispatch is pathologically slow; jit both paths (the kernel
    # gating reads the env at TRACE time, so set it before each trace).
    def pipeline(px, py, sc):
        mags, negs = msm_ops.signed_digit_arrays(BN254.fr, sc, c)
        return (mags, negs) + tuple(msm_ops.window_sums(
            BN254, px, py, mags, c, signs=negs))

    monkeypatch.setenv("PANDA_PALLAS", "0")
    mags, negs, *ref = [np.asarray(a)
                        for a in jax.jit(pipeline)(px, py, sc)]

    monkeypatch.setenv("PANDA_PALLAS", "interpret")
    mags_k, negs_k, *got = [np.asarray(a)
                            for a in jax.jit(pipeline)(px, py, sc)]
    np.testing.assert_array_equal(mags_k, mags)
    np.testing.assert_array_equal(negs_k, negs)

    # The kernel's fused _mul2 point formulas are equal mod p but not
    # bit-identical to the XLA path, so compare as curve points.
    from panda_tpu.curves.point import ProjPoint
    from conftest import proj_to_oracle
    monkeypatch.setenv("PANDA_PALLAS", "0")
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
