"""Complete-formula point arithmetic vs the Python affine oracle.

Covers the exceptional cases the reference handles with branches
(``projective.cuh:163-314``): identity operands, P+P, P+(-P) — our complete
formulas must get all of them right with no special-casing.
"""

import jax
import jax.numpy as jnp
import pytest

from panda_tpu.curves import point as cp
from panda_tpu.curves.config import BLS12_377, BN254
from panda_tpu.reference import curve_ref as oracle
from tests.conftest import points_to_device, proj_to_oracle

CURVES = [BN254, BLS12_377]
N = 8


@pytest.fixture(scope="module")
def data(rng):
    out = {}
    for curve in CURVES:
        pts = [oracle.random_point(curve, rng) for _ in range(N)]
        qts = [oracle.random_point(curve, rng) for _ in range(N)]
        px, py = points_to_device(curve, pts)
        qx, qy = points_to_device(curve, qts)
        out[curve.name] = (pts, qts,
                           cp.from_affine(curve, cp.AffinePoint(px, py)),
                           cp.from_affine(curve, cp.AffinePoint(qx, qy)),
                           cp.AffinePoint(qx, qy))
    return out


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_on_curve(curve):
    assert oracle.is_on_curve(curve, (curve.gen_x, curve.gen_y))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_dbl_madd(curve, data):
    pts, qts, P, Q, Qaff = data[curve.name]
    exp = [oracle.ec_add(curve, a, b) for a, b in zip(pts, qts)]
    assert proj_to_oracle(curve, jax.jit(
        lambda a, b: cp.add(curve, a, b))(P, Q)) == exp
    assert proj_to_oracle(curve, jax.jit(
        lambda a, b: cp.madd(curve, a, b))(P, Qaff)) == exp
    exp_d = [oracle.ec_add(curve, a, a) for a in pts]
    assert proj_to_oracle(curve, jax.jit(
        lambda a: cp.dbl(curve, a))(P)) == exp_d
    # complete: add(P, P) == dbl(P) with zero branches
    assert proj_to_oracle(curve, jax.jit(
        lambda a, b: cp.add(curve, a, b))(P, P)) == exp_d


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_exceptional_cases(curve, data):
    pts, qts, P, Q, Qaff = data[curve.name]
    I = cp.identity(curve, (N,))
    addf = jax.jit(lambda a, b: cp.add(curve, a, b))
    assert proj_to_oracle(curve, addf(I, Q)) == qts
    assert proj_to_oracle(curve, addf(P, I)) == pts
    assert proj_to_oracle(curve, jax.jit(
        lambda a, b: cp.madd(curve, a, b))(I, Qaff)) == qts
    negP = jax.jit(lambda a: cp.neg(curve, a))(P)
    assert proj_to_oracle(curve, negP) == [oracle.ec_neg(curve, a) for a in pts]
    assert proj_to_oracle(curve, addf(P, negP)) == [None] * N
    assert proj_to_oracle(curve, jax.jit(lambda a: cp.dbl(curve, a))(I)) == [None] * N


@pytest.mark.parametrize(
    "curve",
    [BN254,
     # The 26-limb scalar-mul graphs cost 10+ min of XLA CPU compile on
     # this 1-core host; BLS12-377 scalar paths are exercised at scale on
     # the chip (TPU_CHECKS_r03.json) and by the other curve tests here.
     pytest.param(BLS12_377, marks=pytest.mark.slow)],
    ids=lambda c: c.name)
def test_fold_and_scalar_mul(curve, data, rng):
    pts, _, P, _, _ = data[curve.name]
    exp = pts[0]
    for t in pts[1:]:
        exp = oracle.ec_add(curve, exp, t)
    got = proj_to_oracle(curve, jax.jit(lambda a: cp.fold_sum(curve, a))(P))
    assert got[0] == exp

    # Full-width scalar through the scan-based ladder (one loop body to
    # compile) plus a small static scalar through the unrolled
    # scalar_mul_int (whose graph size grows with the scalar width).
    k = rng.randrange(1, curve.fr.modulus)
    from panda_tpu.fields.config import int_to_limbs
    kl = jnp.asarray(int_to_limbs(k, curve.fr.n_limbs))
    got = proj_to_oracle(curve, jax.jit(
        lambda a, kk: cp.scalar_mul(curve, a, kk))(P, kl))
    assert got == [oracle.ec_mul(curve, a, k) for a in pts]

    ks = rng.randrange(1, 1 << 16)
    got = proj_to_oracle(curve, jax.jit(
        lambda a: cp.scalar_mul_int(curve, a, ks))(P))
    assert got == [oracle.ec_mul(curve, a, ks) for a in pts]


def test_jacobian_and_projective_conversions(data):
    """to_jacobian must produce valid Jacobian coords of the same point,
    matching the reference's output contract (tests/test.rs:87-108)."""
    curve = BN254
    pts, _, P, _, _ = data[curve.name]
    from tests.conftest import from_mont_limbs
    xj, yj, zj = jax.jit(lambda a: cp.to_jacobian(curve, a))(P)
    from panda_tpu.fields import mont
    f = curve.fp
    p = f.modulus
    xs = from_mont_limbs(f, jax.jit(lambda a: mont.canonical(f, mont.fe(f, a, 8)))(xj))
    ys = from_mont_limbs(f, jax.jit(lambda a: mont.canonical(f, mont.fe(f, a, 8)))(yj))
    zs = from_mont_limbs(f, jax.jit(lambda a: mont.canonical(f, mont.fe(f, a, 8)))(zj))
    for (ex, ey), x, y, z in zip(pts, xs, ys, zs):
        zi = pow(z, -1, p)
        assert x * zi * zi % p == ex
        assert y * zi * zi % p * zi % p == ey
