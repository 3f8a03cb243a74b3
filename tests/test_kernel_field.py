"""Direct (kernel-free) validation of ops/kernel_field limb-list math.

The limb-list helpers are plain jnp ops on (8, 128) uint32 tiles, so they
run outside any pallas_call — this checks the lazy column accumulator
(`_Cols`), `_mul`, `_mul2` and the point formulas against the Python
big-int oracle on every backend, not just TPU.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.curves.config import BLS12_377, BN254
from panda_tpu.fields.config import LIMB_BITS, LIMB_MASK
from panda_tpu.ops import kernel_field as kf
from panda_tpu.reference import curve_ref

CURVES = [BN254, BLS12_377]


def _tiles(spec, values):
    """ints -> limb list of (8, 128) tiles, value v at lane (0, 0),
    random other lanes (same value broadcast keeps the check simple:
    use per-lane values)."""
    out = []
    for i in range(spec.n_limbs):
        plane = np.zeros((8, 128), np.uint32)
        for j, v in enumerate(values):
            plane[j // 128, j % 128] = (v >> (LIMB_BITS * i)) & LIMB_MASK
        out.append(jnp.asarray(plane))
    return out


def _ints(spec, tiles, count):
    arrs = [np.asarray(t) for t in tiles]
    vals = []
    for j in range(count):
        v = sum(int(a[j // 128, j % 128]) << (LIMB_BITS * i)
                for i, a in enumerate(arrs))
        vals.append(v)
    return vals


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_mul_and_mul2_vs_oracle(curve, rng):
    f = curve.fp
    n = 64
    xs = [rng.randrange(2 * f.modulus) for _ in range(n)]
    ys = [rng.randrange(2 * f.modulus) for _ in range(n)]
    us = [rng.randrange(2 * f.modulus) for _ in range(n)]
    vs = [rng.randrange(2 * f.modulus) for _ in range(n)]
    mk = lambda vals: kf.LF(_tiles(f, vals), 1 << LIMB_BITS, 2 * f.modulus)
    a, b, c, d = mk(xs), mk(ys), mk(us), mk(vs)
    rinv = pow(f.r, -1, f.modulus)

    got = _ints(f, kf._mul(f, a, b).v, n)
    for g, x, y in zip(got, xs, ys):
        assert g % f.modulus == x * y * rinv % f.modulus
        assert g < 2 * f.modulus

    for sub in (False, True):
        got = _ints(f, kf._mul2(f, a, b, c, d, sub=sub).v, n)
        for g, x, y, u, v in zip(got, xs, ys, us, vs):
            want = (x * y + (-1 if sub else 1) * u * v) * rinv % f.modulus
            assert g % f.modulus == want
            assert g < 2 * f.modulus


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_mul_unnormalized_operands(curve, rng):
    """Operands with limbs in [0, 2^16) (lb = 2^16 class) multiply
    correctly — exercises the _need15 normalization path."""
    f = curve.fp
    n = 32
    # Build values whose limbs are deliberately in the 16-bit range by
    # summing two canonical-limb values (lb tracks 2^16).
    xs = [rng.randrange(2 * f.modulus) for _ in range(n)]
    ys = [rng.randrange(2 * f.modulus) for _ in range(n)]
    zs = [rng.randrange(2 * f.modulus) for _ in range(n)]
    ta, tb, tc = _tiles(f, xs), _tiles(f, ys), _tiles(f, zs)
    ab = kf.LF([x + y for x, y in zip(ta, tb)],
               2 * ((1 << LIMB_BITS) - 1) + 1, 4 * f.modulus)
    c = kf.LF(tc, 1 << LIMB_BITS, 2 * f.modulus)
    rinv = pow(f.r, -1, f.modulus)
    got = _ints(f, kf._mul(f, ab, c).v, n)
    for g, x, y, z in zip(got, xs, ys, zs):
        assert g % f.modulus == (x + y) * z * rinv % f.modulus


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_madd_padd_pdbl_vs_oracle(curve, rng):
    f = curve.fp
    n = 16
    rinv = pow(f.r, -1, f.modulus)

    # Random points as small multiples of the generator.
    g = (curve.gen_x, curve.gen_y)
    pts = []
    acc = None
    for _ in range(2 * n):
        acc = curve_ref.ec_add(curve, acc, g)
        pts.append(acc)
    random.Random(7).shuffle(pts)
    p_aff, q_aff = pts[:n], pts[n:]

    tom = lambda v: v * f.r % f.modulus
    px = _tiles(f, [tom(x) for x, _ in p_aff])
    py = _tiles(f, [tom(y) for _, y in p_aff])
    pz = _tiles(f, [tom(1)] * n)
    qx = _tiles(f, [tom(x) for x, _ in q_aff])
    qy = _tiles(f, [tom(y) for _, y in q_aff])

    def check(res, want_pts):
        gx = _ints(f, res[0], n)
        gy = _ints(f, res[1], n)
        gz = _ints(f, res[2], n)
        for xg, yg, zg, want in zip(gx, gy, gz, want_pts):
            z = zg * rinv % f.modulus
            assert z != 0
            zi = pow(z, -1, f.modulus)
            x = xg * rinv * zi % f.modulus
            y = yg * rinv * zi % f.modulus
            assert (x, y) == want

    check(kf._madd(curve, px, py, pz, qx, qy),
          [curve_ref.ec_add(curve, p, q) for p, q in zip(p_aff, q_aff)])
    qz = _tiles(f, [tom(1)] * n)
    check(kf._padd(curve, px, py, pz, qx, qy, qz),
          [curve_ref.ec_add(curve, p, q) for p, q in zip(p_aff, q_aff)])
    check(kf._pdbl(curve, px, py, pz),
          [curve_ref.ec_add(curve, p, p) for p in p_aff])
