"""Pure-Python elliptic curve oracle (affine coordinates, big ints).

Independent of both the limb kernels and the complete-formula point code;
plays the role of the arkworks CPU oracle in the reference's tests
(``/root/reference/tests/test.rs:64``).
"""

from __future__ import annotations

from ..curves.config import CurveSpec

INF = None  # affine identity


def is_on_curve(curve: CurveSpec, pt):
    if pt is INF:
        return True
    x, y = pt
    p = curve.fp.modulus
    return (y * y - x * x * x - curve.b) % p == 0


def ec_add(curve: CurveSpec, a, b):
    p = curve.fp.modulus
    if a is INF:
        return b
    if b is INF:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return INF
        # doubling
        lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def ec_neg(curve: CurveSpec, a):
    if a is INF:
        return INF
    return (a[0], (-a[1]) % curve.fp.modulus)


def ec_mul(curve: CurveSpec, a, k: int):
    k %= curve.fr.modulus
    acc = INF
    while k:
        if k & 1:
            acc = ec_add(curve, acc, a)
        a = ec_add(curve, a, a)
        k >>= 1
    return acc


def random_point(curve: CurveSpec, rng):
    """Random curve point as a random multiple of the generator."""
    g = (curve.gen_x, curve.gen_y)
    return ec_mul(curve, g, rng.randrange(1, curve.fr.modulus))


def msm_oracle(curve: CurveSpec, points, scalars):
    """Textbook MSM: sum scalar_i * P_i over affine int points."""
    acc = INF
    for pt, s in zip(points, scalars):
        acc = ec_add(curve, acc, ec_mul(curve, pt, s))
    return acc
