"""Field-kernel property tests vs the Python big-int oracle.

Mirrors the role of the reference's host-path field validation
(``field_host.cuh`` exercised through ``tests/test.rs``): every limb kernel
is checked against an independent big-int implementation, including
adversarial lazy-domain inputs.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.fields import codec, mont
from panda_tpu.fields.config import (ALL_FIELDS, BN254_FP, BN254_FR,
                                     LIMB_BITS, FieldSpec)

N = 32


def _vals(spec, rng, n=N, bound=None):
    bound = bound or 2 * spec.modulus
    vs = [rng.randrange(bound) for _ in range(n - 4)]
    # adversarial corners
    vs += [0, 1, bound - 1, spec.modulus]
    return vs


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_add_sub_mul(spec, rng):
    p = spec.modulus
    av, bv = _vals(spec, rng), _vals(spec, rng)
    a = jnp.asarray(codec.ints_to_limbs(spec, av))
    b = jnp.asarray(codec.ints_to_limbs(spec, bv))

    got = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x, y: mont.add_mod(spec, x, y))(a, b)))
    assert [g % p for g in got] == [(x + y) % p for x, y in zip(av, bv)]

    got = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x, y: mont.sub_mod(spec, x, y))(a, b)))
    assert [g % p for g in got] == [(x - y) % p for x, y in zip(av, bv)]

    got = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x, y: mont.mont_mul(spec, x, y))(a, b)))
    rinv = pow(spec.r, -1, p)
    assert all(g < 2 * p for g in got)
    assert [g % p for g in got] == [x * y * rinv % p for x, y in zip(av, bv)]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_mont_roundtrip_and_canonical(spec, rng):
    p = spec.modulus
    sv = _vals(spec, rng, bound=p)
    s = jnp.asarray(codec.ints_to_limbs(spec, sv))
    m = jax.jit(lambda x: mont.to_mont(spec, x))(s)
    back = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x: mont.from_mont(spec, x))(m)))
    assert back == [v % p for v in sv]
    # canonical() from wider class
    wide = [v + 3 * p for v in sv[:8]]
    w = jnp.asarray(codec.ints_to_limbs(spec, wide))
    got = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x: mont.canonical(spec, mont.fe(spec, x, 8)))(w)))
    assert got == sv[:8]


@pytest.mark.parametrize("spec", [BN254_FP, BN254_FR], ids=lambda s: s.name)
def test_inverse_and_pow(spec, rng):
    p = spec.modulus
    sv = [rng.randrange(1, p) for _ in range(8)]
    m = jnp.asarray(codec.ints_to_limbs(spec, [v * spec.r % p for v in sv]))
    inv = jax.jit(lambda x: mont.mont_inv(spec, x))(m)
    prod = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x, y: mont.from_mont(spec, mont.mont_mul(spec, x, y)))(m, inv)))
    assert all(v == 1 for v in prod)

    bi = jax.jit(lambda x: mont.batch_inverse(spec, x))(m)
    prod = codec.limbs_to_ints(spec, np.asarray(
        jax.jit(lambda x, y: mont.from_mont(spec, mont.mont_mul(spec, x, y)))(m, bi)))
    assert all(v == 1 for v in prod)


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_fe_bounds_tracking(spec, rng):
    """Deep add/sub chains stay exact thanks to static bound tracking."""
    p = spec.modulus
    av = [rng.randrange(p) for _ in range(8)]
    bv = [rng.randrange(p) for _ in range(8)]
    a = jnp.asarray(codec.ints_to_limbs(spec, av))
    b = jnp.asarray(codec.ints_to_limbs(spec, bv))

    def chain(x, y):
        fx, fy = mont.fe(spec, x), mont.fe(spec, y)
        acc = fx
        for _ in range(6):
            acc = mont.add(spec, acc, fy)        # no norm between adds
            acc = mont.sub(spec, acc, fx)
        return mont.canonical(spec, acc)

    got = codec.limbs_to_ints(spec, np.asarray(jax.jit(chain)(a, b)))
    exp = [(x + 6 * y - 6 * x) % p for x, y in zip(av, bv)]
    assert got == exp


def test_codec_bytes_roundtrip(rng):
    for spec in ALL_FIELDS:
        vals = [rng.randrange(spec.modulus) for _ in range(16)]
        limbs = codec.ints_to_limbs(spec, vals)
        blob = codec.limbs_to_bytes(spec, limbs)
        assert len(blob) == 16 * spec.n_bytes
        back = codec.bytes_to_limbs(spec, blob)
        assert codec.limbs_to_ints(spec, back) == vals


def test_codec_reference_layout():
    """LE byte layout matches the reference's transmute convention
    (``utils.rs``): plain little-endian over the full element width."""
    spec = BN254_FP
    v = 0x0123456789ABCDEF_FEDCBA9876543210_0011223344556677_8899AABBCCDDEEFF
    blob = codec.limbs_to_bytes(spec, codec.ints_to_limbs(spec, [v]))
    assert blob == v.to_bytes(32, "little")


def test_point_codec_roundtrip(rng):
    spec = BN254_FP
    xs = [rng.randrange(spec.modulus) for _ in range(4)]
    ys = [rng.randrange(spec.modulus) for _ in range(4)]
    blob = b"".join(
        x.to_bytes(32, "little") + y.to_bytes(32, "little")
        for x, y in zip(xs, ys))
    px, py = codec.points_bytes_to_limbs(spec, blob)
    assert codec.limbs_to_ints(spec, px) == xs
    assert codec.limbs_to_ints(spec, py) == ys


def test_canonical_kernel_path_bit_identical():
    """The one-kernel canonical (fmul by rep(1) + in-kernel cond_sub,
    interpret mode) vs the jnp ladder path — bit-identical on the NTT
    engine's loose-bound output class."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from panda_tpu.fields import codec, mont
    from panda_tpu.fields.config import BN254_FR as spec, limbs_to_int
    from panda_tpu.ops import backend
    pr = random.Random(6)
    N = 1024
    vb = (1 << 9) * spec.modulus
    vals = [pr.randrange(vb) for _ in range(N)]
    v = jnp.asarray(codec.ints_to_limbs(spec, vals))
    with backend.forced("interpret"):
        got = np.asarray(mont.canonical(spec, mont.FE(v, 1 << 15, vb)))
    with backend.forced("off"):
        ref = np.asarray(mont.canonical(spec, mont.FE(v, 1 << 15, vb)))
    assert np.array_equal(got, ref)
    p = spec.modulus
    for j in range(0, N, 97):
        assert limbs_to_int(got[:, j]) == vals[j] % p
