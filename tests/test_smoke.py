"""Smoke tier: one fast canary per load-bearing path.

``pytest -m smoke`` is the CI-cadence gate on this 1-core host (the full
default gate re-derives correctness exhaustively but costs >1h of XLA CPU
compiles; authoritative kernel/large-size coverage lives in the on-chip
sweep, tools/tpu_checks.py).  Every canary here uses tiny shapes so each
jitted graph compiles in seconds and stays in the persistent cache.

Paths covered: field arithmetic, point formulas, MSM pipeline, NTT/INTT,
byte codec, byte-level runtime API + error codes, native host library.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.curves import point as cp
from panda_tpu.curves.config import BN254
from panda_tpu.fields import codec, mont
from panda_tpu.ops import msm as msm_ops
from panda_tpu.ops import ntt as ntt_ops
from panda_tpu.reference import curve_ref as oracle
from panda_tpu.reference import ntt_ref
from panda_tpu.runtime import api
from panda_tpu.runtime.errors import PandaError, PandaRuntimeError
from panda_tpu.runtime.manager import PandaManager
from tests.conftest import (from_mont_limbs, points_to_device,
                            proj_to_oracle, to_mont_limbs)

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def r():
    return random.Random(20260820)


def test_field_mul_add_sub(r):
    spec = BN254.fr
    a = [r.randrange(spec.modulus) for _ in range(8)]
    b = [r.randrange(spec.modulus) for _ in range(8)]
    da, db = to_mont_limbs(spec, a), to_mont_limbs(spec, b)

    @jax.jit
    def f(x, y):
        fx = mont.FE(x, 1 << 15, spec.modulus)
        fy = mont.FE(y, 1 << 15, spec.modulus)
        return (mont.canonical(spec, mont.mul(spec, fx, fy)),
                mont.canonical(spec, mont.add(spec, fx, fy)),
                mont.canonical(spec, mont.sub(spec, fx, fy)))

    m, s, d = f(da, db)
    p = spec.modulus
    assert from_mont_limbs(spec, m) == [x * y % p for x, y in zip(a, b)]
    assert from_mont_limbs(spec, s) == [(x + y) % p for x, y in zip(a, b)]
    assert from_mont_limbs(spec, d) == [(x - y) % p for x, y in zip(a, b)]


def test_point_add_dbl_madd(r):
    curve = BN254
    pts = [oracle.random_point(curve, r) for _ in range(4)]
    qts = [oracle.random_point(curve, r) for _ in range(4)]
    px, py = points_to_device(curve, pts)
    qx, qy = points_to_device(curve, qts)

    @jax.jit
    def f(ax, ay, bx, by):
        a = cp.ProjPoint(ax, ay, jnp.broadcast_to(
            jnp.asarray(curve.fp.mont_limbs(1))[:, None], ax.shape))
        return (cp.add(curve, a, cp.ProjPoint(bx, by, a.z)),
                cp.dbl(curve, a),
                cp.madd(curve, a, cp.AffinePoint(bx, by)))

    s, d, md = f(px, py, qx, qy)
    exp_add = [oracle.ec_add(curve, a, b) for a, b in zip(pts, qts)]
    exp_dbl = [oracle.ec_add(curve, a, a) for a in pts]
    assert proj_to_oracle(curve, s) == exp_add
    assert proj_to_oracle(curve, d) == exp_dbl
    assert proj_to_oracle(curve, md) == exp_add


def test_msm_small(r):
    curve = BN254
    n = 32
    pts = [oracle.random_point(curve, r) for _ in range(n)]
    scalars = [r.randrange(curve.fr.modulus) for _ in range(n)]
    px, py = points_to_device(curve, pts)
    s = to_mont_limbs(curve.fr, scalars)
    res = jax.jit(lambda a, b, d: msm_ops.msm(curve, a, b, d, c=5))(px, py, s)
    got = proj_to_oracle(curve, cp.ProjPoint(*(a[:, None] for a in res)))[0]
    assert got == oracle.msm_oracle(curve, pts, scalars)


def test_ntt_roundtrip_and_oracle(r):
    spec, log_n = BN254.fr, 4
    vals = [r.randrange(spec.modulus) for _ in range(1 << log_n)]
    tables = ntt_ops.make_tables(spec, log_n)
    x = to_mont_limbs(spec, vals)
    y = ntt_ops.run_ntt(spec, x, tables)
    assert from_mont_limbs(spec, y) == ntt_ref.ntt_oracle(
        spec, vals, spec.root_of_unity(log_n))
    back = from_mont_limbs(
        spec, ntt_ops.run_ntt(spec, jnp.asarray(y), tables, inverse=True))
    assert back == vals


def test_codec_roundtrip(r):
    spec = BN254.fp
    vals = [r.randrange(spec.modulus) for _ in range(8)]
    blob = b"".join(v.to_bytes(spec.n_bytes, "little") for v in vals)
    limbs = codec.bytes_to_limbs(spec, blob)
    assert codec.limbs_to_bytes(spec, np.asarray(limbs)) == blob
    assert codec.limbs_to_ints(spec, np.asarray(limbs)) == vals


def test_byte_api_and_errors(r):
    curve = BN254
    fp, fr = curve.fp, curve.fr
    n = 16
    pts = [oracle.random_point(curve, r) for _ in range(n)]
    scalars = [r.randrange(fr.modulus) for _ in range(n)]
    bases_blob = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    scalars_blob = b"".join(
        fr.to_wire_int(s).to_bytes(fr.n_bytes, "little") for s in scalars)
    gm = PandaManager.new(0, curve)
    blob = api.msm(gm, scalars_blob, bases_blob)
    nb = fp.n_bytes
    x, y, z = (fp.from_wire_int(int.from_bytes(blob[i*nb:(i+1)*nb], "little"))
               for i in range(3))
    p = fp.modulus
    zi = pow(z, -1, p)
    got = (x * zi * zi % p, y * zi * zi % p * zi % p)
    assert got == oracle.msm_oracle(curve, pts, scalars)
    with pytest.raises(PandaRuntimeError) as e:
        api.msm(gm, scalars_blob[:7], bases_blob)
    assert e.value.code == PandaError.INVALID_CONFIGURATION
    with pytest.raises(PandaRuntimeError) as e:
        api.msm_with_cached_bases(gm, scalars_blob, 0)
    assert e.value.code == PandaError.INVALID_VALUE


def test_native_host_lib(r):
    from panda_tpu.interop import native
    if not native.available():
        pytest.skip("native lib not built")
    curve = BN254
    fp, fr = curve.fp, curve.fr
    pts = [oracle.random_point(curve, r) for _ in range(4)]
    scalars = [r.randrange(fr.modulus) for _ in range(4)]
    bases_blob = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    scalars_blob = b"".join(
        fr.to_wire_int(s).to_bytes(fr.n_bytes, "little") for s in scalars)
    blob = native.msm_host(curve, scalars_blob, bases_blob, 0)
    nb = fp.n_bytes
    x, y, z = (fp.from_wire_int(int.from_bytes(blob[i*nb:(i+1)*nb], "little"))
               for i in range(3))
    p = fp.modulus
    exp = oracle.msm_oracle(curve, pts, scalars)
    zi = pow(z, -1, p)
    assert (x * zi * zi % p, y * zi * zi % p * zi % p) == exp
