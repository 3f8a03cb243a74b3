"""Manager/session + byte-level API tests (the ``unit.rs``/``wrapper.rs``
semantics: init flows, cached inputs, coordinate types, error codes)."""

import jax
import pytest

from panda_tpu.curves.config import BN254
from panda_tpu.fields import codec
from panda_tpu.reference import curve_ref as oracle
from panda_tpu.runtime import api
from panda_tpu.runtime.errors import PandaError, PandaRuntimeError
from panda_tpu.runtime.manager import (InitUnitType, PandaManager,
                                       ResultCoordinateType, device_info,
                                       get_device_number)

N = 16


@pytest.fixture(scope="module")
def case(rng):
    curve = BN254
    pts = [oracle.random_point(curve, rng) for _ in range(N)]
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(N)]
    fp, fr = curve.fp, curve.fr
    bases_blob = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    scalars_blob = b"".join(
        fr.to_wire_int(s).to_bytes(fr.n_bytes, "little") for s in scalars)
    exp = oracle.msm_oracle(curve, pts, scalars)
    return curve, bases_blob, scalars_blob, exp


def _decode_jacobian(curve, blob):
    fp = curve.fp
    nb = fp.n_bytes
    assert len(blob) == 3 * nb
    vals = [fp.from_wire_int(int.from_bytes(blob[i * nb:(i + 1) * nb], "little"))
            for i in range(3)]
    x, y, z = vals
    p = fp.modulus
    if z == 0:
        return None
    zi = pow(z, -1, p)
    return (x * zi * zi % p, y * zi * zi % p * zi % p)


def _decode_projective(curve, blob):
    fp = curve.fp
    nb = fp.n_bytes
    x, y, z = [fp.from_wire_int(int.from_bytes(blob[i * nb:(i + 1) * nb], "little"))
               for i in range(3)]
    p = fp.modulus
    if z == 0:
        return None
    zi = pow(z, -1, p)
    return (x * zi % p, y * zi % p)


def test_device_queries():
    assert get_device_number() >= 1
    info = device_info(0)
    assert info["platform"] == "cpu"


def test_msm_byte_api(case):
    curve, bases, scalars, exp = case
    gm = PandaManager.new(0, curve)
    blob = api.msm(gm, scalars, bases)
    assert _decode_jacobian(curve, blob) == exp


def test_msm_projective_output(case):
    curve, bases, scalars, exp = case
    gm = PandaManager.new(0, curve)
    gm.set_config(ResultCoordinateType.PROJECTIVE)
    blob = api.msm(gm, scalars, bases)
    assert _decode_projective(curve, blob) == exp


def test_msm_cached_variants(case):
    curve, bases, scalars, exp = case
    gm = PandaManager.init_all(0, InitUnitType.MSM, [bases], curve=curve)
    assert len(gm.d_bases) == 1
    assert _decode_jacobian(curve, api.msm_with_cached_bases(gm, scalars, 0)) == exp
    sidx = gm.init_msm_cached_scalars(scalars)
    assert _decode_jacobian(curve, api.msm_with_cached_scalars(gm, bases, sidx)) == exp
    assert _decode_jacobian(curve, api.msm_with_cached_input(gm, sidx, 0)) == exp
    gm.sync()
    gm.deinit()
    assert not gm.d_bases


def test_msm_host_path(case):
    curve, bases, scalars, exp = case
    gm = PandaManager.new(0, curve)
    blob = api.msm_host(gm, scalars, bases)
    assert _decode_jacobian(curve, blob) == exp


def test_ntt_byte_api(rng):
    curve = BN254
    fr = curve.fr
    log_n = 4
    vals = [rng.randrange(fr.modulus) for _ in range(1 << log_n)]
    blob = b"".join(fr.to_wire_int(v).to_bytes(fr.n_bytes, "little")
                    for v in vals)
    gm = PandaManager.init_all(0, InitUnitType.NTT, curve=curve)
    out = api.ntt(gm, blob, log_n)
    back = api.intt(gm, out, log_n)
    # canonical Montgomery bytes of the originals
    exp = b"".join((fr.to_wire_int(v) % fr.modulus).to_bytes(fr.n_bytes, "little")
                   for v in vals)
    assert back == exp

    # v1 entry: caller-supplied omega (Montgomery bytes), reference unit.rs:481
    omega = fr.root_of_unity(log_n)
    omega_blob = fr.to_wire_int(omega).to_bytes(fr.n_bytes, "little")
    out_v1 = api.ntt_v1(gm, blob, log_n, omega_blob)
    assert out_v1 == out


def test_error_codes(case):
    curve, bases, scalars, _ = case
    gm = PandaManager.new(0, curve)
    with pytest.raises(PandaRuntimeError) as e:
        api.msm_with_cached_bases(gm, scalars, 3)
    assert e.value.code == PandaError.INVALID_VALUE
    with pytest.raises(PandaRuntimeError) as e:
        api.msm(gm, scalars[: 2 * curve.fr.n_bytes], bases)
    assert e.value.code == PandaError.INVALID_CONFIGURATION
    with pytest.raises(PandaRuntimeError) as e:
        PandaManager.new(99)
    assert e.value.code == PandaError.INVALID_DEVICE
    with pytest.raises(PandaRuntimeError) as e:
        api.msm_bn254(PandaManager.new(0, "bls12_377"), scalars, bases)
    assert e.value.code == PandaError.UNSUPPORTED_CURVE
