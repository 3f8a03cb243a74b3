"""Native C++ host pipeline (libpanda_host.so) through the session C ABI.

Mirrors the role of the reference's CPU path tests
(``tests/test.rs:115-194`` exercising ``panda_msm_bn254_gpu_host``) plus the
session semantics of ``PandaGpuManager`` (cached inputs, coordinate config).
"""

import random

import pytest

import panda_tpu
from panda_tpu.interop import native
from panda_tpu.reference import curve_ref, ntt_ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _blobs(curve, rng, n):
    fp, fr = curve.fp, curve.fr
    pts = [curve_ref.random_point(curve, rng) for _ in range(n)]
    scalars = [rng.randrange(fr.modulus) for _ in range(n)]
    bases = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    sblob = b"".join(fr.to_wire_int(s).to_bytes(fr.n_bytes, "little")
                     for s in scalars)
    return pts, scalars, bases, sblob


@pytest.mark.parametrize(
    "curve", [panda_tpu.BN254, panda_tpu.BLS12_377, panda_tpu.BLS12_381],
    ids=lambda c: c.name)
def test_session_msm_cached(curve, rng):
    fp = curve.fp
    pts, scalars, bases, sblob = _blobs(curve, rng, 24)
    exp = curve_ref.msm_oracle(curve, pts, scalars)
    p = fp.modulus
    with native.NativeSession(curve) as sess:
        assert sess.device_count() == 1
        bi = sess.cache_bases(bases)
        si = sess.cache_scalars(sblob)
        blob = sess.msm(si, bi)
        nb = fp.n_bytes
        x, y, z = (fp.from_wire_int(int.from_bytes(
            blob[i * nb:(i + 1) * nb], "little")) for i in range(3))
        zi = pow(z, -1, p)
        assert (x * zi * zi % p, y * zi * zi * zi % p) == exp
        # fresh bytes give the identical result
        assert sess.msm(sblob, bases) == blob
        # projective output mode
        sess.set_config(1)
        blob = sess.msm(si, bi)
        x, y, z = (fp.from_wire_int(int.from_bytes(
            blob[i * nb:(i + 1) * nb], "little")) for i in range(3))
        zi = pow(z, -1, p)
        assert (x * zi % p, y * zi % p) == exp


def test_session_ntt_roundtrip_and_oracle(rng):
    curve = panda_tpu.BN254
    fr = curve.fr
    log_n, n = 5, 32
    vals = [rng.randrange(fr.modulus) for _ in range(n)]
    data = b"".join(fr.to_wire_int(v).to_bytes(32, "little") for v in vals)
    omega = fr.root_of_unity(log_n)
    exp = ntt_ref.ntt_oracle(fr, vals, omega)
    with native.NativeSession(curve) as sess:
        out = sess.ntt(data, log_n)
        got = [fr.from_wire_int(int.from_bytes(out[i * 32:(i + 1) * 32],
                                               "little")) for i in range(n)]
        assert got == exp
        assert sess.ntt(out, log_n, inverse=True) == data


def test_session_error_paths(rng):
    curve = panda_tpu.BN254
    with native.NativeSession(curve) as sess:
        with pytest.raises(RuntimeError):
            sess.cache_bases(b"\x00" * 63)          # not a multiple of 64
        with pytest.raises(RuntimeError):
            sess.msm(5, 0)                          # bad cache index
        with pytest.raises(RuntimeError):
            sess.set_config(3)                      # bad coordinate type
    fake = type("C", (), {"name": "nope"})()
    with pytest.raises(RuntimeError):
        native.NativeSession(fake)                  # unknown curve