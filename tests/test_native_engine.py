"""Native C ABI -> accelerated engine dispatch (closes SURVEY C1/C2).

The reference's C interface dispatches into its accelerated units
(``panda_interface.cu:152-191``); here ``panda_session_set_execution_target``
routes ``panda_session_msm``/``panda_session_ntt`` through the JAX engine
(a worker subprocess, panda_tpu/interop/worker.py).  The contract tested:
a NATIVE caller obtains results byte-identical to the Python byte API.

The worker inherits JAX_PLATFORMS from the environment, so under the test
harness it runs the engine on CPU; tools/tpu_checks.py runs the same flow
against the real chip.
"""

import os

import pytest

from panda_tpu.curves.config import BN254
from panda_tpu.interop import native
from panda_tpu.reference import curve_ref as oracle
from panda_tpu.runtime import api
from panda_tpu.runtime.manager import PandaManager

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _blobs(curve, rng, n):
    fp, fr = curve.fp, curve.fr
    pts = [oracle.random_point(curve, rng) for _ in range(n)]
    scalars = [rng.randrange(fr.modulus) for _ in range(n)]
    bases = b"".join(
        fp.to_wire_int(x).to_bytes(fp.n_bytes, "little")
        + fp.to_wire_int(y).to_bytes(fp.n_bytes, "little") for x, y in pts)
    sblob = b"".join(
        fr.to_wire_int(s).to_bytes(fr.n_bytes, "little") for s in scalars)
    return bases, sblob


def test_engine_msm_and_ntt_byte_identical(rng):
    curve = BN254
    bases, sblob = _blobs(curve, rng, 16)
    # Engine-target worker must see the same backend as this process.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    with native.NativeSession(curve) as s:
        s.set_execution_target(1)
        s.engine_warmup()
        got = s.msm(sblob, bases)

        gm = PandaManager.new(0, curve)
        exp = api.msm(gm, sblob, bases)
        assert got == exp, "engine-target MSM != Python byte API"

        vals = [rng.randrange(curve.fr.modulus) for _ in range(16)]
        data = b"".join(curve.fr.to_wire_int(v).to_bytes(
            curve.fr.n_bytes, "little") for v in vals)
        got_ntt = s.ntt(data, 4)
        exp_ntt = api.ntt(gm, data, 4)
        assert got_ntt == exp_ntt, "engine-target NTT != Python byte API"
        # roundtrip through the engine target
        assert s.ntt(got_ntt, 4, inverse=True) == data


def test_engine_error_propagation(rng):
    curve = BN254
    bases, sblob = _blobs(curve, rng, 16)
    with native.NativeSession(curve) as s:
        s.set_execution_target(1)
        s.engine_warmup()
        with pytest.raises(RuntimeError) as e:
            s.msm(sblob[:7], bases)          # truncated scalars
        assert "5" in str(e.value)           # INVALID_CONFIGURATION


def test_worker_death_maps_to_not_ready(monkeypatch):
    """A worker that cannot start (exec fails -> child exits) surfaces as
    NOT_READY (3), and the session recovers on the next call once the
    environment is fixed (the dead worker is reaped and respawned)."""
    curve = BN254
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    with native.NativeSession(curve) as s:
        s.set_execution_target(1)
        monkeypatch.setenv("PANDA_WORKER_PYTHON", "/nonexistent/python")
        with pytest.raises(RuntimeError) as e:
            s.engine_warmup()
        assert "3" in str(e.value)           # NOT_READY
        monkeypatch.delenv("PANDA_WORKER_PYTHON")
        s.engine_warmup()                    # fresh worker respawns cleanly


def test_worker_protocol_violation_maps_to_internal(monkeypatch, tmp_path,
                                                    rng):
    """A worker that replies with a wrong-sized payload (protocol
    violation) surfaces as INTERNAL (9), distinct from the NOT_READY
    dead-worker code."""
    curve = BN254
    bases, sblob = _blobs(curve, rng, 16)
    fake = tmp_path / "fake_worker.sh"
    # Replies to one request with code=0, outlen=5, 5 payload bytes
    # (an MSM reply must be 3*fp.bytes = 96), then drains stdin to EOF so
    # the caller's request writes cannot fail first.
    fake.write_text("#!/bin/sh\n"
                    "printf '\\0\\0\\0\\0\\5\\0\\0\\0\\0\\0\\0\\0xxxxx'\n"
                    "cat >/dev/null\n")
    fake.chmod(0o755)
    with native.NativeSession(curve) as s:
        s.set_execution_target(1)
        monkeypatch.setenv("PANDA_WORKER_PYTHON", str(fake))
        with pytest.raises(RuntimeError) as e:
            s.msm(sblob, bases)
        assert "9" in str(e.value)           # INTERNAL: bad reply shape
