"""Golden-vector parity with the reference's checked-in test data.

Uses the reference's k=13 MSM fixtures
(``/root/reference/src/cuda/test/data/msm/k13/``: bases.bin, scalars.bin,
result_affine.bin — LE Montgomery bytes dumped by ``tests/test.rs:150-162``)
and the k=19 omega blob.  Skipped when the reference tree is not mounted.
"""

import os
import pathlib

import pytest

from panda_tpu.curves.config import BN254
from panda_tpu.fields.config import BN254_FR

DATA = pathlib.Path("/root/reference/src/cuda/test/data")


def _decode_affine(curve, blob):
    fp = curve.fp
    nb = fp.n_bytes
    x = fp.from_mont_int(int.from_bytes(blob[:nb], "little"))
    y = fp.from_mont_int(int.from_bytes(blob[nb:2 * nb], "little"))
    return x, y


@pytest.mark.slow
def test_msm_k13_golden():
    d = DATA / "msm" / "k13"
    if not d.exists():
        pytest.skip("reference golden data not available")
    bases = (d / "bases.bin").read_bytes()
    scalars = (d / "scalars.bin").read_bytes()
    expected = _decode_affine(BN254, (d / "result_affine.bin").read_bytes())

    from panda_tpu.runtime import api
    from panda_tpu.runtime.manager import PandaManager
    gm = PandaManager.new(0, BN254)
    blob = api.msm(gm, scalars, bases)

    fp = BN254.fp
    nb = fp.n_bytes
    x, y, z = [fp.from_mont_int(int.from_bytes(blob[i * nb:(i + 1) * nb], "little"))
               for i in range(3)]
    p = fp.modulus
    assert z != 0
    zi = pow(z, -1, p)
    assert (x * zi * zi % p, y * zi * zi % p * zi % p) == expected


def test_omega_k19_golden():
    """Our generator-7 derived omega must match the reference's dumped
    omega for k=19 (``data/ntt/k19/omega_k19.bin``, Montgomery LE)."""
    f = DATA / "ntt" / "k19" / "omega_k19.bin"
    if not f.exists():
        pytest.skip("reference golden data not available")
    blob = f.read_bytes()
    fr = BN254_FR
    got = fr.from_mont_int(int.from_bytes(blob, "little"))
    assert got == fr.root_of_unity(19)
