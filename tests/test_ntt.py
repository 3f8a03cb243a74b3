"""NTT/INTT vs the Python oracle + roundtrips (BASELINE.md config 2).

The reference's butterfly bodies are compiled out (``fft.cu`` ``#if 0``);
the binding contract here is the mathematical transform with the omega
conventions of ``bn254/paramter.cuh:241-258`` (generator 7, 2-adicity 28).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.fields import codec, mont
from panda_tpu.fields.config import BLS12_377_FR, BLS12_381_FR, BN254_FR
from panda_tpu.ops import ntt as ntt_ops
from panda_tpu.reference import ntt_ref
from tests.conftest import from_mont_limbs, to_mont_limbs

FIELDS = [BN254_FR, BLS12_377_FR]


def test_ntt_bls12_381_oracle_and_roundtrip(rng):
    """Single compact BLS12-381 gate (kept out of the FIELDS matrix: one
    compile, not six, on this 1-core host)."""
    spec, log_n = BLS12_381_FR, 4
    n = 1 << log_n
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    exp = ntt_ref.ntt_oracle(spec, vals, spec.root_of_unity(log_n))
    tables = ntt_ops.make_tables(spec, log_n)
    x = to_mont_limbs(spec, vals)
    y = ntt_ops.run_ntt(spec, x, tables)
    assert from_mont_limbs(spec, y) == exp
    back = from_mont_limbs(spec, ntt_ops.run_ntt(spec, jnp.asarray(y), tables,
                                                 inverse=True))
    assert back == vals


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [1, 4, 6])
def test_ntt_matches_oracle(spec, log_n, rng):
    n = 1 << log_n
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    omega = spec.root_of_unity(log_n)
    exp = ntt_ref.ntt_oracle(spec, vals, omega)
    tables = ntt_ops.make_tables(spec, log_n)
    x = to_mont_limbs(spec, vals)
    got = from_mont_limbs(spec, ntt_ops.run_ntt(spec, x, tables))
    assert got == exp


@pytest.mark.parametrize("spec", FIELDS, ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [4, 8])
def test_intt_roundtrip(spec, log_n, rng):
    n = 1 << log_n
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    tables = ntt_ops.make_tables(spec, log_n)
    x = to_mont_limbs(spec, vals)
    y = ntt_ops.run_ntt(spec, x, tables)
    back = from_mont_limbs(spec, ntt_ops.run_ntt(spec, jnp.asarray(y), tables,
                                                 inverse=True))
    assert back == vals


def test_intt_matches_oracle(rng):
    spec = BN254_FR
    log_n = 5
    n = 1 << log_n
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    omega = spec.root_of_unity(log_n)
    exp = ntt_ref.intt_oracle(spec, vals, omega)
    tables = ntt_ops.make_tables(spec, log_n)
    got = from_mont_limbs(
        spec, ntt_ops.run_ntt(spec, to_mont_limbs(spec, vals), tables,
                              inverse=True))
    assert got == exp


def test_root_of_unity_orders():
    for spec, max_log in [(BN254_FR, 28), (BLS12_377_FR, 47)]:
        for log_n in (1, 8, max_log):
            w = spec.root_of_unity(log_n)
            assert pow(w, 1 << log_n, spec.modulus) == 1
            if log_n:
                assert pow(w, 1 << (log_n - 1), spec.modulus) != 1


def test_batched_ntt(rng):
    """Transform applies along the last axis with leading batch dims."""
    spec = BN254_FR
    log_n = 4
    n = 1 << log_n
    rows = [[rng.randrange(spec.modulus) for _ in range(n)] for _ in range(3)]
    omega = spec.root_of_unity(log_n)
    tables = ntt_ops.make_tables(spec, log_n)
    flat = to_mont_limbs(spec, [v for row in rows for v in row])
    L = spec.n_limbs
    x = flat.reshape(L, 3, n)
    y = ntt_ops.run_ntt(spec, x, tables)
    got = from_mont_limbs(spec, jnp.asarray(np.asarray(y).reshape(L, 3 * n)))
    exp = [v for row in rows for v in ntt_ref.ntt_oracle(spec, row, omega)]
    assert got == exp


def test_power_table(rng):
    spec = BN254_FR
    omega = spec.root_of_unity(6)
    tab = ntt_ops._power_table(spec, omega, 13)
    got = from_mont_limbs(spec, tab)
    exp = [pow(omega, i, spec.modulus) for i in range(13)]
    assert got == exp
