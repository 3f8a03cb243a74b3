"""MXU matmul NTT engine (ops/ntt_mxu.py) vs the Python oracle and the
stagewise jnp NTT.  Runs everywhere — the engine is plain XLA (int8
matmuls), no Pallas interpreter needed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.fields import codec
from panda_tpu.fields.config import BLS12_377_FR, BN254_FR
from panda_tpu.ops import ntt as ntt_ops
from panda_tpu.ops import ntt_mxu
from panda_tpu.reference import ntt_ref

from tests.conftest import from_mont_limbs, to_mont_limbs


def _rand_vals(n, seed):
    rng = np.random.default_rng(seed)
    return [int(v) % BN254_FR.modulus
            for v in rng.integers(1, 1 << 63, size=n)]


def _decode(spec, arr):
    return [spec.from_mont_int(v)
            for v in codec.limbs_to_ints(spec, np.asarray(arr))]


@pytest.mark.parametrize("log_k", [1, 3, 5])
def test_dft_apply_matches_oracle(log_k):
    spec = BN254_FR
    K, batch = 1 << log_k, 4
    omega = spec.root_of_unity(log_k)
    vals = [_rand_vals(K, 50 + b) for b in range(batch)]
    x = jnp.stack([to_mont_limbs(spec, v) for v in vals], axis=-1)
    mat = jnp.asarray(ntt_mxu.dft_matrix(spec, log_k, omega))
    out = jax.jit(lambda a: ntt_mxu.dft_apply(spec, a, log_k, mat))(x)
    fp = ntt_mxu._fold_plan(spec, log_k)
    assert int(np.asarray(out).max()) < (1 << 15)
    for b in range(batch):
        got = from_mont_limbs(spec, out[:, :, b])
        want = ntt_ref.ntt_oracle(spec, vals[b], omega)
        assert got == want
    # value bound holds
    from panda_tpu.fields import mont
    vals_int = codec.limbs_to_ints(spec, np.asarray(out[:, :, 0]))
    assert all(v < fp.out_vb for v in vals_int)


@pytest.mark.parametrize("log_n,maxk", [(4, 3), (7, 3), (11, 5), (9, 6)])
def test_mxu_ntt_matches_oracle(log_n, maxk):
    spec = BN254_FR
    vals = _rand_vals(1 << log_n, 7 * log_n)
    x = to_mont_limbs(spec, vals)
    out = jax.jit(lambda a: ntt_mxu.mxu_ntt(spec, a, log_n, maxk=maxk))(x)
    got = _decode(spec, out)
    assert got == ntt_ref.ntt_oracle(spec, vals, spec.root_of_unity(log_n))


def test_mxu_ntt_bls12_377():
    """Second field exercises the fold-plan bounds for a different p."""
    spec = BLS12_377_FR
    log_n = 6
    vals = [int(v) % spec.modulus
            for v in np.random.default_rng(5).integers(1, 1 << 63,
                                                       size=1 << log_n)]
    x = to_mont_limbs(spec, vals)
    out = jax.jit(lambda a: ntt_mxu.mxu_ntt(spec, a, log_n, maxk=3))(x)
    got = [spec.from_mont_int(v) for v in codec.limbs_to_ints(
        spec, np.asarray(out))]
    assert got == ntt_ref.ntt_oracle(spec, vals, spec.root_of_unity(log_n))


def test_mxu_intt_roundtrip():
    spec = BN254_FR
    log_n, maxk = 8, 3
    vals = _rand_vals(1 << log_n, 99)
    x = to_mont_limbs(spec, vals)
    fwd = jax.jit(lambda a: ntt_mxu.mxu_ntt(spec, a, log_n, maxk=maxk))(x)
    back = jax.jit(lambda a: ntt_mxu.mxu_ntt(spec, a, log_n, inverse=True,
                                             maxk=maxk))(fwd)
    assert _decode(spec, back) == vals


def test_mxu_matches_stagewise_bitexact():
    """Both paths canonicalize, so they must agree bit-for-bit."""
    spec = BN254_FR
    log_n = 6
    vals = _rand_vals(1 << log_n, 11)
    x = to_mont_limbs(spec, vals)
    tables = ntt_ops.make_tables(spec, log_n)
    want = np.asarray(ntt_ops.ntt(spec, x, tables))
    got = np.asarray(jax.jit(
        lambda a: ntt_mxu.mxu_ntt(spec, a, log_n, maxk=3))(x))
    assert (got == want).all()
