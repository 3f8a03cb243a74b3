"""Fused NTT kernel (ops/ntt_pallas.py) vs the Python oracle and the
stagewise jnp NTT, in Pallas interpret mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.fields import codec
from panda_tpu.fields.config import BN254_FR
from panda_tpu.ops import ntt as ntt_ops
from panda_tpu.ops import ntt_pallas
from panda_tpu.reference import ntt_ref

from tests.conftest import from_mont_limbs, to_mont_limbs


def _rand_vals(n, seed):
    rng = np.random.default_rng(seed)
    return [int(v) % BN254_FR.modulus
            for v in rng.integers(1, 1 << 63, size=n)]


def test_small_ntt_batch_matches_oracle():
    spec = BN254_FR
    log_k, batch = 3, 4
    K = 1 << log_k
    omega = spec.root_of_unity(log_k)
    vals = [_rand_vals(K, 100 + b) for b in range(batch)]
    x = jnp.stack([to_mont_limbs(spec, v) for v in vals],
                  axis=-1)                               # (L, K, batch)
    tw = jnp.asarray(ntt_pallas.stage_twiddle_rows(spec, log_k, omega))
    br = jnp.asarray(ntt_pallas._bitrev(log_k))
    out = ntt_pallas.small_ntt_batch(spec, jnp.take(x, br, axis=1),
                                     log_k, tw, interpret=True)
    for b in range(batch):
        got = from_mont_limbs(spec, out[:, :, b])
        want = ntt_ref.ntt_oracle(spec, vals[b], omega)
        assert got == want


@pytest.mark.parametrize("log_n,maxk", [(4, 3), (6, 3), (7, 3)])
def test_fused_ntt_matches_oracle(log_n, maxk):
    spec = BN254_FR
    n = 1 << log_n
    vals = _rand_vals(n, 7 * log_n)
    x = to_mont_limbs(spec, vals)
    out = ntt_pallas.fused_ntt(spec, x, log_n, maxk=maxk, interpret=True)
    got = codec.limbs_to_ints(
        spec, np.asarray(
            jnp.asarray(out)))
    got = [spec.from_mont_int(v) for v in got]
    want = ntt_ref.ntt_oracle(spec, vals, spec.root_of_unity(log_n))
    assert got == want


def test_fused_intt_roundtrip():
    spec = BN254_FR
    log_n, maxk = 6, 3
    n = 1 << log_n
    vals = _rand_vals(n, 99)
    x = to_mont_limbs(spec, vals)
    fwd = ntt_pallas.fused_ntt(spec, x, log_n, maxk=maxk, interpret=True)
    back = ntt_pallas.fused_ntt(spec, fwd, log_n, inverse=True, maxk=maxk,
                                interpret=True)
    got = [spec.from_mont_int(v) for v in codec.limbs_to_ints(
        spec, np.asarray(back))]
    assert got == vals


def test_fused_matches_stagewise_bitexact():
    """Both paths canonicalize, so they must agree bit-for-bit."""
    spec = BN254_FR
    log_n, maxk = 5, 3
    n = 1 << log_n
    vals = _rand_vals(n, 11)
    x = to_mont_limbs(spec, vals)
    tables = ntt_ops.make_tables(spec, log_n)
    want = np.asarray(ntt_ops.ntt(spec, x, tables))
    got = np.asarray(ntt_pallas.fused_ntt(spec, x, log_n, maxk=maxk,
                                          interpret=True))
    assert (got == want).all()
