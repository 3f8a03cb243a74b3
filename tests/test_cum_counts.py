"""The matmul-histogram run locator vs the binary-search definition."""

import jax.numpy as jnp
import numpy as np

from panda_tpu.ops import msm as msm_ops


def test_cum_counts_matches_searchsorted():
    rng = np.random.default_rng(3)
    W, n, D = 3, 5000, 1 << 11
    # digits in [0, D] plus some dead sentinels D+1
    digits = rng.integers(0, D + 1, size=(W, n)).astype(np.uint32)
    got = np.asarray(msm_ops._cum_counts(jnp.asarray(digits), D, n))
    keys = np.sort(digits, axis=1)
    for w in range(W):
        want = np.searchsorted(keys[w], np.arange(1, D + 1), side="right")
        np.testing.assert_array_equal(got[w], want)


def test_cum_counts_dead_and_zero():
    rng = np.random.default_rng(4)
    W, n, D = 2, 400, 1 << 10
    digits = rng.integers(0, D + 1, size=(W, n + 37)).astype(np.uint32)
    digits[:, n:] = D + 1                       # dead tail entries
    digits[:, :50] = 0                          # heavy zero bucket
    got = np.asarray(msm_ops._cum_counts(jnp.asarray(digits), D, n))
    keys = np.sort(digits, axis=1)
    for w in range(W):
        want = np.searchsorted(keys[w], np.arange(1, D + 1), side="right")
        np.testing.assert_array_equal(got[w], want)


def test_hist_kernel_matches_xla_path():
    """The fused Pallas histogram (interpret mode) vs the XLA one-hot
    matmul path — same counts, same dead/zero handling."""
    from panda_tpu.ops import hist_pallas
    rng = np.random.default_rng(5)
    W, n, D = 3, 4096, 1 << 11
    digits = rng.integers(0, D + 2, size=(W, n)).astype(np.uint32)
    digits[:, :30] = 0
    got = np.asarray(hist_pallas.hist_counts(jnp.asarray(digits), D,
                                             interpret=True))
    for w in range(W):
        want = np.bincount(digits[w], minlength=D + 2)[1:D + 1]
        np.testing.assert_array_equal(got[w], want)
