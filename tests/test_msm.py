"""MSM pipeline vs the Python oracle (the arkworks-oracle analog of
``tests/test.rs:50-112``, scaled to CI-friendly sizes)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panda_tpu.curves import point as cp
from panda_tpu.curves.config import BLS12_377, BLS12_381, BN254
from panda_tpu.fields import codec, mont
from panda_tpu.ops import msm as msm_ops
from panda_tpu.reference import curve_ref as oracle
from tests.conftest import points_to_device, proj_to_oracle, to_mont_limbs


def _run_case(curve, rng, n, c=None, lanes=None, dup=False, zeros=False):
    pts = [oracle.random_point(curve, rng) for _ in range(n)]
    if dup:  # duplicate points in the same bucket exercise add(P, P) paths
        pts = [pts[0]] * (n // 2) + pts[n // 2:]
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    if dup:
        scalars = [scalars[0]] * (n // 4) + scalars[n // 4:]
    if zeros:
        scalars[::3] = [0] * len(scalars[::3])
    exp = oracle.msm_oracle(curve, pts, scalars)
    px, py = points_to_device(curve, pts)
    s = to_mont_limbs(curve.fr, scalars)
    res = jax.jit(lambda a, b, d: msm_ops.msm(curve, a, b, d, c=c, lanes=lanes))(px, py, s)
    got = proj_to_oracle(curve, cp.ProjPoint(*(a[:, None] for a in res)))[0]
    assert got == exp


def test_msm_bn254_small(rng):
    _run_case(BN254, rng, 64)


def test_msm_bn254_duplicates_and_zero_scalars(rng):
    _run_case(BN254, rng, 64, dup=True, zeros=True)


def test_msm_bn254_nonpow2_and_lanes(rng):
    _run_case(BN254, rng, 48, c=6, lanes=8)


def test_msm_bls12_377(rng):
    _run_case(BLS12_377, rng, 32, c=5)


def test_msm_bls12_381(rng):
    # Enum-surface parity: the reference carries the BLS12_381 enum value
    # (curve.cuh:8-12) and arkworks dep but wires no parameters; panda_tpu
    # wires the full registry (fields/config.py, curves/config.py).
    _run_case(BLS12_381, rng, 32, c=5)


def test_msm_single_point(rng):
    _run_case(BN254, rng, 1, c=3)


@pytest.mark.slow
def test_msm_bn254_k10(rng):
    _run_case(BN254, rng, 1 << 10)


def _production_width_case(rng, c, n=256):
    """Full-range scalars at a production window width: exercises the
    signed top-window carry (extract_signed_digits' headroom window), the
    matmul histogram run locator (D >= _HIST_MIN_D), and the weighted
    reduction at real bucket counts — a combination no small-c test
    reaches (round-2 verdict gap).  Uses window_sums + host_horner (the
    bench/API split, ``msm_cuda.cuh:738-743``) so the device Horner tail
    (width-independent) isn't recompiled per width."""
    curve = BN254
    pts = [oracle.random_point(curve, rng) for _ in range(n)]
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    exp = oracle.msm_oracle(curve, pts, scalars)
    px, py = points_to_device(curve, pts)
    s = to_mont_limbs(curve.fr, scalars)
    ws = msm_ops.window_sums_fn(curve, c)
    sums = jax.jit(lambda a, b, d: jnp.stack(ws(a, b, d)))(px, py, s)
    got = msm_ops.host_horner(curve, list(np.asarray(sums)), c)
    assert got == exp


def test_msm_bn254_production_width_c13(rng):
    _production_width_case(rng, 13)             # D = 4096 buckets/window


@pytest.mark.slow
def test_msm_bn254_production_width_c16(rng):
    """Widest window the pipeline supports (D = 32768 buckets/window)."""
    _production_width_case(rng, 16)


def test_window_bits_policy():
    """Cost-model window policy: in-range, monotone in problem size."""
    widths = [msm_ops.window_bits(k) for k in range(2, 25)]
    assert all(4 <= c <= 16 for c in widths)
    assert widths == sorted(widths)          # larger n never wants smaller c
    assert msm_ops.window_bits(24) >= 10     # big sizes use wide windows
    assert msm_ops.window_bits(4) <= 6       # tiny sizes use narrow windows


def test_extract_digits_roundtrip(rng):
    fr = BN254.fr
    vals = [rng.randrange(fr.modulus) for _ in range(16)]
    s = jnp.asarray(codec.ints_to_limbs(fr, vals))
    for c in (3, 8, 13, 15):
        digits = np.asarray(msm_ops.extract_digits(fr, s, c))
        recon = [0] * 16
        for w in range(digits.shape[0]):
            for j in range(16):
                recon[j] += int(digits[w, j]) << (w * c)
        assert recon == vals, f"c={c}"


def test_extract_signed_digits_roundtrip(rng):
    """sum_w (+-mag_w) * 2^(w*c) reconstructs the scalar; mags <= 2^(c-1)."""
    fr = BN254.fr
    vals = [rng.randrange(fr.modulus) for _ in range(16)]
    s = jnp.asarray(codec.ints_to_limbs(fr, vals))
    for c in (3, 8, 13, 16):
        mags, negs = (np.asarray(a)
                      for a in msm_ops.extract_signed_digits(fr, s, c))
        assert mags.shape[0] == msm_ops.signed_window_count(fr.bits, c)
        assert mags.max() <= 1 << (c - 1)
        for j in range(16):
            recon = sum((-int(m) if g else int(m)) << (w * c)
                        for w, (m, g) in enumerate(zip(mags[:, j], negs[:, j])))
            assert recon == vals[j], f"c={c}"


def test_msm_window_grouping(rng, monkeypatch):
    """The window-grouped (large-k memory-bounded) path is bit-identical."""
    monkeypatch.setattr(msm_ops, "_PHASE_A_BUDGET", 64)  # force tiny groups
    _run_case(BN254, rng, 24, c=7)


def test_msm_point_chunking(rng, monkeypatch):
    """The point-chunked (n beyond _CHUNK_N) path is bit-identical:
    24 points through 16-point chunks (2 chunks + pad), window-grouped
    within each chunk (budget 32 -> wg groups of 2)."""
    monkeypatch.setattr(msm_ops, "_CHUNK_N", 16)
    monkeypatch.setattr(msm_ops, "_PHASE_A_BUDGET", 32)
    _run_case(BN254, rng, 24, c=7)


def test_window_sums_match_oracle(rng):
    """Per-window partial sums equal sum(digit * P) directly."""
    curve = BN254
    n, c = 32, 6
    pts = [oracle.random_point(curve, rng) for _ in range(n)]
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    px, py = points_to_device(curve, pts)
    s = to_mont_limbs(curve.fr, scalars)
    s_std = mont.from_mont(curve.fr, s)
    digits = msm_ops.extract_digits(curve.fr, s_std, c)
    sums = jax.jit(lambda a, b, d: msm_ops.window_sums(curve, a, b, d, c))(
        px, py, digits)
    d_np = np.asarray(digits)
    for w in range(d_np.shape[0]):
        exp = oracle.msm_oracle(curve, pts, [int(d) for d in d_np[w]])
        got = proj_to_oracle(
            curve, cp.ProjPoint(*(a[w][:, None] for a in sums)))[0]
        assert got == exp, f"window {w}"
