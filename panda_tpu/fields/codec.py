"""Byte <-> limb codecs for the reference's wire format.

The reference crosses its FFI boundary with raw little-endian Montgomery-form
bytes: 32-byte field elements for BN254 (48-byte for the BLS12-377 base
field), 64-byte affine points (x || y), and 96-byte Jacobian results
(x || y || z) — see ``/root/reference/src/utils.rs:1-61`` (transmutes) and
``tests/test.rs:72-101`` (layout usage).  These helpers convert that layout
to/from our uint32[L, N] 15-bit-limb arrays with vectorized bit repacking.
"""

from __future__ import annotations

import numpy as np

from .config import LIMB_BITS, LIMB_MASK, FieldSpec


def _u16_words(spec: FieldSpec, data) -> np.ndarray:
    """LE byte blob -> uint32 (W, N) array of 16-bit words, words-first."""
    raw = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray, memoryview))
           else np.asarray(data, dtype=np.uint8))
    nb = spec.n_bytes
    if raw.size % nb:
        raise ValueError(f"byte length {raw.size} not a multiple of {nb}")
    n = raw.size // nb
    w = raw.reshape(n, nb).view("<u2")            # (N, W16)
    return np.ascontiguousarray(w.T).astype(np.uint32)


def bytes_to_limbs(spec: FieldSpec, data) -> np.ndarray:
    """LE bytes (N * n_bytes) -> uint32[L, N] 15-bit limbs."""
    w = _u16_words(spec, data)                    # (W, N) 16-bit words
    W = w.shape[0]
    L = spec.n_limbs
    out = np.zeros((L, w.shape[1]), dtype=np.uint32)
    for i in range(L):
        lo_bit = LIMB_BITS * i
        j, r = divmod(lo_bit, 16)
        if j >= W:
            break
        v = w[j] >> r
        if r + LIMB_BITS > 16 and j + 1 < W:
            v = v | (w[j + 1] << (16 - r))
        out[i] = v & LIMB_MASK
    return out


def limbs_to_bytes(spec: FieldSpec, limbs: np.ndarray) -> bytes:
    """uint32[L, N] (or (L,)) canonical 15-bit limbs -> LE bytes."""
    arr = np.asarray(limbs, dtype=np.uint32)
    if arr.ndim == 1:
        arr = arr[:, None]
    if (arr >> LIMB_BITS).any():
        raise ValueError("limbs not normalized to 15 bits")
    L, n = arr.shape
    W = spec.n_bytes // 2
    w = np.zeros((W, n), dtype=np.uint32)
    for j in range(W):
        lo_bit = 16 * j
        i, r = divmod(lo_bit, LIMB_BITS)
        if i >= L:
            break
        v = arr[i] >> r
        if i + 1 < L:
            v = v | (arr[i + 1] << (LIMB_BITS - r))
        if i + 2 < L and (2 * LIMB_BITS - r) < 16:
            v = v | (arr[i + 2] << (2 * LIMB_BITS - r))
        w[j] = v & 0xFFFF
    return w.T.astype("<u2").tobytes()


def ints_to_limbs(spec: FieldSpec, values) -> np.ndarray:
    """Python ints -> uint32[L, N] limbs (no Montgomery conversion)."""
    out = np.zeros((spec.n_limbs, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        for i in range(spec.n_limbs):
            out[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_ints(spec: FieldSpec, limbs: np.ndarray) -> list:
    arr = np.asarray(limbs, dtype=np.uint64)
    if arr.ndim == 1:
        arr = arr[:, None]
    vals = [0] * arr.shape[1]
    for i in range(arr.shape[0]):
        row = arr[i].tolist()
        for j in range(len(vals)):
            vals[j] += int(row[j]) << (LIMB_BITS * i)
    return vals


def points_bytes_to_limbs(spec: FieldSpec, data: bytes):
    """Affine point bytes (N * 2*n_bytes, x||y per point) -> (x, y) limbs."""
    raw = np.frombuffer(data, dtype=np.uint8)
    stride = 2 * spec.n_bytes
    if raw.size % stride:
        raise ValueError("point byte length mismatch")
    n = raw.size // stride
    pts = raw.reshape(n, 2, spec.n_bytes)
    x = bytes_to_limbs(spec, np.ascontiguousarray(pts[:, 0]))
    y = bytes_to_limbs(spec, np.ascontiguousarray(pts[:, 1]))
    return x, y


def point3_limbs_to_bytes(spec: FieldSpec, x, y, z) -> bytes:
    """(x, y, z) single-point limbs -> 3*n_bytes result blob (x || y || z)."""
    return (limbs_to_bytes(spec, x) + limbs_to_bytes(spec, y)
            + limbs_to_bytes(spec, z))
