"""Execution API — the TPU equivalent of ``src/gpu_manager/unit.rs``.

One function per workload variant, taking and returning raw LE
Montgomery-form bytes exactly like the reference
(``/root/reference/src/gpu_manager/unit.rs:10-543``):

* ``msm`` (unit.rs:10), ``msm_with_cached_bases`` (:103),
  ``msm_with_cached_scalars`` (:190), ``msm_with_cached_input`` (:277)
  -> 3 * n_bytes Jacobian (or Projective) result blob;
* ``msm_host`` (:363) — CPU reference path (native C++ library when built,
  Python oracle otherwise);
* ``ntt``/``intt`` (:418) and ``ntt_v1`` (:481, caller-supplied omega).

Curve-suffixed aliases (``msm_bn254`` etc.) match the reference's naming.
Unlike the reference, every variant also exists for BLS12-377 (the
reference's README defers the BLS12-377 Rust API to "later").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..curves import point as cp
from ..curves.config import BLS12_377, BLS12_381, BN254
from ..fields import codec, mont
from ..ops import msm as msm_ops
from ..ops import ntt as ntt_ops
from ..utils import trace
from .errors import PandaError, PandaRuntimeError
from .manager import PandaManager


# ---------------------------------------------------------------------------
# MSM
# ---------------------------------------------------------------------------

def _msm_run(gm: PandaManager, scalars, bases_xy, pk=None) -> bytes:
    curve = gm.curve
    px, py = bases_xy
    n = px.shape[-1]
    if scalars.shape[-1] != n:
        raise PandaRuntimeError(PandaError.INVALID_CONFIGURATION,
                                "scalars/bases length mismatch")
    c = msm_ops.window_bits(max(n - 1, 1).bit_length(), bits=curve.fr.bits)
    fn = msm_ops.window_sums_jitted(curve, c, with_pk=pk is not None)
    args = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(scalars))
    if pk is not None:                       # session-cached precompute
        args = args + (pk,)
    with trace.timer("msm: window sums (device)"):
        sums = fn(*args)
        gm.note_issued(*sums)                           # wrapper.rs:291 analog
        sums = [np.asarray(a) for a in sums]            # d2h: W tiny points
        gm.note_issued()       # d2h completed the work: nothing in flight,
        #                        don't pin the device outputs in HBM
    with trace.timer("msm: horner (host)"):
        acc = msm_ops.host_horner(curve, sums, c)
    return gm.format_affine_result(acc)


def _ingest_scalars(gm: PandaManager, scalars_bytes: bytes):
    fr = gm.curve.fr
    try:
        limbs = codec.bytes_to_limbs(fr, scalars_bytes)
    except ValueError as e:
        raise PandaRuntimeError(PandaError.INVALID_CONFIGURATION, str(e))
    return mont.from_wire(fr, jnp.asarray(limbs))


def _ingest_bases(gm: PandaManager, bases_bytes: bytes):
    fp = gm.curve.fp
    try:
        x, y = codec.points_bytes_to_limbs(fp, bases_bytes)
    except ValueError as e:
        raise PandaRuntimeError(PandaError.INVALID_CONFIGURATION, str(e))
    return (mont.from_wire(fp, jnp.asarray(x)),
            mont.from_wire(fp, jnp.asarray(y)))


def msm(gm: PandaManager, scalars_bytes: bytes, bases_bytes: bytes) -> bytes:
    """``panda_msm_bn254_gpu`` (unit.rs:10): upload scalars+bases, run,
    return the 3-coordinate result blob."""
    return _msm_run(gm, _ingest_scalars(gm, scalars_bytes),
                    _ingest_bases(gm, bases_bytes))


def msm_with_cached_bases(gm: PandaManager, scalars_bytes: bytes,
                          bases_index: int = 0) -> bytes:
    """``panda_msm_bn254_gpu_with_cached_bases`` (unit.rs:103)."""
    if not 0 <= bases_index < len(gm.d_bases):
        raise PandaRuntimeError(PandaError.INVALID_VALUE, "bases index")
    return _msm_run(gm, _ingest_scalars(gm, scalars_bytes),
                    gm.d_bases[bases_index], pk=gm.bases_pk(bases_index))


def msm_with_cached_scalars(gm: PandaManager, bases_bytes: bytes,
                            scalars_index: int = 0) -> bytes:
    """``panda_msm_bn254_gpu_with_cached_scalars`` (unit.rs:190)."""
    if not 0 <= scalars_index < len(gm.d_scalars):
        raise PandaRuntimeError(PandaError.INVALID_VALUE, "scalars index")
    return _msm_run(gm, gm.d_scalars[scalars_index],
                    _ingest_bases(gm, bases_bytes))


def msm_with_cached_input(gm: PandaManager, scalars_index: int = 0,
                          bases_index: int = 0) -> bytes:
    """``panda_msm_bn254_gpu_with_cached_input`` (unit.rs:277)."""
    if not 0 <= bases_index < len(gm.d_bases):
        raise PandaRuntimeError(PandaError.INVALID_VALUE, "bases index")
    if not 0 <= scalars_index < len(gm.d_scalars):
        raise PandaRuntimeError(PandaError.INVALID_VALUE, "scalars index")
    return _msm_run(gm, gm.d_scalars[scalars_index], gm.d_bases[bases_index],
                    pk=gm.bases_pk(bases_index))


def msm_host(gm: PandaManager, scalars_bytes: bytes, bases_bytes: bytes) -> bytes:
    """``panda_msm_bn254_gpu_host`` (unit.rs:363): CPU reference path.

    Uses the native C++ library when available (the analog of the
    reference's ``msm_host.cuh`` pipeline), else the Python oracle.
    """
    from ..interop import native
    if native.available():
        return native.msm_host(gm.curve, scalars_bytes, bases_bytes,
                               int(gm.result_coordinate_type))
    # Python-oracle fallback.
    from ..reference import curve_ref
    fr, fp = gm.curve.fr, gm.curve.fp
    s_limbs = codec.bytes_to_limbs(fr, scalars_bytes)
    scalars = [fr.from_wire_int(v) for v in codec.limbs_to_ints(fr, s_limbs)]
    bx, by = codec.points_bytes_to_limbs(fp, bases_bytes)
    xs = [fp.from_wire_int(v) for v in codec.limbs_to_ints(fp, bx)]
    ys = [fp.from_wire_int(v) for v in codec.limbs_to_ints(fp, by)]
    acc = curve_ref.msm_oracle(gm.curve, list(zip(xs, ys)), scalars)
    if acc is None:
        x, y, z = 0, 1, 0
    else:
        x, y = acc
        z = 1
    limbs = lambda v: codec.ints_to_limbs(fp, [fp.to_wire_int(v)])
    return codec.point3_limbs_to_bytes(fp, limbs(x), limbs(y), limbs(z))


# ---------------------------------------------------------------------------
# NTT
# ---------------------------------------------------------------------------

def _ntt_run(gm: PandaManager, data: bytes, log_n: int,
             omega_int: Optional[int], inverse: bool) -> bytes:
    fr = gm.curve.fr
    try:
        x = codec.bytes_to_limbs(fr, data)
    except ValueError as e:
        raise PandaRuntimeError(PandaError.INVALID_CONFIGURATION, str(e))
    if x.shape[-1] != (1 << log_n):
        raise PandaRuntimeError(PandaError.INVALID_CONFIGURATION,
                                f"expected 2^{log_n} elements")
    tables = gm.ntt_tables(log_n, omega_int)
    with trace.timer("ntt: h2d + domain shift"):
        xin = mont.from_wire(fr, jnp.asarray(x))
    with trace.timer("ntt: execute"):
        y = ntt_ops.run_ntt(fr, xin, tables, inverse=inverse)
        gm.note_issued(y)                               # wrapper.rs:291 analog
        y.block_until_ready()
    with trace.timer("ntt: d2h result"):
        out = codec.limbs_to_bytes(fr, np.asarray(mont.to_wire(fr, y, mult=2)))
        gm.note_issued()       # result copied to host: release the device
        #                        buffer instead of pinning ~n*L*4 B in HBM
        return out


def ntt(gm: PandaManager, data: bytes, log_n: int) -> bytes:
    """``panda_ntt_bn254_gpu`` (unit.rs:418).  The reference mutates the
    caller's buffer and reports which ping-pong buffer holds the output via
    a flag (unit.rs:458-468); we simply return the transformed bytes."""
    return _ntt_run(gm, data, log_n, None, inverse=False)


def intt(gm: PandaManager, data: bytes, log_n: int) -> bytes:
    """Inverse NTT (scales by n^-1).  New capability (BASELINE.md config 2)."""
    return _ntt_run(gm, data, log_n, None, inverse=True)


def ntt_v1(gm: PandaManager, data: bytes, log_n: int,
           omega_bytes: bytes) -> bytes:
    """``panda_ntt_bn254_gpu_v1`` (unit.rs:481): caller passes omega
    (Montgomery LE bytes)."""
    fr = gm.curve.fr
    limbs = codec.bytes_to_limbs(fr, omega_bytes)
    omega = fr.from_wire_int(codec.limbs_to_ints(fr, limbs)[0])
    return _ntt_run(gm, data, log_n, omega, inverse=False)


# ---------------------------------------------------------------------------
# Curve-suffixed aliases mirroring the reference's function names.
# ---------------------------------------------------------------------------

def _curve_guard(gm: PandaManager, curve):
    if gm.curve is not curve:
        raise PandaRuntimeError(PandaError.UNSUPPORTED_CURVE,
                                f"manager bound to {gm.curve.name}")


def msm_bn254(gm, scalars, bases):
    _curve_guard(gm, BN254); return msm(gm, scalars, bases)

def msm_bn254_with_cached_bases(gm, scalars, idx=0):
    _curve_guard(gm, BN254); return msm_with_cached_bases(gm, scalars, idx)

def msm_bn254_with_cached_scalars(gm, bases, idx=0):
    _curve_guard(gm, BN254); return msm_with_cached_scalars(gm, bases, idx)

def msm_bn254_with_cached_input(gm, sidx=0, bidx=0):
    _curve_guard(gm, BN254); return msm_with_cached_input(gm, sidx, bidx)

def msm_bn254_host(gm, scalars, bases):
    _curve_guard(gm, BN254); return msm_host(gm, scalars, bases)

def ntt_bn254(gm, data, log_n):
    _curve_guard(gm, BN254); return ntt(gm, data, log_n)

def ntt_bn254_v1(gm, data, log_n, omega_bytes):
    _curve_guard(gm, BN254); return ntt_v1(gm, data, log_n, omega_bytes)

def msm_bls12_377(gm, scalars, bases):
    _curve_guard(gm, BLS12_377); return msm(gm, scalars, bases)

def ntt_bls12_377(gm, data, log_n):
    _curve_guard(gm, BLS12_377); return ntt(gm, data, log_n)

def msm_bls12_381(gm, scalars, bases):
    _curve_guard(gm, BLS12_381); return msm(gm, scalars, bases)

def ntt_bls12_381(gm, data, log_n):
    _curve_guard(gm, BLS12_381); return ntt(gm, data, log_n)
