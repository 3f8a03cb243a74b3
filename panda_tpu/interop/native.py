"""ctypes binding to the native C++ host library (libpanda_host.so).

The native library is the TPU build's analog of the reference's CPU
reference pipeline (``msm_host.cuh``/``field_host.cuh``, exposed through the
C ABI of ``panda_interface.cu``): a fast host-side MSM/NTT used as the debug
path and test oracle.  Built from ``panda_tpu/native/`` with ``make``.

All functions degrade gracefully when the library has not been built —
callers check :func:`available` and fall back to the Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_HERE = pathlib.Path(__file__).resolve().parent
_NATIVE_DIR = _HERE.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpanda_host.so"

_lib = None
_load_failed = False


def _try_load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            build()
        _lib = ctypes.CDLL(str(_LIB_PATH))
        _configure(_lib)
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def build() -> None:
    """Compile the native library in-tree (g++ -O3 -shared)."""
    subprocess.run(["make", "-s", "-C", str(_NATIVE_DIR)], check=True)


def _configure(lib):
    lib.panda_msm_execute_host.restype = ctypes.c_int
    lib.panda_msm_execute_host.argtypes = [
        ctypes.c_char_p,                   # curve name
        ctypes.c_char_p, ctypes.c_size_t,  # scalars bytes
        ctypes.c_char_p, ctypes.c_size_t,  # bases bytes
        ctypes.c_char_p,                   # out (3 * field bytes)
        ctypes.c_int,                      # coordinate type
    ]
    lib.panda_ntt_execute_host.restype = ctypes.c_int
    lib.panda_ntt_execute_host.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_size_t,  # data in/out (in place)
        ctypes.c_uint,                     # log_n
        ctypes.c_char_p,                   # omega bytes (may be NULL)
        ctypes.c_int,                      # inverse flag
    ]


def available() -> bool:
    return _try_load() is not None


def msm_host(curve, scalars: bytes, bases: bytes, coord_type: int = 0) -> bytes:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.create_string_buffer(3 * curve.fp.n_bytes)
    rc = lib.panda_msm_execute_host(
        curve.name.encode(), scalars, len(scalars), bases, len(bases),
        out, coord_type)
    if rc != 0:
        raise RuntimeError(f"panda_msm_execute_host failed: {rc}")
    return out.raw


def ntt_host(curve, data: bytes, log_n: int, omega: bytes | None = None,
             inverse: bool = False) -> bytes:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = ctypes.create_string_buffer(data, len(data))
    rc = lib.panda_ntt_execute_host(
        curve.name.encode(), buf, len(data), log_n, omega,
        1 if inverse else 0)
    if rc != 0:
        raise RuntimeError(f"panda_ntt_execute_host failed: {rc}")
    return buf.raw
