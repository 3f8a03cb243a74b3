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
    # Session API (the reference's PandaGpuManager analog, wrapper.rs:8-353)
    lib.panda_get_device_number.restype = ctypes.c_int
    lib.panda_get_device_number.argtypes = [ctypes.POINTER(ctypes.c_int)]
    lib.panda_session_create.restype = ctypes.c_void_p
    lib.panda_session_create.argtypes = [ctypes.c_char_p]
    lib.panda_session_destroy.restype = None
    lib.panda_session_destroy.argtypes = [ctypes.c_void_p]
    lib.panda_session_set_config.restype = ctypes.c_int
    lib.panda_session_set_config.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.panda_session_cache_bases.restype = ctypes.c_long
    lib.panda_session_cache_bases.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.panda_session_cache_scalars.restype = ctypes.c_long
    lib.panda_session_cache_scalars.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.panda_session_msm.restype = ctypes.c_int
    lib.panda_session_msm.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.panda_session_msm_cached.restype = ctypes.c_int
    lib.panda_session_msm_cached.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.panda_session_ntt.restype = ctypes.c_int
    lib.panda_session_ntt.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_uint, ctypes.c_char_p, ctypes.c_int]
    lib.panda_session_set_execution_target.restype = ctypes.c_int
    lib.panda_session_set_execution_target.argtypes = [
        ctypes.c_void_p, ctypes.c_int]
    lib.panda_session_engine_warmup.restype = ctypes.c_int
    lib.panda_session_engine_warmup.argtypes = [ctypes.c_void_p]


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


class NativeSession:
    """ctypes wrapper over the native session C API (the host-pipeline
    analog of the reference's ``PandaGpuManager``)."""

    def __init__(self, curve):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._curve = curve
        self._h = lib.panda_session_create(curve.name.encode())
        if not self._h:
            raise RuntimeError(f"unsupported curve {curve.name}")

    def close(self):
        if self._h:
            self._lib.panda_session_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def set_config(self, coord_type: int) -> None:
        rc = self._lib.panda_session_set_config(self._h, coord_type)
        if rc:
            raise RuntimeError(f"set_config failed: {rc}")

    def set_execution_target(self, target: int) -> None:
        """0 = in-process CPU host pipeline, 1 = the accelerated JAX
        engine via the worker subprocess (results byte-identical to
        ``runtime.api.msm``/``ntt``)."""
        rc = self._lib.panda_session_set_execution_target(self._h, target)
        if rc:
            raise RuntimeError(f"set_execution_target failed: {rc}")

    def engine_warmup(self) -> None:
        """Spawn + ping the engine worker now (surfaces spawn errors)."""
        rc = self._lib.panda_session_engine_warmup(self._h)
        if rc:
            raise RuntimeError(f"engine warmup failed: {rc}")

    def cache_bases(self, blob: bytes) -> int:
        idx = self._lib.panda_session_cache_bases(self._h, blob, len(blob))
        if idx < 0:
            raise RuntimeError("cache_bases failed")
        return idx

    def cache_scalars(self, blob: bytes) -> int:
        idx = self._lib.panda_session_cache_scalars(self._h, blob, len(blob))
        if idx < 0:
            raise RuntimeError("cache_scalars failed")
        return idx

    def msm(self, scalars: bytes | int, bases: bytes | int) -> bytes:
        """MSM; either argument may be a cache index (int) or fresh bytes."""
        out = ctypes.create_string_buffer(3 * self._curve.fp.n_bytes)
        sidx = scalars if isinstance(scalars, int) else -1
        bidx = bases if isinstance(bases, int) else -1
        sb = b"" if isinstance(scalars, int) else scalars
        bb = b"" if isinstance(bases, int) else bases
        rc = self._lib.panda_session_msm_cached(
            self._h, sidx, bidx, sb, len(sb), bb, len(bb), out)
        if rc:
            raise RuntimeError(f"session msm failed: {rc}")
        return out.raw

    def ntt(self, data: bytes, log_n: int, omega: bytes | None = None,
            inverse: bool = False) -> bytes:
        buf = ctypes.create_string_buffer(data, len(data))
        rc = self._lib.panda_session_ntt(self._h, buf, len(data), log_n,
                                         omega, 1 if inverse else 0)
        if rc:
            raise RuntimeError(f"session ntt failed: {rc}")
        return buf.raw

    def device_count(self) -> int:
        n = ctypes.c_int(0)
        self._lib.panda_get_device_number(ctypes.byref(n))
        return n.value
