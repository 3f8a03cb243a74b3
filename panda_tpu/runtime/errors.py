"""Error codes mirroring the reference's status enums.

The reference propagates ``panda_error`` C codes
(``/root/reference/src/cuda/core/panda_interface.cuh:10-16``) widened to 30
Rust-side variants (``src/gpu_ffi/common.rs:6-38``).  Python callers get
exceptions; the C-ABI compatibility layer maps them back to codes.
"""

from __future__ import annotations

import enum


class PandaError(enum.IntEnum):
    SUCCESS = 0
    INVALID_VALUE = 1
    MEMORY_ALLOCATION = 2
    NOT_READY = 3
    INVALID_DEVICE = 4
    INVALID_CONFIGURATION = 5
    UNSUPPORTED_CURVE = 6
    UNSUPPORTED_SIZE = 7
    NOT_INITIALIZED = 8
    INTERNAL = 9


class PandaRuntimeError(RuntimeError):
    def __init__(self, code: PandaError, msg: str = ""):
        self.code = code
        super().__init__(f"{code.name}: {msg}" if msg else code.name)
