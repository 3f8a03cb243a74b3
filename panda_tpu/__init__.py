"""panda_tpu — a TPU-native zero-knowledge-proof compute library.

A from-scratch JAX/XLA/Pallas redesign of the capabilities of the CUDA
library JasonHopeSpace/panda: Pippenger MSM and radix-2 NTT over BN254,
BLS12-377 and BLS12-381, Montgomery-form limb arithmetic,
Jacobian/Projective output conversion, cached bases/scalars sessions, a
host-callable byte API, a native C ABI with a TPU execution target, and
multi-chip sharding over a jax device mesh.  See SURVEY.md for the layer
map and PARITY.md for the reference parity table.

Exports resolve lazily (PEP 562) so that jax-free consumers — the ctypes
layer over libpanda_host.so (``interop.native``), the byte codec, the
pure big-int oracles — can import the package without pulling in jax.
A native prover's check harness (tools/native_engine_check.py) relies on
this: the TPU must belong to the worker subprocess, not the caller.
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# export name -> submodule (relative) that defines it
_EXPORTS = {
    "BN254": ".curves.config",
    "BLS12_377": ".curves.config",
    "BLS12_381": ".curves.config",
    "CURVES": ".curves.config",
    "CurveSpec": ".curves.config",
    "AffinePoint": ".curves.point",
    "ProjPoint": ".curves.point",
    "BN254_FP": ".fields.config",
    "BN254_FR": ".fields.config",
    "BLS12_377_FP": ".fields.config",
    "BLS12_377_FR": ".fields.config",
    "BLS12_381_FP": ".fields.config",
    "BLS12_381_FR": ".fields.config",
    "ALL_FIELDS": ".fields.config",
    "FieldSpec": ".fields.config",
    "PandaError": ".runtime.errors",
    "PandaRuntimeError": ".runtime.errors",
    "PandaManager": ".runtime.manager",
    "InitUnitType": ".runtime.manager",
    "ResultCoordinateType": ".runtime.manager",
    "device_info": ".runtime.manager",
    "get_device_number": ".runtime.manager",
    "trace": ".utils",
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        mod = importlib.import_module(_EXPORTS[name], __name__)
        val = getattr(mod, name)
        globals()[name] = val               # cache for subsequent lookups
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
