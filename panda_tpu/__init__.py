"""panda_tpu — a TPU-native zero-knowledge-proof compute library.

A from-scratch JAX/XLA/Pallas redesign of the capabilities of the CUDA
library JasonHopeSpace/panda: Pippenger MSM and radix-2 NTT over BN254 and
BLS12-377, Montgomery-form limb arithmetic, Jacobian/Projective output
conversion, cached bases/scalars sessions, a host-callable byte API, and
multi-chip sharding over a jax device mesh.  See SURVEY.md for the layer
map and the reference parity table.
"""

from .curves.config import BLS12_377, BN254, CURVES, CurveSpec
from .curves.point import AffinePoint, ProjPoint
from .fields.config import (ALL_FIELDS, BLS12_377_FP, BLS12_377_FR, BN254_FP,
                            BN254_FR, FieldSpec)
from .runtime.errors import PandaError, PandaRuntimeError
from .runtime.manager import (InitUnitType, PandaManager,
                              ResultCoordinateType, device_info,
                              get_device_number)
from .utils import trace

__version__ = "0.1.0"

__all__ = [
    "BN254", "BLS12_377", "CURVES", "CurveSpec",
    "AffinePoint", "ProjPoint",
    "BN254_FP", "BN254_FR", "BLS12_377_FP", "BLS12_377_FR",
    "ALL_FIELDS", "FieldSpec",
    "PandaError", "PandaRuntimeError",
    "PandaManager", "InitUnitType", "ResultCoordinateType",
    "device_info", "get_device_number",
    "trace",
]
