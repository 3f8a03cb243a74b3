"""Device/session manager — the TPU equivalent of ``PandaGpuManager``.

Mirrors the session semantics of the reference's Rust manager
(``/root/reference/src/gpu_manager/wrapper.rs:8-353``):

* ``init_hardware`` selects a device (``wrapper.rs:115``);
* ``init_msm`` uploads one or more bases sets that stay device-resident
  (``wrapper.rs:122-152``), as decoded/converted jax.Arrays instead of raw
  device pointers;
* ``init_msm_cached_scalars`` similarly (``wrapper.rs:171``);
* ``init_ntt`` prepares omega/twiddle tables (``wrapper.rs:199`` ->
  ``fft.cu:63-73``), cached per (curve, log_n);
* ``set_config`` picks Jacobian vs Projective result coordinates
  (``wrapper.rs:212-214``);
* ``destroy``/``sync``/``deinit`` lifecycle (``wrapper.rs:275-312``).

The reference's four CUDA streams + event choreography
(``wrapper.rs:44-47,260-273``) dissolve into XLA async dispatch: jax ops are
issued asynchronously and ``sync`` maps to ``block_until_ready``.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.config import CURVES, BN254, CurveSpec
from ..fields import codec, mont
from ..ops import ntt as ntt_ops
from .errors import PandaError, PandaRuntimeError


@functools.lru_cache(maxsize=16)
def _wire_in_jitted(spec):
    return jax.jit(lambda a: mont.from_wire(spec, a))


@functools.lru_cache(maxsize=16)
def _pack_words_jitted(spec):
    from ..ops import phase_a_pallas
    return jax.jit(functools.partial(phase_a_pallas.pack_coords_words, spec))


class InitUnitType(enum.Enum):
    """``PandaGpuManagerInitUnitType`` (``wrapper.rs:24-29``)."""
    NONE = "none"
    MSM = "msm"
    NTT = "ntt"
    ALL = "all"


class ResultCoordinateType(enum.IntEnum):
    """``panda_msm_result_coordinate_type`` (``panda_interface.cuh:33-37``)."""
    JACOBIAN = 0
    PROJECTIVE = 1


def get_device_number() -> int:
    """``get_device_number`` (``wrapper.rs:315``)."""
    return jax.device_count()


def device_info(device_id: int = 0) -> dict:
    """``device_info`` (``wrapper.rs:325``) — free/total memory when known."""
    dev = jax.devices()[device_id]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    return {
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "bytes_in_use": stats.get("bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


@dataclass
class PandaManager:
    """Session object holding the device and cached inputs."""

    device_id: int = 0
    curve: CurveSpec = BN254
    result_coordinate_type: ResultCoordinateType = ResultCoordinateType.JACOBIAN
    # cached device-resident inputs (index -> arrays), like d_bases/d_scalars
    # raw pointers in wrapper.rs:16-17.
    d_bases: list = field(default_factory=list)
    d_scalars: list = field(default_factory=list)
    # per-bases-set precompute (packed gather tables), same indexing
    _bases_pk: list = field(default_factory=list)
    _device: object = None
    _ntt_tables: dict = field(default_factory=dict)
    _ntt_omega_override: Optional[int] = None
    _initialized: bool = False
    # Most recently issued async device values (the exec-stream analog of
    # ``wrapper.rs:291``); api entry points record their outputs here.
    _last_issued: list = field(default_factory=list)

    # -- lifecycle ---------------------------------------------------------
    @classmethod
    def new(cls, device_id: int = 0, curve: str | CurveSpec = BN254) -> "PandaManager":
        """``PandaGpuManager::new`` (``wrapper.rs:32``): hardware init only."""
        gm = cls(device_id=device_id,
                 curve=CURVES[curve] if isinstance(curve, str) else curve)
        gm.init_hardware(device_id)
        return gm

    @classmethod
    def init_all(cls, device_id: int, unit: InitUnitType,
                 bases: Optional[list] = None,
                 omega_bytes: Optional[bytes] = None,
                 curve: str | CurveSpec = BN254) -> "PandaManager":
        """``PandaGpuManager::init_all`` (``wrapper.rs:55``)."""
        gm = cls.new(device_id, curve)
        if unit in (InitUnitType.MSM, InitUnitType.ALL) and bases is not None:
            gm.init_msm(bases)
        if unit in (InitUnitType.NTT, InitUnitType.ALL):
            gm.init_ntt(omega_bytes)
        return gm

    def init_hardware(self, device_id: int) -> None:
        """``init_hardware`` (``wrapper.rs:115``)."""
        devs = jax.devices()
        if not 0 <= device_id < len(devs):
            raise PandaRuntimeError(PandaError.INVALID_DEVICE, str(device_id))
        self.device_id = device_id
        self._device = devs[device_id]
        self._initialized = True

    def _require_init(self):
        if not self._initialized:
            raise PandaRuntimeError(PandaError.NOT_INITIALIZED)

    # -- cached inputs -----------------------------------------------------
    def _upload(self, spec, arr: np.ndarray) -> jnp.ndarray:
        """Device upload + wire->internal Montgomery domain shift."""
        dev = jax.device_put(arr, self._device)
        return _wire_in_jitted(spec)(dev)

    def init_msm(self, bases_sets: list) -> int:
        """Upload bases sets; each entry is an affine-point byte blob
        (``wrapper.rs:122-152``).  Returns count of cached sets."""
        self._require_init()
        for blob in bases_sets:
            self.init_msm_cached_bases(blob)
        return len(self.d_bases)

    def init_msm_cached_bases(self, blob: bytes) -> int:
        """``init_msm_cached_bases`` (``wrapper.rs:154``) -> cache index.

        Beyond the upload, precomputes the bases-dependent device tables
        the MSM pipeline needs per call (today: the packed-coordinate
        gather table) — the TPU analog of the reference's cached-bases
        precompute hook (``msm_host.cuh:248-265`` pre-generates per-base
        multiples).  Cached calls then skip wire decode, upload, domain
        shift AND the packing."""
        self._require_init()
        fp = self.curve.fp
        x, y = codec.points_bytes_to_limbs(fp, blob)
        dx, dy = self._upload(fp, x), self._upload(fp, y)
        self.d_bases.append((dx, dy))
        self._bases_pk.append(_pack_words_jitted(fp)(dx, dy))
        return len(self.d_bases) - 1

    def bases_pk(self, index: int):
        """Precomputed packed gather table for bases set ``index``."""
        return self._bases_pk[index]

    def init_msm_cached_scalars(self, blob: bytes) -> int:
        """``init_msm_cached_scalars`` (``wrapper.rs:171``) -> cache index."""
        self._require_init()
        fr = self.curve.fr
        s = codec.bytes_to_limbs(fr, blob)
        self.d_scalars.append(self._upload(fr, s))
        return len(self.d_scalars) - 1

    def init_msm_cached(self, bases_blob: bytes, scalars_blob: bytes) -> tuple:
        """``init_msm_cached`` (``wrapper.rs:188``)."""
        return (self.init_msm_cached_bases(bases_blob),
                self.init_msm_cached_scalars(scalars_blob))

    # -- NTT ---------------------------------------------------------------
    def init_ntt(self, omega_bytes: Optional[bytes] = None) -> None:
        """``init_ntt`` (``wrapper.rs:199``): record omega; tables are built
        lazily per log_n (the reference builds its 32-entry omega table at
        setup, ``fft.cu:63-73``).  omega_bytes: Montgomery LE bytes."""
        self._require_init()
        if omega_bytes is not None:
            fr = self.curve.fr
            limbs = codec.bytes_to_limbs(fr, omega_bytes)
            self._ntt_omega_override = fr.from_wire_int(
                codec.limbs_to_ints(fr, limbs)[0])
        self._ntt_tables.clear()

    def ntt_tables(self, log_n: int, omega_int: Optional[int] = None) -> ntt_ops.NttTables:
        fr = self.curve.fr
        omega = omega_int if omega_int is not None else self._ntt_omega_override
        key = (fr.name, log_n, omega)
        if key not in self._ntt_tables:
            if omega is not None:
                base = omega
            else:
                base = fr.root_of_unity(log_n)
            tabs = ntt_ops.make_tables(fr, log_n, base)
            self._ntt_tables[key] = tabs
        return self._ntt_tables[key]

    # -- config ------------------------------------------------------------
    def set_config(self, coordinate_type: ResultCoordinateType) -> None:
        """``set_config`` (``wrapper.rs:212-214``).

        On the device path the knob is observationally inert BY
        CONSTRUCTION: results are emitted affine-normalized (z = 1,
        ``format_affine_result``), where the Jacobian encoding and the
        reference's Jacobian->projective conversion ``(X*Z, Y, Z^3)``
        (``projective.cuh:66-77``) produce identical bytes.  Any class
        representative is a valid result under the reference's contract
        (``tests/test.rs:87-108`` normalizes before comparing).  The
        native CPU path (``interop/native.py``) does receive and honor
        the knob, matching ``msm_host.cuh``'s behavior.
        """
        self.result_coordinate_type = ResultCoordinateType(coordinate_type)

    # -- lifecycle tail ----------------------------------------------------
    def note_issued(self, *arrays) -> None:
        """Record in-flight device values so ``sync`` covers the LAST
        issued computation, not only the cached uploads."""
        self._last_issued = [a for a in arrays if hasattr(a, "block_until_ready")]

    def sync(self) -> None:
        """``sync`` (``wrapper.rs:291``): drain async dispatch — cached
        uploads AND the most recently issued computation."""
        for x, y in self.d_bases:
            x.block_until_ready()
            y.block_until_ready()
        for pk in self._bases_pk:
            pk.block_until_ready()
        for s in self.d_scalars:
            s.block_until_ready()
        for a in self._last_issued:
            a.block_until_ready()
        self._last_issued = []

    def deinit(self) -> None:
        """``deinit``/``destroy`` (``wrapper.rs:275-312``): drop caches."""
        self.d_bases.clear()
        self.d_scalars.clear()
        self._bases_pk.clear()
        self._ntt_tables.clear()

    destroy = deinit

    # -- result marshalling ------------------------------------------------
    def format_affine_result(self, pt) -> bytes:
        """Serialize a host-side affine int point ((x, y) or None) to the
        reference's 3-field LE blob (wire-domain Montgomery).  With z = 1
        the Jacobian and Projective encodings coincide (see
        ``set_config``); the identity serializes as (0, 1, 0) in both.
        This is the ONLY device-path result serializer — the device
        pipeline always affine-normalizes in the host Horner tail."""
        f = self.curve.fp
        if pt is None:
            x, y, z = 0, 1, 0
        else:
            (x, y), z = pt, 1
        blob = b""
        for v in (x, y, z):
            blob += f.to_wire_int(v).to_bytes(f.n_bytes, "little")
        return blob
