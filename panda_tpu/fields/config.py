"""Field parameter packs, derived from the modulus at import time.

Plays the role of the reference's per-curve constant packs
(``/root/reference/src/cuda/core/curve/bn254/paramter.cuh:7-273`` and
``bls12_377/paramter.cuh``), but instead of hard-coding limb tables every
constant (R, R^2, -p^-1, 2p, ...) is computed here from the modulus with
Python big ints.

TPU-native representation
-------------------------
The reference stores field elements as 8x32-bit (or 6x64-bit) limbs and
multiplies them with PTX add-with-carry chains.  The TPU VPU has neither a
carry flag nor a 64-bit multiplier, so we use **16-bit limbs held in uint32
lanes**: a 16x16 -> 32-bit product is exact in uint32 arithmetic, and up to
~2^15 partial products can be accumulated in a uint32 before any carry has
to be resolved.  A BN254 element is 16 limbs (R = 2^256); a BLS12-377 base
field element is 24 limbs (R = 2^384).

Canonical array layout is **limbs-first**: ``uint32[L, *batch]`` so that the
batch dimension lands on TPU vector lanes and every limb operation is a
full-width VPU op.

Values live in the lazy Montgomery domain ``[0, 2p)`` (R >= 4p for all
supported fields, so CIOS output stays < 2p with no final subtraction).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

# 15-bit limbs in uint32 lanes: one redundant bit lets modular add/sub skip
# carry propagation entirely while 16x16->32-bit products stay exact.  See
# fields/mont.py for the full bounds discipline.
LIMB_BITS = 15
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    """Little-endian 16-bit limb decomposition as uint32[n_limbs]."""
    if value < 0:
        raise ValueError("negative value")
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (value >> (LIMB_BITS * i)) & LIMB_MASK
    if value >> (LIMB_BITS * n_limbs):
        raise ValueError("value does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    """Inverse of :func:`int_to_limbs` (accepts any integer array)."""
    val = 0
    for i, limb in enumerate(np.asarray(limbs).tolist()):
        val += int(limb) << (LIMB_BITS * i)
    return val


@dataclass(frozen=True)
class FieldSpec:
    """All compile-time constants for one prime field.

    Hashable/frozen so it can be used as a static argument to jitted
    functions.  Heavier derived numpy constants are exposed as cached
    properties.
    """

    name: str
    modulus: int
    # Generator of the multiplicative group (used for NTT roots); 0 if unused.
    generator: int = 0
    # Largest s with 2^s | modulus - 1 (two-adicity); 0 if unused.
    two_adicity: int = 0

    def __post_init__(self):
        if self.modulus % 2 == 0:
            raise ValueError("modulus must be odd")

    # -- scalar integers ---------------------------------------------------
    @functools.cached_property
    def bits(self) -> int:
        return self.modulus.bit_length()

    @functools.cached_property
    def n_limbs(self) -> int:
        """Limb count; R = 2^(15 * n_limbs) must satisfy R >= 4096 p so that
        lazily-reduced intermediates (values up to ~64p) multiply safely."""
        n = -(-self.bits // LIMB_BITS)
        while (1 << (LIMB_BITS * n)) < 4096 * self.modulus:
            n += 1
        return n

    @functools.cached_property
    def n_bytes(self) -> int:
        """Wire-format width: the reference's byte layout (32 for 254-bit
        fields, 48 for BLS12-377 Fp), i.e. ceil(bits/64)*8 LE bytes."""
        return -(-self.bits // 64) * 8

    @functools.cached_property
    def r(self) -> int:
        """Montgomery radix R = 2^(15 L)."""
        return 1 << (LIMB_BITS * self.n_limbs)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return self.r % self.modulus

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return self.r * self.r % self.modulus

    @functools.cached_property
    def neg_inv(self) -> int:
        """-p^-1 mod 2^15 (per-limb Montgomery factor)."""
        return (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    # -- numpy limb constants ---------------------------------------------
    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @functools.cached_property
    def two_p_limbs(self) -> np.ndarray:
        return int_to_limbs(2 * self.modulus, self.n_limbs)

    @functools.cached_property
    def r_minus_two_p_limbs(self) -> np.ndarray:
        """K = R - 2p, used for branch-free modular subtraction."""
        return int_to_limbs(self.r - 2 * self.modulus, self.n_limbs)

    @functools.cached_property
    def one_limbs(self) -> np.ndarray:
        """1 in Montgomery form (= R mod p)."""
        return int_to_limbs(self.r_mod_p, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2_mod_p, self.n_limbs)

    @functools.cached_property
    def unity_limbs(self) -> np.ndarray:
        """Plain integer 1 (NOT Montgomery form)."""
        return int_to_limbs(1, self.n_limbs)

    @functools.cached_property
    def zero_limbs(self) -> np.ndarray:
        return np.zeros(self.n_limbs, dtype=np.uint32)

    # -- wire-format Montgomery domain ------------------------------------
    # The FFI byte contract inherits arkworks' 64-bit-limb Montgomery form:
    # R_wire = 2^256 for 254-bit fields, 2^384 for BLS12-377 Fp (see the
    # reference's ONE constant, bn254/paramter.cuh:112).  Our internal
    # 15-bit-limb domain uses R = 2^(15L); the codec boundary converts.
    @functools.cached_property
    def wire_r(self) -> int:
        return 1 << (8 * self.n_bytes)

    @functools.cached_property
    def wire_in_limbs(self) -> np.ndarray:
        """Montgomery-multiply constant: wire-domain -> internal-domain.

        mont_mul(V, C) with C = R^2 / R_wire turns V = a*R_wire into a*R.
        """
        c = self.r * self.r * pow(self.wire_r, -1, self.modulus) % self.modulus
        return int_to_limbs(c, self.n_limbs)

    @functools.cached_property
    def wire_out_limbs(self) -> np.ndarray:
        """Montgomery-multiply constant: internal-domain -> wire-domain."""
        return int_to_limbs(self.wire_r % self.modulus, self.n_limbs)

    def to_wire_int(self, a: int) -> int:
        """Plain int -> wire-format (Montgomery R_wire) integer value."""
        return a * self.wire_r % self.modulus

    def from_wire_int(self, v: int) -> int:
        return v * pow(self.wire_r, -1, self.modulus) % self.modulus

    # -- internal Montgomery helpers on Python ints -----------------------
    def to_mont_int(self, a: int) -> int:
        return a * self.r % self.modulus

    def from_mont_int(self, a: int) -> int:
        return a * pow(self.r, -1, self.modulus) % self.modulus

    def mont_limbs(self, a: int) -> np.ndarray:
        """Montgomery form of integer ``a`` as limbs."""
        return int_to_limbs(self.to_mont_int(a), self.n_limbs)

    # -- NTT roots ---------------------------------------------------------
    def root_of_unity(self, log_n: int) -> int:
        """Primitive 2^log_n-th root of unity (plain integer form)."""
        if not self.two_adicity or not self.generator:
            raise ValueError(f"{self.name} has no configured 2-adic subgroup")
        if log_n > self.two_adicity:
            raise ValueError(
                f"log_n={log_n} exceeds two-adicity {self.two_adicity}")
        exp = (self.modulus - 1) >> log_n
        return pow(self.generator, exp, self.modulus)

    def __hash__(self):
        return hash((self.name, self.modulus))

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.bits} bits, {self.n_limbs} limbs)"


# ---------------------------------------------------------------------------
# Concrete fields.
#
# Moduli follow the reference's parameter packs:
#   BN254 Fp/Fr:    /root/reference/src/cuda/core/curve/bn254/paramter.cuh:18,134
#   BLS12-377 Fp/Fr: /root/reference/src/cuda/core/curve/bls12_377/paramter.cuh
# The BN254 Fr NTT generator (7) matches paramter.cuh:246 (halo2curves
# convention); omega_log_order = 28 matches paramter.cuh:242.
# ---------------------------------------------------------------------------

BN254_FP = FieldSpec(
    name="bn254_fp",
    modulus=21888242871839275222246405745257275088696311157297823662689037894645226208583,
)

BN254_FR = FieldSpec(
    name="bn254_fr",
    modulus=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=7,
    two_adicity=28,
)

BLS12_377_FP = FieldSpec(
    name="bls12_377_fp",
    modulus=0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
)

BLS12_377_FR = FieldSpec(
    name="bls12_377_fr",
    modulus=0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    generator=22,
    two_adicity=47,
)

BLS12_381_FP = FieldSpec(
    name="bls12_381_fp",
    modulus=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
)

BLS12_381_FR = FieldSpec(
    name="bls12_381_fr",
    modulus=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    generator=7,
    two_adicity=32,
)

ALL_FIELDS = (BN254_FP, BN254_FR, BLS12_377_FP, BLS12_377_FR,
              BLS12_381_FP, BLS12_381_FR)
