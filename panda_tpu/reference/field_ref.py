"""Pure-Python big-int field oracle.

Independent reference implementation used by the test suite to validate the
vectorized limb kernels — the same role the reference's host field library
plays (``/root/reference/src/cuda/core/field/field_host.cuh:11-473``), but
with Python integers so it cannot share bugs with the limb code.
"""

from __future__ import annotations

from ..fields.config import FieldSpec


class F:
    """Field element in Montgomery form (thin wrapper over Python ints)."""

    __slots__ = ("spec", "v")

    def __init__(self, spec: FieldSpec, mont_value: int):
        self.spec = spec
        self.v = mont_value % spec.modulus

    @classmethod
    def from_int(cls, spec: FieldSpec, a: int) -> "F":
        return cls(spec, a % spec.modulus * spec.r % spec.modulus)

    def to_int(self) -> int:
        return self.v * pow(self.spec.r, -1, self.spec.modulus) % self.spec.modulus

    def __add__(self, o): return F(self.spec, self.v + o.v)
    def __sub__(self, o): return F(self.spec, self.v - o.v)
    def __neg__(self): return F(self.spec, -self.v)

    def __mul__(self, o):
        p = self.spec.modulus
        return F(self.spec, self.v * o.v * pow(self.spec.r, -1, p) % p)

    def inv(self) -> "F":
        p = self.spec.modulus
        # (a R^-1)^-1 R = R^2 / a ... directly: mont inverse
        return F(self.spec, pow(self.v, -1, p) * self.spec.r % p * self.spec.r % p)

    def __eq__(self, o): return self.spec is o.spec and self.v == o.v
    def __repr__(self): return f"F({self.spec.name}, {hex(self.v)})"

    def is_zero(self) -> bool:
        return self.v == 0


def mont_mul_int(spec: FieldSpec, a: int, b: int) -> int:
    """Plain-int Montgomery product (operands already in Montgomery form)."""
    return a * b * pow(spec.r, -1, spec.modulus) % spec.modulus
