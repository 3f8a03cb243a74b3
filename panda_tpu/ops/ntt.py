"""Number-theoretic transform over the scalar field, TPU-native.

The reference's NTT (``/root/reference/src/cuda/core/unit/ntt/fft.cu``) is a
shared-memory radix-2^k GPU FFT whose butterfly bodies are compiled out
(``#if 0`` — see SURVEY.md C21); what it pins down is the contract: a
device-resident omega-powers table built at setup (``fft.cu:63-73``), a
radix-round driver with ping-pong buffers, and Montgomery-form inputs and
outputs.  We keep that contract and supply real butterflies.

TPU formulation: iterative Cooley-Tukey, decimation-in-time, bit-reversed
input permutation (one gather) followed by log2(n) fully vectorized
butterfly stages.  Each stage is a reshape + one Montgomery multiply by a
broadcast twiddle slice + lazy-domain add/sub over the whole array: pure
VPU work with no data-dependent control flow.  Twiddle powers
[w^0 .. w^(n/2-1)] are built on device in log2(n) doubling steps.

The transform is X[k] = sum_j x[j] w^(jk) with w a primitive n-th root of
unity; INTT uses w^-1 and scales by n^-1.  All values Montgomery, lazy
domain [0, 2p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import mont
from ..fields.config import FieldSpec, int_to_limbs


def _use_fmul(batch_elems: int) -> bool:
    """Route stage twiddle multiplies through the fused Pallas kernel on
    TPU for large transforms (PANDA_PALLAS=0 opts out; see
    ops/backend.py for the interpret test mode)."""
    from . import backend
    if batch_elems < 4096:
        return False
    return backend.kernels_enabled()


class NttTables:
    """Per-(field, log_n) tables (reference: ``fft.cu:63-73``).

    The stagewise-engine arrays (bit-reversal permutation and the two
    (L, n/2) twiddle tables) build LAZILY on first attribute access: the
    default MXU engine needs only ``omega``/``log_n`` (its own constant
    tables live in the mxu plan cache), and eagerly building 2*2^(n-1)
    twiddles costs ~log_n sequential device dispatches — measured minutes
    of remote-compile wall clock at 2^20 on the axon platform.
    """

    def __init__(self, spec: FieldSpec, log_n: int, omega: int):
        self.spec = spec
        self.log_n = log_n
        self.omega = omega                 # forward root (plain int)

    # Each table materializes under ensure_compile_time_eval so a FIRST
    # access from inside a jit trace still caches a concrete array, not a
    # tracer (which would leak and poison every later use).

    @functools.cached_property
    def bitrev(self) -> jnp.ndarray:       # (n,) int32 permutation
        with jax.ensure_compile_time_eval():
            return jnp.asarray(bit_reverse_permutation(self.log_n))

    @functools.cached_property
    def w_pows(self) -> jnp.ndarray:       # (L, n/2) fwd twiddles, Montgomery
        with jax.ensure_compile_time_eval():
            return _power_table(self.spec, self.omega,
                                max((1 << self.log_n) // 2, 1))

    @functools.cached_property
    def w_inv_pows(self) -> jnp.ndarray:   # (L, n/2) inverse twiddles
        with jax.ensure_compile_time_eval():
            return _power_table(self.spec,
                                pow(self.omega, -1, self.spec.modulus),
                                max((1 << self.log_n) // 2, 1))

    @functools.cached_property
    def n_inv(self) -> np.ndarray:         # (L,) n^-1 Montgomery limbs (host)
        return self.spec.mont_limbs(
            pow(1 << self.log_n, -1, self.spec.modulus))


def bit_reverse_permutation(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for _ in range(log_n):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)


def _power_table(spec: FieldSpec, omega: int, length: int) -> jnp.ndarray:
    """[w^0, ..., w^(length-1)] Montgomery limbs.

    Built HOST-SIDE (big-int cumprod + limb split, ~2s at 2^19): the
    previous device-doubling chain compiled ~log2(length) distinct shapes,
    minutes of remote-compile wall clock per cold process on axon.
    """
    from ..fields import codec
    p = spec.modulus
    vals = [0] * length
    acc = 1
    for i in range(length):
        vals[i] = spec.to_mont_int(acc)
        acc = acc * omega % p
    return jnp.asarray(codec.ints_to_limbs(spec, vals))


def make_tables(spec: FieldSpec, log_n: int, omega: int | None = None) -> NttTables:
    """Build NTT tables (lazily — see NttTables).  omega is a plain
    (non-Montgomery) integer; defaults to the field's canonical 2^log_n
    root of unity (generator convention of ``bn254/paramter.cuh:241-258``)."""
    if omega is None:
        omega = spec.root_of_unity(log_n)
    return NttTables(spec, log_n, omega)


def _butterfly_stages(spec: FieldSpec, x: jnp.ndarray, w_pows: jnp.ndarray,
                      log_n: int, in_mult: int = 2) -> jnp.ndarray:
    """log2(n) DIT stages over the last axis.  x: (L, *batch, n) bit-reversed.

    Values stay lazily reduced: each stage adds ~3p to the static value
    bound (tracked exactly through the FE machinery), so no per-stage
    canonicalization is ever needed — adds/subs are single vector ops.
    Returns (limb array, exact value bound) for the caller's finisher.
    """
    n = 1 << log_n
    L = x.shape[0]
    batch = x.shape[1:-1]
    nb = len(batch)
    vb = in_mult * spec.modulus
    for s in range(log_n):
        m = 1 << s               # half-size of each butterfly block
        g = n // (2 * m)         # number of blocks
        xr = x.reshape((L,) + batch + (g, 2, m))
        u = mont.FE(xr[..., 0, :], 1 << 15, vb)
        v = mont.FE(xr[..., 1, :], 1 << 15, vb)
        if s == 0:
            t = v            # stage-0 twiddle is w^0 = 1: no multiply
        else:
            tw = w_pows[:, 0:n // 2:g]                  # (L, m)
            tw_r = tw.reshape((L,) + (1,) * nb + (1, m))
            if _use_fmul((n // 2) * (int(np.prod(batch)) if batch else 1)):
                # One fused kernel instead of the ~4L^2-op XLA expansion.
                from . import point_pallas
                vn = mont.norm(spec, v)
                tb = jnp.broadcast_to(tw_r, vn.v.shape).reshape(L, -1)
                from . import backend
                prod = point_pallas.fmul(spec, vn.v.reshape(L, -1), tb,
                                         vb_a=vn.vb, vb_b=2 * spec.modulus,
                                         interpret=backend.interpret())
                t = mont.FE(prod.reshape(vn.v.shape), 1 << 15,
                            2 * spec.modulus)
            else:
                tw_fe = mont.FE(tw_r, 1 << 15, 2 * spec.modulus)
                t = mont.mul(spec, v, tw_fe)
        hi = mont.norm(spec, mont.add(spec, u, t))
        lo = mont.norm(spec, mont.sub(spec, u, t))
        vb = max(hi.vb, lo.vb)
        x = jnp.stack([hi.v, lo.v], axis=-2).reshape((L,) + batch + (n,))
    return x, vb


def _finish(spec: FieldSpec, y: jnp.ndarray, vb: int, inverse: bool,
            n_inv_limbs=None) -> jnp.ndarray:
    """Transform tail: scale by n^-1 for the inverse, canonicalize to [0, p).

    vb is the exact value bound propagated out of the butterfly stages —
    using anything looser would under-reduce and corrupt the wire bytes.
    """
    if inverse:
        n_inv = mont.FE(
            n_inv_limbs.reshape((spec.n_limbs,) + (1,) * (y.ndim - 1)),
            1 << 15, 2 * spec.modulus)
        out = mont.mul(spec, mont.FE(y, 1 << 15, vb), n_inv)
        return mont.canonical(spec, out)
    return mont.canonical(spec, mont.FE(y, 1 << 15, vb))


def ntt(spec: FieldSpec, x: jnp.ndarray, tables: NttTables) -> jnp.ndarray:
    """Forward NTT along the last axis.  x: uint32[L, *batch, n] Montgomery,
    canonical output in [0, p)."""
    x = jnp.take(x, tables.bitrev, axis=-1)
    y, vb = _butterfly_stages(spec, x, tables.w_pows, tables.log_n)
    return _finish(spec, y, vb, False)


def intt(spec: FieldSpec, x: jnp.ndarray, tables: NttTables) -> jnp.ndarray:
    """Inverse NTT along the last axis (includes the n^-1 scaling)."""
    x = jnp.take(x, tables.bitrev, axis=-1)
    y, vb = _butterfly_stages(spec, x, tables.w_inv_pows, tables.log_n)
    return _finish(spec, y, vb, True, jnp.asarray(tables.n_inv))


@functools.lru_cache(maxsize=32)
def ntt_jitted(spec: FieldSpec, log_n: int, inverse: bool = False,
               mode: str | None = None):
    """Jitted transform taking table arrays as runtime arguments.

    (log_n drives Python-level loop structure so it must be static; the
    resolved kernel ``mode`` keys the cache because the stage bodies read
    the backend gate at trace time.)
    """
    from . import backend

    def run(x, bitrev, w_pows, n_inv_limbs):
        with backend.forced(mode):
            x = jnp.take(x, bitrev, axis=-1)
            y, vb = _butterfly_stages(spec, x, w_pows, log_n)
            return _finish(spec, y, vb, inverse, n_inv_limbs)

    return jax.jit(run)


_FUSED_MIN_LOG_N = 10


@functools.lru_cache(maxsize=32)
def _fused_jitted(spec: FieldSpec, log_n: int, inverse: bool, omega: int,
                  mode: str):
    """Keyed on the resolved kernel mode: the engine bodies read the
    backend gate at TRACE time, so distinct modes must map to distinct
    jitted callables (same stale-trace-cache hazard fixed for MSM)."""
    from . import backend, ntt_pallas

    def run(x):
        with backend.forced(mode):
            return ntt_pallas.fused_ntt(spec, x, log_n=log_n,
                                        inverse=inverse, omega=omega)

    return jax.jit(run)


def _ntt_fused_flag(mode: str) -> bool:
    """Fused Pallas dft passes (ops/ntt_fused.py) on kernel-enabled
    backends.  PANDA_NTT_FUSED=0 falls back to the unfused XLA engine.
    Read at call time and passed INTO the lru_cache key below — an env
    flip between calls must not silently reuse the other executable."""
    import os
    return os.environ.get("PANDA_NTT_FUSED", "1") != "0" and mode != "off"


@functools.lru_cache(maxsize=32)
def _mxu_jitted(spec: FieldSpec, log_n: int, inverse: bool, omega: int,
                mode: str, fused: bool = False):
    from . import backend, ntt_mxu
    # Fused: one kernel per four-step level, maxk=5 so the DFT matrix
    # stays VMEM-resident.  Measured on v5e at 2^20: 90.6 M elem/s vs
    # 72.4 for the XLA dft_apply2 form (bit-identical;
    # tools/ab_ntt_fused.py).
    plan = ntt_mxu.mxu_plan(spec, log_n, inverse, omega=omega,
                            maxk=5 if fused else 7, fused=fused)
    tables = ntt_mxu.plan_tables(plan)

    def run(x, tabs):
        with backend.forced(mode):
            return ntt_mxu.apply_ntt(plan, x, tabs)

    jfn = jax.jit(run)
    return lambda x: jfn(x, tables)


def _ntt_impl() -> str:
    """auto | mxu | pallas | jnp (PANDA_NTT_IMPL)."""
    import os
    return os.environ.get("PANDA_NTT_IMPL", "auto")


def run_ntt(spec: FieldSpec, x: jnp.ndarray, tables: NttTables,
            inverse: bool = False, kernels: str | None = None) -> jnp.ndarray:
    """Convenience wrapper dispatching to the jitted kernel.

    On TPU, large transforms route through the MXU matmul engine
    (ops/ntt_mxu.py); PANDA_NTT_IMPL selects pallas (fused VPU kernels,
    ops/ntt_pallas.py) or jnp (stagewise) explicitly.  All paths
    canonicalize — bit-identical output.  ``kernels`` pins the fused-kernel
    mode explicitly (on/off/interpret); None reads the PANDA_PALLAS gate.
    """
    from . import backend
    mode = kernels if kernels is not None else backend.mode()
    if mode not in backend._MODES:
        raise ValueError(f"kernel mode must be one of {backend._MODES},"
                         f" got {mode!r}")
    impl = _ntt_impl()
    big = tables.log_n >= _FUSED_MIN_LOG_N and tables.omega
    if tables.omega and (impl == "mxu"
                         or (impl == "auto" and big and mode != "off")):
        return _mxu_jitted(spec, tables.log_n, inverse, tables.omega, mode,
                           _ntt_fused_flag(mode))(x)
    if impl == "pallas" and big and mode != "off":
        return _fused_jitted(spec, tables.log_n, inverse, tables.omega,
                             mode)(x)
    fn = ntt_jitted(spec, tables.log_n, inverse, mode)
    return fn(x, tables.bitrev,
              tables.w_inv_pows if inverse else tables.w_pows,
              jnp.asarray(tables.n_inv))
