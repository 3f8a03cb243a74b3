"""Test harness: CPU backend with 8 virtual devices for mesh/sharding tests.

Environment must be set before jax initializes backends.  A sitecustomize
may have force-registered an accelerator platform (and set jax_platforms);
we override the config back to CPU before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

# A sitecustomize may have imported jax already, so env vars are too late —
# set the config directly.  Persistent compilation cache: EC-add graphs are
# large; re-runs of the suite should not re-pay XLA compile time.
#
# PANDA_TEST_PLATFORM=axon runs the single-device tests on the attached TPU
# (whose compiles are remote and much faster than this host's single core);
# the default stays the deterministic 8-virtual-device CPU backend, which
# the mesh/sharding tests require.
_platform = os.environ.get("PANDA_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_compile_cache" if _platform == "cpu"
                  else "/tmp/jax_cc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import random

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return random.Random(20260816)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running correctness sweeps")


# ---------------------------------------------------------------------------
# Shared conversion helpers (int <-> device arrays, oracle <-> kernel forms)
# ---------------------------------------------------------------------------

def to_mont_limbs(spec, values):
    """Plain ints -> device Montgomery limb array."""
    import jax.numpy as jnp
    from panda_tpu.fields import codec
    return jnp.asarray(codec.ints_to_limbs(
        spec, [spec.to_mont_int(v) for v in values]))


def from_mont_limbs(spec, arr):
    """Device Montgomery limb array -> plain ints (canonicalizes)."""
    from panda_tpu.fields import codec, mont
    return codec.limbs_to_ints(spec, np.asarray(mont.from_mont(spec, arr)))


def points_to_device(curve, pts):
    """Affine int pairs -> (px, py) Montgomery limb arrays."""
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    return to_mont_limbs(curve.fp, xs), to_mont_limbs(curve.fp, ys)


def proj_to_oracle(curve, pp):
    """ProjPoint batch -> list of affine int pairs (None = identity)."""
    import jax
    from panda_tpu.curves import point as cp
    aff = jax.jit(lambda q: cp.to_affine(curve, q))(pp)
    xs = from_mont_limbs(curve.fp, aff.x)
    ys = from_mont_limbs(curve.fp, aff.y)
    if isinstance(xs, list):
        return [None if (x == 0 and y == 0) else (x, y)
                for x, y in zip(xs, ys)]
    return None


@pytest.fixture(scope="session")
def helpers():
    class H:
        pass
    H.to_mont_limbs = staticmethod(to_mont_limbs)
    H.from_mont_limbs = staticmethod(from_mont_limbs)
    H.points_to_device = staticmethod(points_to_device)
    H.proj_to_oracle = staticmethod(proj_to_oracle)
    return H
