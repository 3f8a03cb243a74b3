"""Multi-host pod-slice bring-up: the TPU-native replacement for the
communication backend the reference never had (SURVEY.md §2.9: peer-access
FFI stubs exist but are never called — ``src/gpu_ffi/binding.rs:54-56``).

On a multi-host TPU slice every host runs the same program;
:func:`initialize` wires them into one JAX runtime (GRPC coordination +
ICI/DCN collectives), after which ``jax.devices()`` spans the whole slice
and the ``shard_map`` pipelines in this package scale transparently.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection defaults.

    On Cloud TPU all three arguments are discovered from the metadata
    environment; pass them explicitly elsewhere.  Idempotent.
    """
    state = jax.distributed.global_state
    if getattr(state, "client", None) is not None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(axis: str = "points", devices=None) -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) slice.

    Both workloads here shard along a single axis (MSM points / NTT rows);
    XLA routes the resulting collectives over ICI within a host's chips and
    DCN across hosts.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def host_local_slice(n: int, axis_size: int | None = None) -> slice:
    """The [start, stop) range of a length-n global axis owned by this
    process (for building the host-local shard of a globally-sharded input
    via ``jax.make_array_from_process_local_data``)."""
    procs = jax.process_count()
    pid = jax.process_index()
    per = -(-n // procs)
    return slice(pid * per, min((pid + 1) * per, n))
