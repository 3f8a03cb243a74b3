"""Multi-host bring-up helpers (single-process behavior on the CPU mesh)."""

import jax

from panda_tpu.parallel import cluster


def test_pod_mesh_spans_devices():
    mesh = cluster.pod_mesh("points")
    assert mesh.axis_names == ("points",)
    assert mesh.size == jax.device_count() >= 1


def test_host_local_slice_single_process():
    s = cluster.host_local_slice(100)
    assert (s.start, s.stop) == (0, 100)