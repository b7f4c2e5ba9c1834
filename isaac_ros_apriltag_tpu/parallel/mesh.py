"""Device mesh construction + sharding helpers.

The reference's concurrency story is CUDA streams + a multithreaded ROS
component container in one process (survey §2.3; ref: launch/
isaac_ros_apriltag_usb_cam.launch.py:81). The TPU-native scaling axes are a
jax device mesh with named axes:

  'cam'  — data parallelism across cameras of a rig (and/or frame batches)
  'map'  — map-block parallelism for the SLAM layer (landmark shards)

Collectives ride ICI within a slice and DCN across hosts; jax.sharding +
shard_map insert them from the named-axis program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join this process to a multi-host TPU pod run (survey §5.8).

    Thin deterministic wrapper over jax.distributed.initialize: on TPU pods
    the arguments are discovered from the environment (call with no args on
    each host); for CPU/GPU test rigs pass them explicitly. Must run before
    any jax computation. After it, jax.devices() spans the whole pod and
    make_mesh() lays the ('cam', 'map') axes across ICI first (devices are
    enumerated host-major, so contiguous axis blocks stay on-host/ICI and
    the 'map' psum crosses DCN only between hosts' blocks).

    The reference has no multi-machine story at all (DDS pub/sub inside one
    node graph); this is the entry point its replacement needs for the
    4-host/16-camera BASELINE configuration.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_cam: int | None = None, n_map: int = 1,
              devices=None) -> Mesh:
    """Build a (cam, map) mesh over the available devices.

    Defaults to all devices on the 'cam' axis (the throughput axis for
    detection). n_cam * n_map must divide the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_cam is None:
        n_cam = n // n_map
    assert n_cam * n_map <= n, (n_cam, n_map, n)
    devs = np.asarray(devices[:n_cam * n_map]).reshape(n_cam, n_map)
    return Mesh(devs, ("cam", "map"))


def cam_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (B, ...) batch of frames over the 'cam' axis."""
    return NamedSharding(mesh, P("cam"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def map_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (L, ...) landmark/map-block array over the 'map' axis."""
    return NamedSharding(mesh, P("map"))
