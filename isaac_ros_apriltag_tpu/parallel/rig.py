"""Multi-camera rig detection: data parallelism over a device mesh.

The reference runs one detector node per camera inside a multithreaded
container (survey §2.3); here a 16-camera rig is one jit program — frames
batched on a leading axis, sharded over the mesh 'cam' axis, detector vmapped
inside. XLA partitions the whole pipeline per device; results come back as a
sharded Detections pytree (BASELINE config #5's rig substrate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..camera.model import CameraModel
from ..config import DetectorConfig
from ..detector import build_detect_fn
from ..types import Detections, FrameStats
from .mesh import make_mesh


class RigDetector:
    """Detect over a batch of frames (one per camera) sharded across devices.

    All cameras share intrinsics/config in this entry point (the common
    production rig case); per-camera intrinsics are supported by passing a
    batched CameraModel pytree with a leading camera axis.
    """

    def __init__(self, config: DetectorConfig, camera: CameraModel,
                 n_cameras: int, mesh=None, encoding: str = "mono8"):
        self.config = config
        self.camera = camera
        self.n_cameras = int(n_cameras)
        self.mesh = mesh if mesh is not None else make_mesh()
        fn = build_detect_fn(config, camera, encoding)
        vfn = jax.vmap(fn)
        in_s = NamedSharding(self.mesh, P("cam"))
        out_s = NamedSharding(self.mesh, P("cam"))
        self._jitted = jax.jit(vfn, in_shardings=in_s, out_shardings=out_s)

    def detect(self, frames) -> tuple[Detections, FrameStats]:
        """frames: (n_cameras, H, W) uint8 (mono) or (..., C) per encoding."""
        frames = jnp.asarray(frames)
        assert frames.shape[0] == self.n_cameras, frames.shape
        return self._jitted(frames)
