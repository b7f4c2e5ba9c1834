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

    Cameras may share intrinsics (pass one `camera` — the common production
    rig case) or carry INDEPENDENT intrinsics (pass `cameras`, a list of
    per-camera CameraModels — the reference's one-node-per-camera model with
    its own CameraInfo, ref: launch/isaac_ros_apriltag_usb_cam.launch.py).
    Frame geometry (H, W) must match across the rig (one jit program);
    intrinsics enter the pose stage as a batched (n, 3, 3) K sharded with
    the frames, so each camera's detections are posed with its own K.
    """

    def __init__(self, config: DetectorConfig, camera: CameraModel,
                 n_cameras: int, mesh=None, encoding: str = "mono8",
                 cameras: list[CameraModel] | None = None):
        self.config = config
        self.camera = camera
        self.n_cameras = int(n_cameras)
        self.mesh = mesh if mesh is not None else make_mesh()
        # Per-camera rigs re-pose with their own K below, so the shared-K
        # pose stage is skipped entirely (poses are computed exactly once).
        fn = build_detect_fn(config, camera, encoding,
                             with_pose=cameras is None)
        in_s = NamedSharding(self.mesh, P("cam"))
        out_s = NamedSharding(self.mesh, P("cam"))
        if cameras is None:
            self._jitted = jax.jit(jax.vmap(fn), in_shardings=in_s,
                                   out_shardings=out_s)
        else:
            if len(cameras) != self.n_cameras:
                raise ValueError(f"{len(cameras)} cameras for "
                                 f"{self.n_cameras}-camera rig")
            K_batch = jnp.stack([jnp.asarray(c.K) for c in cameras])
            from ..ops.pose import estimate_poses

            def per_cam(frame, K):
                det, stats = fn(frame)
                # Re-pose with this camera's K: intrinsics affect only the
                # pose stage (corners are pure image-space measurements).
                poses = estimate_poses(det.corners, K, config.tag_size)
                import dataclasses as _dc
                det = _dc.replace(det, translation=poses.translation,
                                  quaternion=poses.quaternion,
                                  rotation=poses.rotation)
                return det, stats

            self._jitted = jax.jit(
                jax.vmap(per_cam), in_shardings=(in_s, in_s),
                out_shardings=out_s)
            self._K_batch = K_batch
        self._per_camera = cameras is not None

    def detect(self, frames) -> tuple[Detections, FrameStats]:
        """frames: (n_cameras, H, W) uint8 (mono) or (..., C) per encoding."""
        frames = jnp.asarray(frames)
        assert frames.shape[0] == self.n_cameras, frames.shape
        if self._per_camera:
            return self._jitted(frames, self._K_batch)
        return self._jitted(frames)
