"""Camera model: pinhole intrinsics + plumb_bob distortion + rectify maps.

Replaces the reference's reliance on sensor_msgs/CameraInfo + the external
isaac_ros_image_proc RectifyNode (ref: isaac_ros_apriltag/package.xml:49,
launch/isaac_ros_apriltag_usb_cam.launch.py:43-52). The camera is a frozen
pytree; the rectification map is precomputed once (host/numpy) and the
per-frame remap is a pure-array op (ops/remap.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Pinhole camera with optional plumb_bob (Brown-Conrady) distortion.

    K: (3, 3) intrinsics; dist: (5,) = (k1, k2, p1, p2, k3);
    width/height are static (jit-constant), matching the reference's
    freeze-at-first-frame contract (ref: apriltag_node.cpp:228-231).
    """

    K: jax.Array
    dist: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(fx, fy, cx, cy, width, height, dist=None) -> "CameraModel":
        K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
        d = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
        return CameraModel(K=K, dist=d, width=int(width), height=int(height))

    @staticmethod
    def from_camera_info(info: dict) -> "CameraModel":
        """Build from a ROS CameraInfo-style dict (keys: K or k, D or d, width, height).

        Mirrors the intrinsics extraction at ref: apriltag_node.cpp:441-447.
        """
        K = np.asarray(info.get("K", info.get("k")), np.float32).reshape(3, 3)
        D = np.asarray(info.get("D", info.get("d", [0.0] * 5)), np.float32)
        D = np.pad(D, (0, max(0, 5 - D.size)))[:5]
        return CameraModel(K=jnp.asarray(K), dist=jnp.asarray(D),
                           width=int(info["width"]), height=int(info["height"]))

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    def has_distortion(self) -> bool:
        return bool(np.any(np.asarray(self.dist) != 0.0))

    def distort_normalized(self, xy: jax.Array) -> jax.Array:
        """Apply plumb_bob distortion to normalized coords (..., 2)."""
        k1, k2, p1, p2, k3 = [self.dist[i] for i in range(5)]
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], -1)

    def project(self, pts_cam: jax.Array) -> jax.Array:
        """Project camera-frame 3D points (..., 3) to pixels (..., 2)."""
        xy = pts_cam[..., :2] / pts_cam[..., 2:3]
        xyd = self.distort_normalized(xy)
        return jnp.stack([self.fx * xyd[..., 0] + self.cx,
                          self.fy * xyd[..., 1] + self.cy], -1)

    def rectify_map(self, scale: float = 1.0) -> np.ndarray:
        """Precompute the undistortion remap grid.

        Returns (H', W', 2) float32 of source pixel coords (x, y) for every
        rectified output pixel, where (H', W') = scale * (height, width).
        Rectified pixels reuse this camera's K (scaled); forward distortion is
        applied per output pixel — the standard initUndistortRectifyMap recipe,
        computed in numpy once at setup.
        """
        H = int(round(self.height * scale))
        W = int(round(self.width * scale))
        K = np.asarray(self.K, np.float64)
        fx, fy = K[0, 0] * scale, K[1, 1] * scale
        cx, cy = K[0, 2] * scale, K[1, 2] * scale
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        x = (u - cx) / fx
        y = (v - cy) / fy
        k1, k2, p1, p2, k3 = np.asarray(self.dist, np.float64)
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        src_u = np.asarray(self.K, np.float64)[0, 0] * xd + np.asarray(self.K)[0, 2]
        src_v = np.asarray(self.K, np.float64)[1, 1] * yd + np.asarray(self.K)[1, 2]
        return np.stack([src_u, src_v], -1).astype(np.float32)

    def scaled(self, scale: float) -> "CameraModel":
        """Camera for a resized image (intrinsics scaled, distortion kept)."""
        K = self.K * jnp.array([[scale], [scale], [1.0]], jnp.float32)
        return CameraModel(K=K, dist=self.dist,
                           width=int(round(self.width * scale)),
                           height=int(round(self.height * scale)))
