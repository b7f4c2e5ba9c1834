"""Dev: numpy ground-truth of boundary pairs vs extract_clusters output."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops import ccl, clusters, threshold
from isaac_ros_apriltag_tpu.ops.grayscale import grayscale
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

cam = CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0, width=640, height=480)
fam = get_family("tag36h11")
t = np.array([0.05, -0.02, 0.8])
R = upright_pose(t)
ts = 0.16
img = render_tags(np.asarray(cam.K), (480, 640),
                  [dict(family=fam, id=3, R=R, t=t, tag_size=ts)])
cfg = DetectorConfig(backend="xla", tag_size=ts)


@jax.jit
def stage(gray):
    tri = threshold.adaptive_threshold(gray, cfg.tile_size, cfg.min_white_black_diff)
    lab = ccl.connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps)
    return tri, lab


gray = grayscale(jnp.asarray(img), "mono8")
tri, lab = stage(gray)
tri = np.asarray(tri).astype(np.int32)
lab = np.asarray(lab)

H, W = tri.shape
pairs = {}
for dx, dy in ((1, 0), (0, 1), (-1, 1), (1, 1)):
    ys, xs = np.mgrid[0:H, 0:W]
    y2, x2 = ys + dy, xs + dx
    ok = (y2 >= 0) & (y2 < H) & (x2 >= 0) & (x2 < W)
    v0 = tri
    v1 = np.full_like(tri, 127)
    v1[ok] = tri[np.clip(y2, 0, H - 1), np.clip(x2, 0, W - 1)][ok]
    m = (v0 + v1) == 255
    l0 = lab
    l1 = np.zeros_like(lab)
    l1[ok] = lab[np.clip(y2, 0, H - 1), np.clip(x2, 0, W - 1)][ok]
    pb = v0 == 0
    lb = np.where(pb, l0, l1)
    lw = np.where(pb, l1, l0)
    for yy, xx in zip(*np.nonzero(m)):
        key = (lb[yy, xx], lw[yy, xx])
        pairs.setdefault(key, []).append((xx + dx / 2, yy + dy / 2))

print("segments (sorted by size):")
for key, pts in sorted(pairs.items(), key=lambda kv: -len(kv[1]))[:8]:
    pts = np.array(pts)
    print(f"  key={key} n={len(pts)} x[{pts[:,0].min()},{pts[:,0].max()}] "
          f"y[{pts[:,1].min()},{pts[:,1].max()}]")
