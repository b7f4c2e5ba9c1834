"""Time the COMPOSED detect fn (one jit) vs vmapped batch — locates the
gap between the sum-of-stages time and the end-to-end bench time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.detector import build_detect_fn
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

H, W = 1080, 1920
cam = CameraModel.create(fx=900.0, fy=900.0, cx=W / 2, cy=H / 2,
                         width=W, height=H)
fam = get_family("tag36h11")
tags = []
for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                            (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
    t = np.array([x, y, 2.5])
    tags.append(dict(family=fam, id=7 * i + 1, R=upright_pose(t, 0.1 * i),
                     t=t, tag_size=0.3))
_CACHE = "/tmp/bench_frame_1080_noise2.npy"
if os.path.exists(_CACHE):
    frame = np.load(_CACHE)
else:
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=2.0)
    np.save(_CACHE, frame)
print("rendered", flush=True)

cfg = DetectorConfig(tag_size=0.3,
                     backend=os.environ.get("BENCH_BACKEND", "xla"))
detect = build_detect_fn(cfg, cam, encoding="mono8")

x1 = jnp.asarray(frame)


def bench(name, fn, x, iters=10, frames=1):
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    det, stats = out
    print(f"{name}: {1000*dt/frames:.3f} ms/frame  "
          f"ndet={int(stats.num_detections) if frames==1 else int(np.asarray(stats.num_detections).sum())} "
          f"nedge={np.asarray(stats.num_edge_points).ravel()[0]} "
          f"stride={np.asarray(stats.edge_stride).ravel()[0]}", flush=True)


bench("single", jax.jit(detect), x1)
xb = jnp.asarray(np.stack([frame] * 8))
bench("vmap8", jax.jit(jax.vmap(detect)), xb, iters=3, frames=8)
