"""Reliable per-stage timing on the real device.

Timing rule learned the hard way: on this platform, block_until_ready gives
real times only when the jitted function's inputs are FRESH host-committed
arrays (outputs of previous jits make the timing loop report dispatch-only
numbers). Every stage input here goes device -> host -> device first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
from isaac_ros_apriltag_tpu.ops.ccl import component_sizes, connected_components
from isaac_ros_apriltag_tpu.ops.pallas.ccl import connected_components_pallas
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.clusters import extract_clusters
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads
from isaac_ros_apriltag_tpu.ops.refine import refine_edges
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose


def commit(x):
    return jax.tree.map(lambda a: jax.device_put(np.asarray(a)), x)


def t(name, fn, *args, iters=10):
    fn2 = jax.jit(fn)
    args = tuple(commit(a) for a in args)
    out = fn2(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn2(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {1000*(time.perf_counter()-t0)/iters:9.3f} ms", flush=True)
    return out


H, W = 1080, 1920
cam = CameraModel.create(fx=900.0, fy=900.0, cx=W / 2, cy=H / 2,
                         width=W, height=H)
fam = get_family("tag36h11")
_CACHE = "/tmp/bench_frame_1080_noise2.npy"
if os.path.exists(_CACHE):
    frame = np.load(_CACHE)
else:
    tags = []
    for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                                (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
        tv = np.array([x, y, 2.5])
        tags.append(dict(family=fam, id=7 * i + 1, R=upright_pose(tv, 0.1 * i),
                         t=tv, tag_size=0.3))
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=2.0)
    np.save(_CACHE, frame)
print("frame ready", flush=True)

cfg = DetectorConfig(tag_size=0.3)
d = cfg.quad_decimate

gray = jnp.asarray(frame, jnp.float32)
seg = _pad_to_tiles(_decimate(gray, d), cfg.tile_size)

t("decimate+pad", lambda g: _pad_to_tiles(_decimate(g, d), cfg.tile_size), gray)
trinary = t("threshold xla", lambda s: adaptive_threshold(
    s, cfg.tile_size, cfg.min_white_black_diff), seg)
t("threshold pallas", lambda s: adaptive_threshold_pallas(
    s, cfg.tile_size, cfg.min_white_black_diff), seg)
label = t("ccl xla", lambda tr: connected_components(
    tr, cfg.ccl_rounds, cfg.ccl_jumps), trinary)
t("ccl pallas", lambda tr: connected_components_pallas(
    tr, cfg.ccl_rounds, cfg.ccl_jumps), trinary)
sizes = t("component_sizes", component_sizes, label)
clusters = t("extract_clusters", lambda tr, l, s: extract_clusters(
    tr, l, s, max_edge_points=cfg.max_edge_points,
    max_clusters=cfg.max_clusters, max_cluster_points=cfg.max_cluster_points,
    min_component_pixels=cfg.min_component_pixels,
    min_cluster_pixels=cfg.min_cluster_pixels), trinary, label, sizes)
quads = t("fit_quads", lambda c: fit_quads(c, min_area=64.0 / (d * d)),
          clusters)
corners = t("refine_edges", lambda g, c, di: refine_edges(
    g, _upscale_coords(c, d), di, search_range=d + 1.0),
    gray, quads.corners, quads.dark_inside)
dec = t("decode", lambda g, c: decode_quads(
    g, c, fam, max_hamming=cfg.max_hamming,
    decode_sharpening=cfg.decode_sharpening), gray, corners)
t("pose", lambda c: estimate_poses(c, cam.K, cfg.tag_size), dec.corners)
print("nedge", int(clusters.num_edge_points), "stride", int(clusters.edge_stride),
      "nquads", int(np.asarray(quads.valid).sum()),
      "ndec", int(np.asarray(dec.valid).sum()), flush=True)
