"""Bisect the composed-jit slowdown: compile+time prefixes of the detect
chain as ONE jit each, and report the marginal cost of adding each stage."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops.ccl import component_sizes, connected_components
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads
from isaac_ros_apriltag_tpu.ops.refine import refine_edges
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
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
cfg = DetectorConfig(tag_size=0.3, backend="xla")
gray0 = jnp.asarray(frame, jnp.float32)


BACKEND = os.environ.get("BISECT_BACKEND", "xla")


def chain(n):
    def fn(gray):
        from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
        d = int(os.environ.get("BISECT_DECIMATE", "2"))
        seg = _pad_to_tiles(_decimate(gray, d), cfg.tile_size)
        if BACKEND == "pallas":
            from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
            trinary = adaptive_threshold_pallas(seg, cfg.tile_size, cfg.min_white_black_diff)
        else:
            trinary = adaptive_threshold(seg, cfg.tile_size, cfg.min_white_black_diff)
        gray, trinary = jax.lax.optimization_barrier((gray, trinary))
        if n == 1:
            return trinary
        if BACKEND == "pallas":
            from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
            label = ccl_scan_pallas(trinary, cfg.ccl_scan_rounds)[0]
        else:
            label = connected_components(trinary, cfg.ccl_rounds, cfg.ccl_jumps,
                                         cfg.ccl_jump_every)
        label = jax.lax.optimization_barrier(label)
        if n == 2:
            return label
        from isaac_ros_apriltag_tpu.ops.resolve import resolve_components
        res = resolve_components(
            label, trinary != 127,
            min_component_pixels=cfg.min_component_pixels,
            max_components=cfg.max_components,
            chain_steps=cfg.ccl_resolve_steps)
        dense = jax.lax.optimization_barrier(res.dense)
        if n == 3:
            return dense
        from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
        clusters = extract_cluster_moments(
            trinary, dense, comp_overflow=res.overflow,
            max_edge_points=cfg.max_edge_points,
            max_clusters=cfg.max_clusters,
            min_cluster_pixels=cfg.min_cluster_pixels)
        clusters = jax.lax.optimization_barrier(clusters)
        if n == 4:
            return clusters
        from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
        quads = fit_quads_from_moments(clusters, min_area=64.0 / (d * d))
        if n == 5:
            return quads
        corners = refine_edges(gray, _upscale_coords(quads.corners, d),
                               quads.dark_inside, search_range=d + 1.0)
        if n == 6:
            return corners
        dec = decode_quads(gray, corners, fam, max_hamming=cfg.max_hamming,
                           decode_sharpening=cfg.decode_sharpening)
        if n == 7:
            return dec
        return estimate_poses(dec.corners, cam.K, cfg.tag_size)
    return fn


prev = 0.0
names = ["threshold", "ccl", "sizes", "clusters", "quadfit", "refine",
         "decode", "pose"]
def _sync(out):
    # jax.block_until_ready does not synchronize on the tunneled axon
    # platform; a host readback of one element is the true sync point
    # (slice ON DEVICE first — a full-leaf transfer would swamp the timing).
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


for n in range(1, 9):
    fn = jax.jit(chain(n))
    t0 = time.perf_counter()
    out = fn(gray0)
    _sync(out)
    tc = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(gray0)
        _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"prefix {n} (+{names[n-1]:10s}): {1000*dt:9.2f} ms "
          f"(marginal {1000*(dt-prev):+9.2f} ms, compile {tc:.0f}s)", flush=True)
    prev = dt
