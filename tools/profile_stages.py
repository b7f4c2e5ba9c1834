"""Per-stage timing of the detect chain on the real device.

Times each pipeline stage in isolation (jit + block_until_ready), at the
bench configuration (1080p, noise=2.0), so optimization targets the real
cost centers instead of guesses. Usage:

    python tools/profile_stages.py [--hw 1080,1920] [--noise 2.0] [--batch 1]
"""

import argparse
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
from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
from isaac_ros_apriltag_tpu.ops.refine import refine_edges
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {1000*dt:10.3f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1080,1920")
    ap.add_argument("--noise", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))

    cam = CameraModel.create(fx=900.0, fy=900.0, cx=W / 2, cy=H / 2,
                             width=W, height=H)
    fam = get_family("tag36h11")
    tags = []
    for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                                (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
        t = np.array([x, y, 2.5])
        tags.append(dict(family=fam, id=7 * i + 1, R=upright_pose(t, 0.1 * i),
                         t=t, tag_size=0.3))
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=args.noise)
    cfg = DetectorConfig(tag_size=0.3, backend="xla")

    gray = jnp.asarray(frame, jnp.float32)
    it = args.iters

    total = 0.0
    trinary, dt = timeit("threshold", jax.jit(
        lambda g: adaptive_threshold(g, cfg.tile_size, cfg.min_white_black_diff)),
        gray, iters=it)
    total += dt
    label, dt = timeit("ccl", jax.jit(
        lambda t: connected_components(t, cfg.ccl_rounds, cfg.ccl_jumps)),
        trinary, iters=it)
    total += dt
    from isaac_ros_apriltag_tpu.ops.resolve import resolve_components

    dense, dt = timeit("resolve", jax.jit(
        lambda t, l: resolve_components(
            l, t != 127, min_component_pixels=cfg.min_component_pixels,
            max_components=cfg.max_components,
            chain_steps=cfg.ccl_resolve_steps).dense),
        trinary, label, iters=it)
    total += dt
    clusters, dt = timeit("cluster_moments", jax.jit(
        lambda t, dn: extract_cluster_moments(
            t, dn, comp_overflow=jnp.bool_(False),
            max_edge_points=cfg.max_edge_points,
            max_clusters=cfg.max_clusters,
            min_cluster_pixels=cfg.min_cluster_pixels)),
        trinary, dense, iters=it)
    total += dt
    quads, dt = timeit("fit_quads", jax.jit(fit_quads_from_moments), clusters, iters=it)
    total += dt
    corners, dt = timeit("refine_edges", jax.jit(refine_edges),
                         gray, quads.corners, quads.dark_inside, iters=it)
    total += dt
    dec, dt = timeit("decode", jax.jit(
        lambda g, c: decode_quads(g, c, fam, max_hamming=cfg.max_hamming,
                                  decode_sharpening=cfg.decode_sharpening)),
        gray, corners, iters=it)
    total += dt
    _, dt = timeit("pose", jax.jit(
        lambda c: estimate_poses(c, cam.K, cfg.tag_size)), dec.corners, iters=it)
    total += dt
    print(f"{'TOTAL (sum of stages)':28s} {1000*total:10.3f} ms")
    print(f"num_edge_points={int(clusters.num_edge_points)} "
          f"num_clusters={int(clusters.num_clusters)} "
          f"valid_quads={int(jnp.sum(quads.valid))} "
          f"decoded={int(jnp.sum(dec.valid))}")


if __name__ == "__main__":
    main()
