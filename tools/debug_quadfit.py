"""Dev: inspect quadfit gates on the smoke scene."""

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
from isaac_ros_apriltag_tpu.ops import ccl, clusters, quadfit, threshold
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
    sz = ccl.component_sizes(lab)
    cl = clusters.extract_clusters(tri, lab, sz, max_edge_points=cfg.max_edge_points,
                                   max_clusters=cfg.max_clusters,
                                   max_cluster_points=cfg.max_cluster_points,
                                   min_component_pixels=cfg.min_component_pixels,
                                   min_cluster_pixels=cfg.min_cluster_pixels)
    q = quadfit.fit_quads(cl)
    return cl, q


gray = grayscale(jnp.asarray(img), "mono8")
cl, q = stage(gray)
print("counts:", np.asarray(cl.count)[:8])
print("valid:", np.asarray(q.valid)[:8])
print("dark_inside:", np.asarray(q.dark_inside)[:8])
print("fit_err:", np.asarray(q.fit_err)[:8])
print("gates [combo,mse,area,ang,finite,n>=8]:")
print(np.asarray(q.gates)[:8].astype(int))
print("corners[1]:\n", np.asarray(q.corners)[1])
