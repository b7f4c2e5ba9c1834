"""Dev: dump cluster-1 point geometry (numpy analysis of extract_clusters)."""

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
    sz = ccl.component_sizes(lab)
    cl = clusters.extract_clusters(tri, lab, sz, max_edge_points=cfg.max_edge_points,
                                   max_clusters=cfg.max_clusters,
                                   max_cluster_points=cfg.max_cluster_points,
                                   min_component_pixels=cfg.min_component_pixels,
                                   min_cluster_pixels=cfg.min_cluster_pixels)
    return tri, lab, cl


gray = grayscale(jnp.asarray(img), "mono8")
tri, lab, cl = stage(gray)
tri = np.asarray(tri)
for c in range(4):
    m = np.asarray(cl.mask)[c]
    xy = np.asarray(cl.xy)[c][m]
    print(f"cluster {c}: n={m.sum()} x[{xy[:,0].min():.1f},{xy[:,0].max():.1f}] "
          f"y[{xy[:,1].min():.1f},{xy[:,1].max():.1f}]")

# where is the true border? scan threshold image row through tag center
row = tri[229]
edges = np.nonzero(np.abs(np.diff(row.astype(int))) > 0)[0]
print("trinary transitions in row 229:", edges[:20])
print("gt edges ~ 304.25, 388.25 (border), margin edges ~ 293.75, 398.75")

# labels along the row near the right border
print("tri[229, 376:396]:", row[376:396])
print("lab[229, 376:396]:", np.asarray(lab)[229, 376:396])
