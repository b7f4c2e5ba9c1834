"""Dev: introspect decode internals on a rendered scene."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops import ccl, clusters, decode, quadfit, threshold
from isaac_ros_apriltag_tpu.ops.grayscale import grayscale
from isaac_ros_apriltag_tpu.utils.render import project_corners, render_tags, upright_pose

cam = CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0, width=640, height=480)
fam = get_family("tag36h11")
t = np.array([0.05, -0.02, 0.8])
R = upright_pose(t)
ts = 0.16
img = render_tags(np.asarray(cam.K), (480, 640),
                  [dict(family=fam, id=3, R=R, t=t, tag_size=ts)])

cfg = DetectorConfig(backend="xla", tag_size=ts)
gray = grayscale(jnp.asarray(img), "mono8")
tri = threshold.adaptive_threshold(gray, cfg.tile_size, cfg.min_white_black_diff)
lab = ccl.connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps)
sz = ccl.component_sizes(lab)
cl = clusters.extract_clusters(tri, lab, sz, max_edge_points=cfg.max_edge_points,
                               max_clusters=cfg.max_clusters,
                               max_cluster_points=cfg.max_cluster_points,
                               min_component_pixels=cfg.min_component_pixels,
                               min_cluster_pixels=cfg.min_cluster_pixels)
q = quadfit.fit_quads(cl)
print("cluster counts:", np.asarray(cl.count)[:8])
print("quad valid:", np.asarray(q.valid)[:8], "dark_inside:", np.asarray(q.dark_inside)[:8])
print("fit_err:", np.asarray(q.fit_err)[:8])
print("quad corners[0]:\n", np.asarray(q.corners)[0])
print("gt corners:\n", project_corners(np.asarray(cam.K), R, t, ts))

d = decode.decode_quads(gray, q.corners, fam, max_hamming=cfg.max_hamming,
                        decode_sharpening=cfg.decode_sharpening)
print("decode valid:", np.asarray(d.valid)[:8])
print("id:", np.asarray(d.id)[:8], "hamming:", np.asarray(d.hamming)[:8],
      "margin:", np.asarray(d.margin)[:8], "rot:", np.asarray(d.rotation)[:8])

# manual bit sampling check for quad 0
from isaac_ros_apriltag_tpu.ops.decode import _SQUARE, _bilinear, _cell_uv
from isaac_ros_apriltag_tpu.utils.geometry import apply_homography, homography_from_correspondences

H = homography_from_correspondences(jnp.asarray(_SQUARE)[None], q.corners[:1])
bit_cells = np.stack([fam.bit_x, fam.bit_y], -1).astype(np.float32)
uv = jnp.asarray(_cell_uv(bit_cells, fam.width_at_border))
pts = apply_homography(H, uv[None])
vals = _bilinear(gray, pts)[0]
bits = (np.asarray(vals) > 128).astype(int)
print("sampled bit grid (v>128):")
print(bits.reshape(6, 6))
code = int(fam.codes[3])
gt_bits = [(code >> (35 - i)) & 1 for i in range(36)]
print("expected id3 grid:")
print(np.array(gt_bits).reshape(6, 6))
