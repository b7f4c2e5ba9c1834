"""Per-stage TPU truth via lax.map: K sequential executions per dispatch.

On the tunneled axon platform jax.block_until_ready does NOT synchronize and
the dispatch+readback RTT is ~26 ms, so per-op times are only measurable by
running K copies inside one jit (lax.map is sequential) and subtracting one
measured RTT. Run detached (nohup): first compiles can take minutes.
"""
print("interp-started", flush=True)
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

t0 = time.perf_counter()
probe = jax.jit(lambda s: s * 2.0)
v = float(probe(jnp.float32(21.0)))
print(f"device responsive after {time.perf_counter()-t0:.1f}s", flush=True)

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops.ccl import component_sizes
from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
from isaac_ros_apriltag_tpu.ops.refine import refine_edges
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.pallas.ccl import connected_components_pallas

H, W = 1080, 1920
cam = CameraModel.create(fx=900.0, fy=900.0, cx=W/2, cy=H/2, width=W, height=H)
fam = get_family("tag36h11")
frame = np.load("/tmp/bench_frame_1080_noise2.npy")
cfg = DetectorConfig(tag_size=0.3, backend="pallas")
d = cfg.quad_decimate
gray = jax.device_put(jnp.asarray(frame, jnp.float32))

def rtt():
    t0 = time.perf_counter()
    for _ in range(5): float(probe(jnp.float32(1.0)))
    return (time.perf_counter()-t0)/5

def timeK(name, stage, inputs, K=8):
    """inputs: pytree with leading K axis; stage maps one slice."""
    f = jax.jit(lambda xs: jax.lax.map(stage, xs))
    out = f(inputs)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    r0 = rtt()
    t0 = time.perf_counter()
    out = f(inputs)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    dt = time.perf_counter() - t0
    per = (dt - r0) / K * 1000
    print(f"{name:20s} {per:8.2f} ms/op   (rtt {r0*1000:.0f} ms)", flush=True)
    return out

K = 8
def jitter(x, scale=1.0):
    return jnp.stack([x + (i % 2) * scale for i in range(K)])

gK = jitter(gray)
segK = timeK("decimate", lambda g: _pad_to_tiles(_decimate(g, d), cfg.tile_size), gK)
triK = timeK("threshold", lambda s: adaptive_threshold_pallas(s, cfg.tile_size, cfg.min_white_black_diff), segK)
labK = timeK("ccl", lambda t: connected_components_pallas(t, cfg.ccl_rounds, cfg.ccl_jumps, cfg.ccl_jump_every), triK)
szK = timeK("sizes", component_sizes, labK)
momK = timeK("cluster_moments", lambda a: extract_cluster_moments(
    a[0], a[1], a[2], max_edge_points=cfg.max_edge_points, max_clusters=cfg.max_clusters,
    min_component_pixels=cfg.min_component_pixels,
    min_cluster_pixels=cfg.min_cluster_pixels), (triK, labK, szK))
qK = timeK("quadfit", lambda m: fit_quads_from_moments(m, min_area=16.0), momK)
cK = timeK("refine", lambda a: refine_edges(a[0], _upscale_coords(a[1], d), a[2],
    search_range=d + 1.0), (gK, qK.corners, qK.dark_inside))
dK = timeK("decode", lambda a: decode_quads(a[0], a[1], fam, max_hamming=cfg.max_hamming,
    decode_sharpening=cfg.decode_sharpening), (gK, cK))
timeK("pose", lambda c: estimate_poses(c, cam.K, cfg.tag_size), dK.corners)
print("DONE", flush=True)
