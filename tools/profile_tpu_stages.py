"""Per-stage TPU truth via lax.map: K sequential executions per dispatch.

On the tunneled axon platform jax.block_until_ready does NOT synchronize and
the dispatch+readback RTT is ~26 ms, so per-op times are only measurable by
running K copies inside one jit (lax.map is sequential) and subtracting one
measured RTT. Run detached (nohup): first compiles can take minutes.

Synthesizes its own bench frame (same scene as bench.py); also times the
COMPOSED stage pairs vs the sum of parts to attribute inter-stage overhead
(the round-3 "unattributed 12 ms": see VERDICT item 9).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print("interp-started", flush=True)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t0 = time.perf_counter()
probe = jax.jit(lambda s: s * 2.0)
v = float(probe(jnp.float32(21.0)))
print(f"device responsive after {time.perf_counter()-t0:.1f}s", flush=True)

from bench import _scene
from isaac_ros_apriltag_tpu import DetectorConfig
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
from isaac_ros_apriltag_tpu.ops.refine import refine_edges
from isaac_ros_apriltag_tpu.ops.resolve import resolve_components

H, W = 1080, 1920
cam, frame = _scene(H, W)
fam = get_family("tag36h11")
cfg = DetectorConfig(tag_size=0.3, backend="pallas")
d = cfg.quad_decimate
gray = jax.device_put(jnp.asarray(frame, jnp.float32))


def rtt():
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / 5


K = int(os.environ.get("PROFILE_K", "8"))


def timeK(name, stage, inputs):
    """inputs: pytree with leading K axis; stage maps one slice."""
    f = jax.jit(lambda xs: jax.lax.map(stage, xs))
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    r0 = rtt()
    t0 = time.perf_counter()
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = time.perf_counter() - t0
    per = (dt - r0) / K * 1000
    print(f"{name:28s} {per:8.2f} ms/op   (rtt {r0*1000:.0f} ms)", flush=True)
    return out, per


def jitter(x, scale=1.0):
    return jnp.stack([x + (i % 2) * scale for i in range(K)])


def s_decimate(g):
    return _pad_to_tiles(_decimate(g, d), cfg.tile_size)


def s_threshold(s):
    return adaptive_threshold_pallas(s, cfg.tile_size, cfg.min_white_black_diff)


def s_ccl(t):
    return ccl_scan_pallas(t, cfg.ccl_scan_rounds)[0]


def s_resolve(t, l):
    return resolve_components(
        l, t != 127, min_component_pixels=cfg.min_component_pixels,
        max_components=cfg.max_components,
        chain_steps=cfg.ccl_resolve_steps).dense


def s_moments(t, dn):
    return extract_cluster_moments(
        t, dn, comp_overflow=jnp.bool_(False),
        max_edge_points=cfg.max_edge_points, max_clusters=cfg.max_clusters,
        min_cluster_pixels=cfg.min_cluster_pixels)


gK = jitter(gray)
segK, t_dec = timeK("decimate", s_decimate, gK)
triK, t_thr = timeK("threshold", s_threshold, segK)
labK, t_ccl = timeK("ccl", s_ccl, triK)
dnK, t_res = timeK("resolve", lambda a: s_resolve(a[0], a[1]), (triK, labK))
momK, t_mom = timeK("cluster_moments", lambda a: s_moments(a[0], a[1]), (triK, dnK))
qK, _ = timeK("quadfit", lambda m: fit_quads_from_moments(m, min_area=16.0), momK)
cK, _ = timeK("refine", lambda a: refine_edges(a[0], _upscale_coords(a[1], d), a[2],
              search_range=d + 1.0), (gK, qK.corners, qK.dark_inside))
dK, _ = timeK("decode", lambda a: decode_quads(a[0], a[1], fam, max_hamming=cfg.max_hamming,
              decode_sharpening=cfg.decode_sharpening), (gK, cK))
timeK("pose", lambda c: estimate_poses(c, cam.K, cfg.tag_size), dK.corners)

# --- composed pairs: locate inter-stage overhead --------------------------
print("--- composed pairs (pair - sum of parts = fusion/materialization cost)",
      flush=True)
_, t_pair1 = timeK("threshold+ccl", lambda s: s_ccl(s_threshold(s)), segK)
print(f"  delta vs parts: {t_pair1 - (t_thr + t_ccl):+.2f} ms", flush=True)


def front(g):
    t = s_threshold(s_decimate(g))
    return s_resolve(t, s_ccl(t))


_, t_front = timeK("decimate..resolve", front, gK)
print(f"  delta vs parts: {t_front - (t_dec + t_thr + t_ccl + t_res):+.2f} ms",
      flush=True)


def front_mom(g):
    t = s_threshold(s_decimate(g))
    return s_moments(t, s_resolve(t, s_ccl(t)))


_, t_fm = timeK("decimate..moments", front_mom, gK)
print(f"  delta vs parts: "
      f"{t_fm - (t_dec + t_thr + t_ccl + t_res + t_mom):+.2f} ms", flush=True)
print("DONE", flush=True)
