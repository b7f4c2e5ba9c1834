"""Round-4 TPU tuning session: fused-CCL validation + rounds sweep.

One serialized TPU run that answers, in order:
  1. does the fused VMEM-resident CCL kernel compile + run on real hardware
     (Mosaic VMEM budget at 544x1024 int32)?
  2. detection counts vs (ccl_scan_rounds, noise) on the bench scene — the
     correctness frontier that round 3 probed with its jump-config sweep;
  3. per-stage ms for the new pipeline (ccl / resolve / cluster_moments).

Run detached:  nohup python tools/tune_ccl_tpu.py > /tmp/tune_ccl.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("devices:", jax.devices(), flush=True)

from bench import _scene
from isaac_ros_apriltag_tpu import DetectorConfig
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles
from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.resolve import resolve_components

H, W = 1080, 1920
cfg = DetectorConfig(tag_size=0.3)

probe = jax.jit(lambda s: s * 2.0)
float(probe(jnp.float32(1.0)))


def rtt():
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / 5


def timeK(name, stage, inputs, K=8):
    f = jax.jit(lambda xs: jax.lax.map(stage, xs))
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    r0 = rtt()
    t0 = time.perf_counter()
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    per = (time.perf_counter() - t0 - r0) / K * 1000
    print(f"{name:34s} {per:8.2f} ms/op (rtt {r0*1000:.0f} ms)", flush=True)
    return out, per


# ---- 1. kernel smoke: compile + run at bench shape ------------------------
cam, frame = _scene(H, W, noise=2.0)
gray = jnp.asarray(frame, jnp.float32)
seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
tri = adaptive_threshold_pallas(seg, cfg.tile_size, cfg.min_white_black_diff)
t0 = time.perf_counter()
lab, conv = ccl_scan_pallas(tri, cfg.ccl_scan_rounds)
n_lab = int(np.asarray(lab).max())
print(f"fused kernel OK: rounds={cfg.ccl_scan_rounds} max_label={n_lab} "
      f"converged={bool(conv)} (wall incl compile {time.perf_counter()-t0:.1f}s)",
      flush=True)

# ---- 2. detections vs (scan_rounds, noise) --------------------------------
from isaac_ros_apriltag_tpu.detector import build_detect_fn
import dataclasses

for noise in (2.0, 4.0):
    cam_n, frame_n = _scene(H, W, noise=noise)
    x = jnp.asarray(frame_n)
    for rounds in (8, 12, 16, 24):
        c = dataclasses.replace(cfg, ccl_scan_rounds=rounds)
        fn = jax.jit(build_detect_fn(c, cam_n, encoding="mono8"))
        det, stats = fn(x)
        nd = int(np.asarray(stats.num_detections))
        cc = bool(np.asarray(stats.ccl_converged))
        print(f"noise={noise} rounds={rounds}: detections={nd}/6 "
              f"ccl_converged={cc}", flush=True)
    # xla oracle reference count
    cx = dataclasses.replace(cfg, backend="xla")
    fnx = jax.jit(build_detect_fn(cx, cam_n, encoding="mono8"))
    _, sx = fnx(x)
    print(f"noise={noise} XLA oracle: detections="
          f"{int(np.asarray(sx.num_detections))}/6", flush=True)

# ---- 3. stage times -------------------------------------------------------
K = 8
triK = jnp.stack([tri] * K)
_, t_ccl = timeK("ccl fused (16 rounds)", lambda t: ccl_scan_pallas(t, 16)[0], triK)
_, t_ccl8 = timeK("ccl fused (8 rounds)", lambda t: ccl_scan_pallas(t, 8)[0], triK)
_, t_ccl24 = timeK("ccl fused (24 rounds)", lambda t: ccl_scan_pallas(t, 24)[0], triK)
labK = jnp.stack([lab] * K)


def s_resolve(t, l, steps):
    return resolve_components(l, t != 127,
                              min_component_pixels=cfg.min_component_pixels,
                              max_components=cfg.max_components,
                              chain_steps=steps).dense


for steps in (3, 5):
    timeK(f"resolve (doublings={steps})",
          lambda a, s=steps: s_resolve(a[0], a[1], s), (triK, labK))

# resolve capacity sweep
for cap in (1 << 15, 1 << 16):
    timeK(f"resolve (cap={cap})",
          lambda a, c=cap: resolve_components(
              a[1], a[0] != 127,
              min_component_pixels=cfg.min_component_pixels,
              max_components=c, chain_steps=5).dense, (triK, labK))

from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments

dn = s_resolve(tri, lab, 5)
dnK = jnp.stack([dn] * K)
timeK("cluster_moments", lambda a: extract_cluster_moments(
    a[0], a[1], comp_overflow=jnp.bool_(False),
    max_edge_points=cfg.max_edge_points, max_clusters=cfg.max_clusters,
    min_cluster_pixels=cfg.min_cluster_pixels), (triK, dnK))

print("DONE", flush=True)
