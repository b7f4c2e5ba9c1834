"""Micro-profile BATCHED (vmap, B=8) stage variants on TPU.

The bench stage table times single-frame ops (lax.map-chained), but the
headline runs jit(vmap(detect)) at batch 8 — and round 5 measured a
residual_ms jump (3.2 -> 7.4) after the decimate/refine/decode/cluster
rework, i.e. some stage-level wins do not materialize under vmap. This tool
times the changed stages BATCHED, old vs new formulation, to find which op
degrades when batched.

Run detached: nohup python tools/profile_batched_stages.py > /tmp/prof_batched.log 2>&1 &
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
from isaac_ros_apriltag_tpu.detector import (_decimate, _pad_to_tiles,
                                             _upscale_coords)
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops import cluster_moments as CM
from isaac_ros_apriltag_tpu.ops.decode import decode_quads
from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
from isaac_ros_apriltag_tpu.ops.refine import _bilinear, _neighbor_stack, refine_edges
from isaac_ros_apriltag_tpu.ops.resolve import resolve_components, resolve_roots

B = 8
cfg = DetectorConfig(tag_size=0.3)
cam, frame = _scene(1080, 1920, noise=2.0)
gray = jnp.asarray(frame, jnp.float32)
d = cfg.quad_decimate
seg = _pad_to_tiles(_decimate(gray, d), cfg.tile_size)
tri = adaptive_threshold_pallas(seg, cfg.tile_size, cfg.min_white_black_diff)
lab, _ = ccl_scan_pallas(tri, cfg.ccl_scan_rounds)
roots = resolve_roots(lab, tri != 127, max_components=cfg.max_components,
                      chain_steps=cfg.ccl_contraction_steps)
lab2, _ = ccl_scan_pallas(tri, cfg.ccl_phase2_rounds, label0=roots)
E_eff, R_eff = cfg.effective_capacities(*tri.shape)
res = resolve_components(lab2, tri != 127,
                         min_component_pixels=cfg.min_component_pixels,
                         max_components=R_eff,
                         chain_steps=cfg.ccl_resolve_steps)
mom = CM.extract_cluster_moments(
    tri, res.dense, comp_overflow=jnp.bool_(False), max_edge_points=E_eff,
    max_clusters=cfg.max_clusters, min_cluster_pixels=cfg.min_cluster_pixels,
    max_cluster_points=cfg.max_cluster_points)
quads = fit_quads_from_moments(mom, min_area=64.0 / (d * d))
fam = get_family(cfg.tag_family)

probe = jax.jit(lambda s: s * 2.0)
float(probe(jnp.float32(1.0)))


def rtt():
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(probe(jnp.float32(1.0)))
        vals.append(time.perf_counter() - t0)
    return min(vals)


K = int(os.environ.get("PROFILE_K", "6"))


def timeB(name, fn, *args):
    """Time jit(vmap(fn)) at B=8 via K lax.map-chained batched calls."""
    bat = jax.vmap(fn)
    mapped = jax.jit(lambda xs: jax.lax.map(lambda a: bat(*a), xs))
    stacked = jax.tree.map(
        lambda x: jnp.stack([jnp.stack([x] * B)] * K), tuple(args))
    out = mapped(stacked)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(2):
        r0 = rtt()
        t0 = time.perf_counter()
        out = mapped(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0 - r0)
    per_frame = 1000 * best / (K * B)
    print(f"{name:40s} {per_frame:8.3f} ms/frame (batched x{B})", flush=True)


def decimate_old(g):
    g = _pad_to_tiles(g, d)
    Hp, Wp = g.shape
    return g.reshape(Hp // d, d, Wp // d, d).mean(axis=(1, 3))


timeB("decimate matmul (new)", lambda g: _pad_to_tiles(_decimate(g, d), cfg.tile_size), gray)
timeB("decimate reshape-mean (old)", lambda g: _pad_to_tiles(decimate_old(g), cfg.tile_size), gray)

qc = _upscale_coords(quads.corners, d)


def refine_old(g, c, dk):
    # 4-gather bilinear path: bypass the neighbor stack by passing 2D img
    import isaac_ros_apriltag_tpu.ops.refine as RF
    saved = RF._neighbor_stack
    RF._neighbor_stack = lambda img: img
    try:
        return refine_edges(g, c, dk, search_range=d + 1.0)
    finally:
        RF._neighbor_stack = saved


timeB("refine one-row taps (new)", lambda g, c, dk: refine_edges(
    g, c, dk, search_range=d + 1.0), gray, qc, quads.dark_inside)
timeB("refine 4-gather (old)", refine_old, gray, qc, quads.dark_inside)

timeB("decode (new one-row)", lambda g, c: decode_quads(
    g, c, fam, max_hamming=cfg.max_hamming,
    decode_sharpening=cfg.decode_sharpening), gray, quads.corners)

timeB("cluster_moments (current)", lambda t, dn: CM.extract_cluster_moments(
    t, dn, comp_overflow=jnp.bool_(False), max_edge_points=E_eff,
    max_clusters=cfg.max_clusters, min_cluster_pixels=cfg.min_cluster_pixels,
    max_cluster_points=cfg.max_cluster_points), tri, res.dense)

timeB("resolve_components (current)", lambda t, l: resolve_components(
    l, t != 127, min_component_pixels=cfg.min_component_pixels,
    max_components=R_eff, chain_steps=cfg.ccl_resolve_steps).dense, tri, lab2)


def full_ccl(t):
    label, _ = ccl_scan_pallas(t, cfg.ccl_scan_rounds)
    label = jax.lax.optimization_barrier(label)
    r = resolve_roots(label, t != 127, max_components=R_eff,
                      chain_steps=cfg.ccl_contraction_steps)
    label, _ = ccl_scan_pallas(t, cfg.ccl_phase2_rounds,
                               label0=jax.lax.optimization_barrier(r))
    return label


timeB("ccl two-phase (current)", full_ccl, tri)
print("DONE", flush=True)
