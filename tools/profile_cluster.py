"""Micro-profile ops/cluster_moments.py internals on TPU (lax.map method).

Breaks the 14 ms cluster stage into: pair generation, the 4HW grouping
sort, the E-length segmented scans, top_k, sort 2 (+ E2 slice), the run2
scans, sort 3 + scatter; plus an approx_max_k variant of the top-C select.

Run detached: nohup python tools/profile_cluster.py > /tmp/prof_cluster.log 2>&1 &
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
from isaac_ros_apriltag_tpu.ops import cluster_moments as CM
from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.resolve import resolve_components, resolve_roots

cfg = DetectorConfig(tag_size=0.3)
cam, frame = _scene(1080, 1920, noise=2.0)
gray = jnp.asarray(frame, jnp.float32)
seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
tri = adaptive_threshold_pallas(seg, cfg.tile_size, cfg.min_white_black_diff)
lab, _ = ccl_scan_pallas(tri, cfg.ccl_scan_rounds)
roots = resolve_roots(lab, tri != 127, max_components=cfg.max_components,
                      chain_steps=cfg.ccl_contraction_steps)
lab2, _ = ccl_scan_pallas(tri, cfg.ccl_phase2_rounds, label0=roots)
res = resolve_components(lab2, tri != 127,
                         min_component_pixels=cfg.min_component_pixels,
                         max_components=cfg.max_components,
                         chain_steps=cfg.ccl_resolve_steps)
dense = res.dense
H, W = tri.shape
E = min(cfg.max_edge_points, 4 * H * W)
C, K = cfg.max_clusters, CM.NBINS

probe = jax.jit(lambda s: s * 2.0)
float(probe(jnp.float32(1.0)))


def rtt():
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / 5


KK = int(os.environ.get("PROFILE_K", "16"))


def timeK(name, stage, inputs):
    f = jax.jit(lambda xs: jax.lax.map(stage, xs))
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    r0 = rtt()
    t0 = time.perf_counter()
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    per = (time.perf_counter() - t0 - r0) / KK * 1000
    print(f"{name:34s} {per:8.3f} ms/op (rtt {r0*1000:.0f} ms)", flush=True)
    return jax.tree.map(lambda x: x[0], out), per


def stack(*xs):
    return tuple(jnp.stack([x] * KK) for x in xs)


# --- pair generation -------------------------------------------------------
def pair_gen(tri, dense):
    key_all, pay_all, m_all = [], [], []
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    for dx, dy in CM._OFFSETS:
        v0 = tri
        v1 = CM._shift(tri, dy, dx, jnp.uint8(127))
        pair = (v0.astype(jnp.int32) + v1.astype(jnp.int32)) == 255
        d0, d1 = dense, CM._shift(dense, dy, dx, jnp.int32(CM._KMAX))
        p_black = v0 == 0
        db = jnp.where(p_black, d0, d1)
        dw = jnp.where(p_black, d1, d0)
        m = pair & (db != CM._KMAX) & (dw != CM._KMAX)
        sgn = jnp.where(p_black, jnp.int32(1), jnp.int32(-1))
        g = (dx * sgn + 1) | ((dy * sgn + 1) << 2)
        key_all.append(jnp.where(m, (db << CM._KBITS) | dw, CM._I32MAX))
        pay_all.append((2 * xs + dx) | ((2 * ys + dy) << 12) | (g << 24))
        m_all.append(m)
    return (jnp.stack(key_all).reshape(-1), jnp.stack(pay_all).reshape(-1),
            jnp.stack(m_all).reshape(-1))


(kp, _) = timeK("pair_gen (elementwise)", lambda a: pair_gen(a[0], a[1]),
                stack(tri, dense))
key, pay, mask = kp
num_edge = int(jnp.sum(mask.astype(jnp.int32)))
print("num_edge:", num_edge, flush=True)

(s1, _) = timeK("sort1 (4HW, 2op)",
                lambda a: jax.lax.sort((a[0], a[1]), num_keys=1),
                stack(jnp.where(mask, key, CM._I32MAX), pay))
key_s, pay_s = jax.tree.map(lambda x: x[:E], s1)

valid = key_s != CM._I32MAX
prev_key = jnp.concatenate([jnp.full((1,), -1, jnp.int32), key_s[:-1]])
first = valid & (key_s != prev_key)
x = (pay_s & 0xFFF).astype(jnp.float32) * 0.5
y = ((pay_s >> 12) & 0xFFF).astype(jnp.float32) * 0.5
w = valid.astype(jnp.float32)
F1 = jnp.stack([w, x * w, y * w, (x * x + y * y) * w, w, w, w], -1)

(_, _) = timeK("F1 run scan (E,7ch)",
               lambda a: CM._seg_scan(a[0], a[1][:, None], lambda p, q: p + q),
               stack(F1, first))
run = CM._seg_scan(F1, first[:, None], lambda p, q: p + q)

(_, _) = timeK("reverse copyscan (E,4ch)",
               lambda a: jnp.flip(CM._seg_scan(
                   jnp.flip(a[0][:, :4], 0), jnp.flip(a[1], 0)[:, None],
                   lambda p, q: p), 0), stack(run, first))

(_, _) = timeK("suffix cummin (E)",
               lambda c: jnp.flip(jax.lax.cummin(jnp.flip(c[0]))),
               stack(jnp.where(first, jnp.arange(E, dtype=jnp.int32), E)))

gated = jnp.where(first, run[:, 0], 0.0).astype(jnp.int32)
(_, _) = timeK("top_k (E -> C)", lambda g: jax.lax.top_k(g[0], C), stack(gated))
(_, _) = timeK("approx_max_k (E -> C)",
               lambda g: jax.lax.approx_max_k(g[0].astype(jnp.float32), C),
               stack(gated))
(_, _) = timeK("sort-desc top-C (E, 2op)",
               lambda g: jax.lax.sort((-g[0], jnp.arange(E, dtype=jnp.int32)),
                                      num_keys=1)[0][:C],
               stack(gated))
(_, _) = timeK("packed cummax (E)",
               lambda g: jax.lax.cummax(g[0].astype(jnp.uint32)),
               stack(gated))

slot = jnp.where(valid, jnp.minimum(key_s % 97, 127), -1)  # stand-in slots
bins = jnp.minimum((pay_s & 63), K - 1)
key2 = jnp.where(valid & (slot >= 0), slot * K + bins, CM._I32MAX)
wv = (key2 != CM._I32MAX).astype(jnp.float32)
sxn = x * 0.01
syn = y * 0.01
(_, _) = timeK("sort2 (E,7op)",
               lambda a: jax.lax.sort(tuple(a), num_keys=1),
               stack(key2, wv, sxn * wv, syn * wv, sxn * sxn * wv,
                     sxn * syn * wv, syn * syn * wv))
(_, _) = timeK("sort2 (E,2op)",
               lambda a: jax.lax.sort(tuple(a), num_keys=1),
               stack(key2, pay_s))
E2 = min(C * cfg.max_cluster_points, E)
k2s = jax.lax.sort((key2, wv), num_keys=1)[0][:E2]
F2 = jnp.stack([wv[:E2]] * 6, -1)
first2 = jnp.concatenate([jnp.ones((1,), bool),
                          k2s[1:] != k2s[:-1]]) & (k2s != CM._I32MAX)
(_, _) = timeK("run2 scan (E2,6ch)",
               lambda a: CM._seg_scan(a[0], a[1][:, None], lambda p, q: p + q),
               stack(F2, first2))
(_, _) = timeK("sort3 (E2,7op)",
               lambda a: jax.lax.sort(tuple(a), num_keys=1),
               stack(k2s, *[F2[:, i] for i in range(6)]))

(_, _) = timeK("FULL extract_cluster_moments",
               lambda a: CM.extract_cluster_moments(
                   a[0], a[1], comp_overflow=jnp.bool_(False),
                   max_edge_points=cfg.max_edge_points,
                   max_clusters=cfg.max_clusters,
                   min_cluster_pixels=cfg.min_cluster_pixels,
                   max_cluster_points=cfg.max_cluster_points),
               stack(tri, dense))
print("DONE", flush=True)
