"""Sub-bisect fit_quads internals on the real device (committed inputs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu import DetectorConfig
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles
from isaac_ros_apriltag_tpu.ops.ccl import component_sizes, connected_components
from isaac_ros_apriltag_tpu.ops.clusters import extract_clusters
from isaac_ros_apriltag_tpu.ops import quadfit as qf


def commit(x):
    return jax.tree.map(lambda a: jax.device_put(np.asarray(a)), x)


def t(name, fn, *args, iters=10):
    fn2 = jax.jit(fn)
    args = tuple(commit(a) for a in args)
    out = fn2(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn2(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {1000*(time.perf_counter()-t0)/iters:9.3f} ms", flush=True)
    return out


frame = np.load("/tmp/bench_frame_1080_noise2.npy")
cfg = DetectorConfig(tag_size=0.3)
gray = jnp.asarray(frame, jnp.float32)
seg = _pad_to_tiles(_decimate(gray, 2), 4)
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
tri = adaptive_threshold(seg, 4, 5)
lab = connected_components(tri, 6, 2)
sizes = component_sizes(lab)
clusters = extract_clusters(tri, lab, sizes, max_edge_points=cfg.max_edge_points,
                            max_clusters=cfg.max_clusters,
                            max_cluster_points=cfg.max_cluster_points,
                            min_component_pixels=cfg.min_component_pixels,
                            min_cluster_pixels=cfg.min_cluster_pixels)
print("clusters ready", flush=True)

xy, grad, mask, n = clusters.xy, clusters.grad, clusters.mask, clusters.count


def stage1(xy, grad, mask, n):
    """centroid + angular argsort + sorted gathers"""
    def one(xy, grad, mask, n):
        fmask = mask.astype(jnp.float32)
        cx = jnp.sum(xy[:, 0] * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        cy = jnp.sum(xy[:, 1] * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        theta = jnp.where(mask, jnp.arctan2(xy[:, 1] - cy, xy[:, 0] - cx), jnp.inf)
        order = jnp.argsort(theta)
        return xy[order], grad[order], mask[order]
    return jax.vmap(one)(xy, grad, mask, n)


def stage2(xy, grad, mask, n):
    """+ prefix moments"""
    sx2, sg, sv = stage1(xy, grad, mask, n)
    def one(sxy, svalid):
        fvalid = svalid.astype(jnp.float32)
        sx = sxy[:, 0] * fvalid
        sy = sxy[:, 1] * fvalid
        fields = (sx, sy, sx * sx, sx * sy, sy * sy, fvalid)
        return tuple(jnp.concatenate([jnp.zeros(1), jnp.cumsum(f)]) for f in fields)
    return jax.vmap(one)(sx2, sv)


def stage3(xy, grad, mask, n):
    """+ sliding window errors + smoothing"""
    P = xy.shape[1]
    S = stage2(xy, grad, mask, n)
    def one(S, n):
        nf = jnp.maximum(n, 1)
        ksz = jnp.clip(nf // 12, 2, 20)
        i = jnp.arange(P, dtype=jnp.int32)
        a = jnp.mod(i - ksz, nf)
        b = a + 2 * ksz
        ms = tuple(qf._window_sum(s, a, b, nf) for s in S[:5])
        Wn = qf._window_sum(S[5], a, b, nf)
        *_, errs = qf._line_fit(ms, Wn)
        errs = jnp.where(i < nf, errs, 0.0)
        sm = jnp.zeros_like(errs)
        for k in range(7):
            j = jnp.mod(i + (k - 3), nf)
            sm = sm + errs[j]
        return sm
    return jax.vmap(one)(S, n)


t("full fit_quads", lambda c: qf.fit_quads(c, min_area=16.0), clusters)
t("s1 sort+gather", stage1, xy, grad, mask, n)
t("s2 +moments", stage2, xy, grad, mask, n)
t("s3 +windows+smooth", stage3, xy, grad, mask, n)


def stage1b(xy, grad, mask, n):
    """take_along_axis variant: gather x/y/gx/gy planes separately"""
    fmask = mask.astype(jnp.float32)
    cx = jnp.sum(xy[..., 0] * fmask, -1) / jnp.maximum(jnp.sum(fmask, -1), 1.0)
    cy = jnp.sum(xy[..., 1] * fmask, -1) / jnp.maximum(jnp.sum(fmask, -1), 1.0)
    theta = jnp.where(mask, jnp.arctan2(xy[..., 1] - cy[:, None],
                                        xy[..., 0] - cx[:, None]), jnp.inf)
    order = jnp.argsort(theta, axis=-1)
    tk = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return (tk(xy[..., 0]), tk(xy[..., 1]), tk(grad[..., 0]),
            tk(grad[..., 1]), tk(mask, ))


def stage3b(S0, S1, S2, S3, S4, Sw, a, b, nvec):
    """just the window-sum gathers + line fit, inputs precomputed"""
    def one(s0, s1, s2, s3, s4, sw, a, b, n):
        ms = tuple(qf._window_sum(s, a, b, n) for s in (s0, s1, s2, s3, s4))
        Wn = qf._window_sum(sw, a, b, n)
        *_, errs = qf._line_fit(ms, Wn)
        return errs
    return jax.vmap(one)(S0, S1, S2, S3, S4, Sw, a, b, nvec)


t("s1b take_along_axis", stage1b, xy, grad, mask, n)
P = xy.shape[1]
S = stage2(xy, grad, mask, n)
nf = jnp.maximum(n, 1)
ksz = jnp.clip(nf // 12, 2, 20)
i = jnp.arange(P, dtype=jnp.int32)[None, :]
a = jnp.mod(i - ksz[:, None], nf[:, None])
b = a + 2 * ksz[:, None]
t("s3b windows only", stage3b, S[0], S[1], S[2], S[3], S[4], S[5], a, b, nf)
