"""Micro-profile ops/resolve.py internals on TPU (lax.map methodology).

Times each internal phase of resolve_components in isolation at the bench
shape so optimization targets the real cost, not estimates:
  sort1 (N 2-op), rank scans, compaction sort (N 3-op), chain gathers
  (R-scale), root-order sorts (R 3-op), seed scatter + copy-scan,
  final unsort (N 2-op), and the full resolve / resolve_roots for
  reference.

Run detached: nohup python tools/profile_resolve.py > /tmp/prof_resolve.log 2>&1 &
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
from isaac_ros_apriltag_tpu.ops.resolve import (_seg_scan, resolve_components,
                                                resolve_roots)

cfg = DetectorConfig(tag_size=0.3)
cam, frame = _scene(1080, 1920, noise=2.0)
gray = jnp.asarray(frame, jnp.float32)
seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
tri = adaptive_threshold_pallas(seg, cfg.tile_size, cfg.min_white_black_diff)
lab, _ = ccl_scan_pallas(tri, cfg.ccl_scan_rounds)
valid = tri != 127
print("n_valid:", int(jnp.sum(valid)), flush=True)

H, W = lab.shape
N = H * W
R = 1 << 16

probe = jax.jit(lambda s: s * 2.0)
float(probe(jnp.float32(1.0)))


def rtt():
    t0 = time.perf_counter()
    for _ in range(5):
        float(probe(jnp.float32(1.0)))
    return (time.perf_counter() - t0) / 5


K = int(os.environ.get("PROFILE_K", "24"))


def timeK(name, stage, inputs):
    f = jax.jit(lambda xs: jax.lax.map(stage, xs))
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    r0 = rtt()
    t0 = time.perf_counter()
    out = f(inputs)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    per = (time.perf_counter() - t0 - r0) / K * 1000
    print(f"{name:32s} {per:8.3f} ms/op (rtt {r0*1000:.0f} ms)", flush=True)
    return jax.tree.map(lambda x: x[0], out), per


def stk(*xs):
    return tuple(jnp.stack([x] * K) for x in xs)


flat = lab.reshape(-1)
vflat = valid.reshape(-1)
idx = jnp.arange(N, dtype=jnp.int32)

# distinct-label count (host side, once)
key0 = np.where(np.asarray(vflat), np.asarray(flat), N)
print("distinct labels:", len(np.unique(key0[key0 < N])), flush=True)

(key_lab,), _ = stk(jnp.where(vflat, flat, N)), None
(sorted_pair, _) = timeK("sort1 (N,2op)",
                         lambda a: jax.lax.sort((a, jnp.stack([idx] * 1)[0]),
                                                num_keys=1),
                         key_lab)
lab_s, idx_s = sorted_pair

prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), lab_s[:-1]])
first = (lab_s != N) & (lab_s != prev)
(ranks, _) = timeK("rank cumsum (N)",
                   lambda f: jnp.cumsum(f.astype(jnp.int32)) - 1,
                   jnp.stack([first] * K))
rank = ranks

ckey = jnp.where(first, rank, N)
(comp, _) = timeK("compaction sort (N,3op)",
                  lambda a: jax.lax.sort((a[0], a[1], a[2]), num_keys=1),
                  (jnp.stack([ckey] * K), jnp.stack([idx] * K),
                   jnp.stack([lab_s] * K)))
_, P, D = comp
P, D = P[:R], D[:R]

flatp = jnp.concatenate([flat, jnp.full((1,), N, jnp.int32)])
(_, _) = timeK("chain: par=flatp[D] (R gather)",
               lambda d: flatp[d], jnp.stack([D] * K))
par = flatp[D]
ks = jnp.arange(R, dtype=jnp.int32)
(_, _) = timeK("chain: inv scatter (R)",
               lambda d: jnp.full((N + 2,), R, jnp.int32).at[d].set(ks)[:N + 1],
               jnp.stack([D] * K))
inv = jnp.full((N + 2,), R, jnp.int32).at[D].set(ks)[:N + 1]
parx = jnp.concatenate([inv[par], jnp.full((1,), R, jnp.int32)])
(_, _) = timeK("chain: 5 doublings (R gathers)",
               lambda p: p[p][p][p][p][p], jnp.stack([parx] * K))

(_, _) = timeK("root sort pair (R,3op x2)",
               lambda a: jax.lax.sort(
                   jax.lax.sort((a[0], a[1], ks), num_keys=1), num_keys=1),
               (jnp.stack([D] * K), jnp.stack([par] * K)))

seedv = jnp.where(ks < 30000, ks, -1)
(_, _) = timeK("seed scatter (R) + copyscan (N)",
               lambda a: _seg_scan(
                   (jnp.full((N + 1,), -1, jnp.int32)
                    .at[a].set(seedv)[:N])[:, None],
                   (lab_s != prev)[:, None], lambda x, y: x)[:, 0],
               jnp.stack([P] * K))

(_, _) = timeK("unsort (N,2op)",
               lambda a: jax.lax.sort((a[0], a[1]), num_keys=1),
               (jnp.stack([idx_s] * K), jnp.stack([lab_s] * K)))

# --- round-5 NEGATIVE RESULT: sort-join parx + merge-join broadcast -------
# These replaced the table passes above and LOST (~2x slower); reverted in
# ops/resolve.py, kept here so the head-to-head stays reproducible.


def _parent_ranks_join(idx_s, rank, D, kvalid, N, R):
    ks_ = jnp.arange(R, dtype=jnp.int32)
    qkey = jnp.where(kvalid, D, N + ks_)
    jkey = jnp.concatenate([idx_s, qkey])
    jtag = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(R, jnp.int32)])
    jval = jnp.concatenate([rank, jnp.full((R,), R, jnp.int32)])
    jj = jnp.concatenate([jnp.full((N,), R, jnp.int32), ks_])
    k1, t1, v1, j1 = jax.lax.sort((jkey, jtag, jval, jj), num_keys=2)
    prevk = jnp.concatenate([jnp.full((1,), -1, jnp.int32), k1[:-1]])
    firstk = (k1 != prevk)[:, None]
    carried = _seg_scan(v1[:, None], firstk, lambda x, y: x)[:, 0]
    ekey = jnp.where(t1 == 1, j1, N + R)
    _, parx_r = jax.lax.sort((ekey, carried), num_keys=1)
    return jnp.concatenate([jnp.minimum(parx_r[:R], R),
                            jnp.full((1,), R, jnp.int32)])


def _broadcast_group_vals(P_, kvalid, rank, idx_s, vals, N, R):
    ks_ = jnp.arange(R, dtype=jnp.int32)
    pos = jnp.arange(N, dtype=jnp.int32)
    mkey = jnp.concatenate([2 * pos + 1,
                            jnp.where(kvalid, 2 * P_, 2 * (N + ks_))])
    mrank = jnp.concatenate([rank, jnp.where(kvalid, ks_, (1 << 30) + ks_)])
    midx = jnp.concatenate([idx_s, jnp.full((R,), N, jnp.int32)])
    mvals = [jnp.concatenate([jnp.full((N,), -1, jnp.int32),
                              jnp.where(kvalid, v, -1)]) for v in vals]
    sorted_ = jax.lax.sort((mkey, mrank, *mvals, midx), num_keys=1)
    r3, vs3, i3 = sorted_[1], sorted_[2:2 + len(vals)], sorted_[-1]

    def comb(a, b):
        out = [b[0]]
        for va, vb in zip(a[1:], b[1:]):
            out.append(jnp.where((b[0] == a[0]) & (vb < 0), va, vb))
        return tuple(out)

    carried = jax.lax.associative_scan(comb, (r3, *vs3), axis=0)[1:]
    unsorted = jax.lax.sort((i3, *carried), num_keys=1)
    return [u[:N] for u in unsorted[1:]]


kvalid = D < N
(_, _) = timeK("parx sort-join (N+R)",
               lambda a: _parent_ranks_join(a[0], a[1], a[2], a[2] < N, N, R),
               (jnp.stack([idx_s] * K), jnp.stack([rank] * K),
                jnp.stack([D] * K)))
(_, _) = timeK("bcast merge-join 1 val (N+R)",
               lambda a: _broadcast_group_vals(
                   a[0], a[3] < N, a[1], a[2], [seedv], N, R)[0],
               (jnp.stack([P] * K), jnp.stack([rank] * K),
                jnp.stack([idx_s] * K), jnp.stack([D] * K)))
(_, _) = timeK("bcast merge-join 2 vals (N+R)",
               lambda a: _broadcast_group_vals(
                   a[0], a[3] < N, a[1], a[2], [seedv, seedv], N, R)[0],
               (jnp.stack([P] * K), jnp.stack([rank] * K),
                jnp.stack([idx_s] * K), jnp.stack([D] * K)))

(_, _) = timeK("resolve_components FULL",
               lambda a: resolve_components(
                   a[0], a[1], min_component_pixels=cfg.min_component_pixels,
                   max_components=cfg.max_components,
                   chain_steps=cfg.ccl_resolve_steps).dense,
               (jnp.stack([lab] * K), jnp.stack([valid] * K)))
(_, _) = timeK("resolve_roots",
               lambda a: resolve_roots(
                   a[0], a[1], max_components=cfg.max_components,
                   chain_steps=cfg.ccl_resolve_steps),
               (jnp.stack([lab] * K), jnp.stack([valid] * K)))
print("DONE", flush=True)
