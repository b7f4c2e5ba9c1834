"""Minimize the hardware-only batched XLA-oracle miscompile (round-4 find).

Symptom (ROUND4_NOTES "Known issue"): under jax.vmap at batch 8 the COMPOSED
xla-backend detect graph on TPU produces corrupted CCL labels (one tag lost
per frame, deterministic), while every stage is exact in isolation on the
same data. This script bisects by COMPOSED PREFIX: it builds progressively
longer prefixes of the oracle graph (threshold | +ccl | +resolve | +cluster
| full detect), runs each batched (vmap, B) and single-frame on the TPU, and
reports the first prefix whose batched output diverges from its own
single-frame output. Optional workarounds are probed afterwards.

Usage:  python tools/repro_batched_oracle.py [batch]
Writes /tmp/batched_oracle_report.txt and prints a summary. Exits 0 with
"NO DIVERGENCE" if the anomaly no longer reproduces (e.g. after the
scatter/gather-hint removal in ops/resolve.py:129-137).

Reference contract this unblocks: the backends-compare test runs identical
input shapes on both backends (isaac_ros_apriltag/test/
isaac_ros_apriltag_backends_compare_test.py:37-253).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _scene
    from isaac_ros_apriltag_tpu import DetectorConfig
    from isaac_ros_apriltag_tpu.detector import (_decimate, _pad_to_tiles,
                                                 build_detect_fn)
    from isaac_ros_apriltag_tpu.ops.ccl import connected_components
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.grayscale import grayscale
    from isaac_ros_apriltag_tpu.ops.resolve import resolve_components
    from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H, W = 1080, 1920
    cam, frame = _scene(H, W)
    x1 = jnp.asarray(frame)
    xB = jnp.asarray(np.stack([frame] * B))
    cfg = DetectorConfig(backend="xla", tag_size=0.3)
    report = []

    def log(s):
        report.append(s)
        print(s, flush=True)

    # --- composed prefixes of the oracle graph -----------------------------
    def pfx_trinary(img):
        gray = grayscale(img, "mono8")
        seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
        tri = adaptive_threshold(seg, cfg.tile_size, cfg.min_white_black_diff)
        return tri

    def pfx_ccl(img):
        tri = pfx_trinary(img)
        gray_t = jax.lax.optimization_barrier(tri)  # mirror detector barriers
        lab = connected_components(gray_t, cfg.ccl_rounds, cfg.ccl_jumps,
                                   cfg.ccl_jump_every)
        return lab

    def pfx_resolve(img):
        tri = pfx_trinary(img)
        tri = jax.lax.optimization_barrier(tri)
        lab = connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps,
                                   cfg.ccl_jump_every)
        lab = jax.lax.optimization_barrier(lab)
        E_eff, R_eff = cfg.effective_capacities(*tri.shape)
        return resolve_components(
            lab, tri != 127, min_component_pixels=cfg.min_component_pixels,
            max_components=R_eff, chain_steps=cfg.ccl_resolve_steps).dense

    def pfx_cluster(img):
        tri = pfx_trinary(img)
        tri = jax.lax.optimization_barrier(tri)
        lab = connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps,
                                   cfg.ccl_jump_every)
        lab = jax.lax.optimization_barrier(lab)
        E_eff, R_eff = cfg.effective_capacities(*tri.shape)
        res = resolve_components(
            lab, tri != 127, min_component_pixels=cfg.min_component_pixels,
            max_components=R_eff, chain_steps=cfg.ccl_resolve_steps)
        dense = jax.lax.optimization_barrier(res.dense)
        cm = extract_cluster_moments(
            tri, dense, comp_overflow=res.overflow, max_edge_points=E_eff,
            max_clusters=cfg.max_clusters,
            min_cluster_pixels=cfg.min_cluster_pixels,
            max_cluster_points=cfg.max_cluster_points)
        return cm.valid.astype(jnp.int32).sum(), cm.centroid

    detect = build_detect_fn(cfg, cam, encoding="mono8")

    def pfx_detect(img):
        det, _ = detect(img)
        return det.valid.astype(jnp.int32).sum(), det.id, det.corners

    prefixes = [("trinary", pfx_trinary), ("ccl", pfx_ccl),
                ("resolve", pfx_resolve), ("cluster", pfx_cluster),
                ("detect", pfx_detect)]

    first_bad = None
    for name, fn in prefixes:
        f1 = jax.jit(fn)
        fB = jax.jit(jax.vmap(fn))
        o1 = jax.tree.map(np.asarray, f1(x1))
        oB = jax.tree.map(np.asarray, fB(xB))
        leaves1 = jax.tree.leaves(o1)
        leavesB = jax.tree.leaves(oB)
        ndiff = 0
        for a, b in zip(leaves1, leavesB):
            for i in range(B):
                ndiff += int(np.sum(np.asarray(a) != np.asarray(b)[i]))
        log(f"prefix {name:8s}: batched-vs-single diff elements = {ndiff}")
        if ndiff and first_bad is None:
            first_bad = name
            break

    if first_bad is None:
        log("NO DIVERGENCE: the batched oracle matches single-frame on every "
            "composed prefix — the round-4 anomaly no longer reproduces "
            "(the vmap-unsafe scatter/gather hints were removed in "
            "ops/resolve.py).")
        _write(report)
        return 0

    log(f"FIRST DIVERGING PREFIX: {first_bad}")

    # --- workaround probes on the diverging prefix -------------------------
    fn = dict(prefixes)[first_bad]

    o1 = jax.tree.map(np.asarray, jax.jit(fn)(x1))

    def ndiff_vs_single(oB):
        return sum(int(np.sum(np.asarray(a) != np.asarray(b)[i]))
                   for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(oB))
                   for i in range(B))

    # (a) optimization_barrier around the whole prefix input.
    def barriered(img):
        return fn(jax.lax.optimization_barrier(img))

    oB = jax.tree.map(np.asarray, jax.jit(jax.vmap(barriered))(xB))
    log(f"workaround input-barrier: diff = {ndiff_vs_single(oB)}")

    # (b) lax.map instead of vmap: per-frame graphs sequenced inside ONE
    #     jit — no batched rolls/layouts, identical math. If this matches
    #     single-frame, the bench can run its batched parity contract
    #     against a lax.map oracle (a legitimate fence while the vmap
    #     fusion bug stands).
    oM = jax.tree.map(np.asarray, jax.jit(lambda xs: jax.lax.map(fn, xs))(xB))
    nd_map = ndiff_vs_single(oM)
    log(f"workaround lax.map oracle: diff = {nd_map}")
    if nd_map == 0:
        log("lax.map oracle EXACT: usable as the batched parity oracle.")

    # (b) HLO dump for offline minimization.
    dump = jax.jit(jax.vmap(fn)).lower(xB).as_text()
    path = "/tmp/batched_oracle_%s_hlo.txt" % first_bad
    with open(path, "w") as f:
        f.write(dump)
    log(f"HLO (stable) for batched {first_bad} written to {path} "
        f"({len(dump)} bytes)")
    _write(report)
    return 1


def _write(report):
    with open("/tmp/batched_oracle_report.txt", "w") as f:
        f.write("\n".join(report) + "\n")


if __name__ == "__main__":
    sys.exit(main())
