"""Localize the batched-vs-single divergence WITHIN the detect tail.

Round-5 finding (tools/repro_batched_oracle.py): every composed prefix
through cluster moments is BIT-EXACT batched-vs-single on TPU; only the
full detect graph diverges — so the round-4 "corrupted CCL labels" theory
is dead and the locus is the float tail (quadfit -> refine -> decode ->
dedupe/top_k -> pose). This script reproduces the detector's tail step by
step in ONE jit that returns every intermediate (quad corners/scores,
selection indices, refined corners, decode id/margin/valid, final ids) and
compares batched (vmap, B) vs single-frame field by field: the first
differing field names the stage. One graph pair keeps the compile bill at
two compiles instead of two per stage.

Usage: python tools/repro_tail_bisect.py [batch]
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
    from isaac_ros_apriltag_tpu.detector import (_decimate, _dedupe,
                                                 _pad_to_tiles,
                                                 _upscale_coords)
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.ops.ccl import connected_components
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.decode import decode_quads
    from isaac_ros_apriltag_tpu.ops.grayscale import grayscale
    from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
    from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
    from isaac_ros_apriltag_tpu.ops.refine import refine_edges
    from isaac_ros_apriltag_tpu.ops.resolve import resolve_components
    from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cam, frame = _scene(1080, 1920)
    x1 = jnp.asarray(frame)
    xB = jnp.asarray(np.stack([frame] * B))
    cfg = DetectorConfig(backend="xla", tag_size=0.3)
    fam = get_family(cfg.tag_family)

    def tail_all(img):
        gray = grayscale(img, "mono8")
        seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
        tri = adaptive_threshold(seg, cfg.tile_size, cfg.min_white_black_diff)
        gray, tri = jax.lax.optimization_barrier((gray, tri))
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
        cm = jax.lax.optimization_barrier(cm)
        # ---- the detector tail, step by step (detector.py:174-235) -------
        quads = fit_quads_from_moments(cm, min_area=64.0 / cfg.quad_decimate ** 2)
        want_dark = not fam.reversed_border
        qvalid = quads.valid & (quads.dark_inside == want_dark)
        T = cfg.max_tags
        T2 = min(2 * T, quads.valid.shape[0])
        perim = jnp.sum(jnp.linalg.norm(
            quads.corners - jnp.roll(quads.corners, 1, 1), axis=-1), axis=-1)
        qscore = jnp.where(qvalid, perim / (1.0 + quads.fit_err), -jnp.inf)
        top_qs, top_i = jax.lax.top_k(qscore, T2)
        pre_valid = jnp.isfinite(top_qs)
        qcorners = quads.corners[top_i]
        qdark = quads.dark_inside[top_i]
        refined = refine_edges(gray,
                               _upscale_coords(qcorners, cfg.quad_decimate),
                               qdark, search_range=cfg.quad_decimate + 1.0)
        dec = decode_quads(gray, refined, fam, max_hamming=cfg.max_hamming,
                           decode_sharpening=cfg.decode_sharpening)
        dec_valid = (pre_valid & dec.valid
                     & (dec.margin >= cfg.min_decision_margin))
        ddp_valid = _dedupe(dec_valid, dec.id, dec.margin, dec.corners)
        fscore = jnp.where(ddp_valid, dec.margin, -jnp.inf)
        top_fs, top_f = jax.lax.top_k(fscore, T)
        sel_valid = jnp.isfinite(top_fs)
        poses = estimate_poses(dec.corners[top_f], cam.K, cfg.tag_size)
        return dict(
            quad_corners=quads.corners, quad_fit_err=quads.fit_err,
            quad_valid=quads.valid, qscore=qscore, top_i=top_i,
            refined=refined, dec_valid=dec.valid, dec_id=dec.id,
            dec_margin=dec.margin, dec_corners=dec.corners,
            ddp_valid=ddp_valid, sel_valid=sel_valid, top_f=top_f,
            final_ids=jnp.where(sel_valid, dec.id[top_f], -1),
            pose_t=poses.translation,
        )

    print("compiling single...", flush=True)
    o1 = jax.tree.map(np.asarray, jax.jit(tail_all)(x1))
    print("compiling batched...", flush=True)
    oB = jax.tree.map(np.asarray, jax.jit(jax.vmap(tail_all))(xB))

    order = ["quad_corners", "quad_fit_err", "quad_valid", "qscore", "top_i",
             "refined", "dec_valid", "dec_id", "dec_margin", "dec_corners",
             "ddp_valid", "sel_valid", "top_f", "final_ids", "pose_t"]
    report = []
    for name in order:
        a, bb = o1[name], oB[name]
        nd = int(sum(np.sum(a != bb[i]) for i in range(B)))
        if np.issubdtype(a.dtype, np.floating):
            finite = np.isfinite(a)
            md = max(float(np.abs(np.where(finite, a - bb[i], 0)).max())
                     for i in range(B))
            line = f"{name:14s} diff={nd:8d} max_abs_delta={md:.3e}"
        else:
            line = f"{name:14s} diff={nd:8d}"
        report.append(line)
        print(line, flush=True)
    with open("/tmp/tail_bisect_report.txt", "w") as f:
        f.write("\n".join(report) + "\n")


if __name__ == "__main__":
    main()
