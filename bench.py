"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: tag36h11 detection throughput (frames/s/chip) at noisy 1080p with
the production `pallas` backend — the BASELINE.json primary metric.
vs_baseline is against the reference's best published single-GPU number
(596 fps @720p on RTX 5090, /root/reference/README.md:69; BASELINE.md sets
the v5e target at >= 2x that).

detail carries: the XLA-oracle fps (secondary line), the graph-pipeline fps
(rectify -> resize -> detect, /root/reference/README.md:70), and a per-stage
ms table. Exits nonzero if the detector finds no tags (a 0-detection config
must never publish a throughput number).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 596.0  # RTX 5090 anchor (reference README.md:69)


def _scene(H, W, noise=2.0):
    from isaac_ros_apriltag_tpu import CameraModel
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

    cam = CameraModel.create(fx=900.0 * W / 1920, fy=900.0 * W / 1920,
                             cx=W / 2, cy=H / 2, width=W, height=H)
    fam = get_family("tag36h11")
    tags = []
    for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                                (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
        t = np.array([x, y, 2.5])
        tags.append(dict(family=fam, id=7 * i + 1, R=upright_pose(t, 0.1 * i),
                         t=t, tag_size=0.3))
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=noise)
    return cam, frame


def _throughput(fn, x, iters, valid_ref):
    # NB: jax.block_until_ready does NOT synchronize on the tunneled axon
    # platform (measured: an 8k^3 matmul "finishes" in 63 us). Every timing
    # loop here forces a true host readback of a scalar each iteration —
    # device execution is in-order, so the readback bounds all queued work —
    # and deep async queues are avoided entirely (they degrade ~30x on the
    # relay).
    det, stats = fn(x)  # compile + warmup
    n_det = int(np.asarray(stats.num_detections).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        det, stats = fn(x)
        np.asarray(det.valid)   # host readback = true sync point
    dt = time.perf_counter() - t0
    return dt, n_det


def _stage_table(cam, frame, cfg, iters):
    """Per-stage ms at the bench configuration (isolated stage jits)."""
    import jax
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.ops.ccl import component_sizes, connected_components
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.decode import decode_quads
    from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
    from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
    from isaac_ros_apriltag_tpu.ops.refine import refine_edges
    from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold

    fam = get_family(cfg.tag_family)
    d = cfg.quad_decimate
    use_pallas = cfg.backend == "pallas"
    if use_pallas:
        from isaac_ros_apriltag_tpu.ops.pallas.ccl import connected_components_pallas
        from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas

    gray = jnp.asarray(frame, jnp.float32)
    table = {}

    K = max(4, min(iters, 8))
    _probe = jax.jit(lambda s: s + 1.0)

    def _rtt():
        t0 = time.perf_counter()
        for _ in range(3):
            float(_probe(jnp.float32(1.0)))
        return (time.perf_counter() - t0) / 3

    float(_probe(jnp.float32(0.0)))  # warm the probe

    def timeit(name, fn, *args):
        # lax.map runs K sequential executions inside ONE dispatch, so the
        # per-op time is clean of the tunnel RTT (see _throughput note);
        # the single remaining RTT is measured and subtracted.
        mapped = jax.jit(lambda xs: jax.lax.map(lambda a: fn(*a), xs))
        stacked = jax.tree.map(lambda x: jnp.stack([x] * K), tuple(args))
        out = mapped(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        r0 = _rtt()
        t0 = time.perf_counter()
        out = mapped(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        dt = time.perf_counter() - t0 - r0
        table[name] = round(max(1000 * dt / K, 0.0), 3)
        return jax.tree.map(lambda x: x[0], out)

    seg = timeit("decimate", lambda g: _pad_to_tiles(_decimate(g, d), cfg.tile_size), gray)
    if use_pallas:
        tri = timeit("threshold", lambda s: adaptive_threshold_pallas(
            s, cfg.tile_size, cfg.min_white_black_diff), seg)
        lab = timeit("ccl", lambda t: connected_components_pallas(
            t, cfg.ccl_rounds, cfg.ccl_jumps, cfg.ccl_jump_every), tri)
    else:
        tri = timeit("threshold", lambda s: adaptive_threshold(
            s, cfg.tile_size, cfg.min_white_black_diff), seg)
        lab = timeit("ccl", lambda t: connected_components(
            t, cfg.ccl_rounds, cfg.ccl_jumps, cfg.ccl_jump_every), tri)
    sizes = timeit("component_sizes", component_sizes, lab)
    mom = timeit("cluster_moments", lambda t, l, s: extract_cluster_moments(
        t, l, s, max_edge_points=cfg.max_edge_points,
        max_clusters=cfg.max_clusters,
        min_component_pixels=cfg.min_component_pixels,
        min_cluster_pixels=cfg.min_cluster_pixels), tri, lab, sizes)
    quads = timeit("quadfit", lambda m: fit_quads_from_moments(
        m, min_area=64.0 / (d * d)), mom)
    corners = timeit("refine", lambda g, c, dk: refine_edges(
        g, _upscale_coords(c, d), dk, search_range=d + 1.0),
        gray, quads.corners, quads.dark_inside)
    dec = timeit("decode", lambda g, c: decode_quads(
        g, c, fam, max_hamming=cfg.max_hamming,
        decode_sharpening=cfg.decode_sharpening), gray, corners)
    timeit("pose", lambda c: estimate_poses(c, cam.K, cfg.tag_size), dec.corners)
    return table


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from isaac_ros_apriltag_tpu import DetectorConfig
    from isaac_ros_apriltag_tpu.detector import build_detect_fn

    H, W = 1080, 1920
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    ITERS = int(os.environ.get("BENCH_ITERS", "30"))
    BACKEND = os.environ.get("BENCH_BACKEND", "pallas")

    cam, frame = _scene(H, W)
    frames = np.stack([frame] * BATCH)
    x = jnp.asarray(frames)

    # --- headline: production backend, batched 1080p -----------------------
    cfg = DetectorConfig(backend=BACKEND, tag_size=0.3)
    fn = jax.jit(jax.vmap(build_detect_fn(cfg, cam, encoding="mono8")))
    dt, n_det = _throughput(fn, x, ITERS, None)
    fps = BATCH * ITERS / dt
    det_per_frame = n_det // BATCH

    detail = {
        "batch": BATCH, "iters": ITERS,
        "ms_per_frame": round(1000.0 * dt / (BATCH * ITERS), 3),
        "detections_per_frame": det_per_frame,
        "device": str(jax.devices()[0]),
        "backend": cfg.backend,
    }

    # --- secondary: XLA oracle fps -----------------------------------------
    if os.environ.get("BENCH_XLA", "1") == "1" and BACKEND != "xla":
        cfg_x = DetectorConfig(backend="xla", tag_size=0.3)
        fn_x = jax.jit(jax.vmap(build_detect_fn(cfg_x, cam, encoding="mono8")))
        dt_x, n_x = _throughput(fn_x, x, ITERS, None)
        detail["xla_fps"] = round(BATCH * ITERS / dt_x, 1)
        detail["xla_detections_per_frame"] = n_x // BATCH

    # --- graph pipeline: rectify -> resize -> detect (README.md:70) --------
    if os.environ.get("BENCH_GRAPH", "1") == "1":
        from isaac_ros_apriltag_tpu.pipeline import GraphPipeline

        gp = GraphPipeline(cfg, cam, encoding="mono8")
        gfn = jax.jit(jax.vmap(gp.fn))
        gdet, _ = gfn(x)
        np.asarray(gdet.valid)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            gdet, _ = gfn(x)
            np.asarray(gdet.valid)
        detail["graph_fps"] = round(BATCH * ITERS / (time.perf_counter() - t0), 1)

    # --- apples-to-apples 720p line (reference anchor is 596 fps @720p) ----
    if os.environ.get("BENCH_720", "0") == "1":
        cam7, frame7 = _scene(720, 1280)
        fn7 = jax.jit(jax.vmap(build_detect_fn(cfg, cam7, encoding="mono8")))
        x7 = jnp.asarray(np.stack([frame7] * BATCH))
        dt7, n7 = _throughput(fn7, x7, ITERS, None)
        detail["fps_720p"] = round(BATCH * ITERS / dt7, 1)
        detail["detections_per_frame_720p"] = n7 // BATCH

    # --- streaming runner: double-buffering overlap gain -------------------
    if os.environ.get("BENCH_STREAM", "1") == "1":
        from isaac_ros_apriltag_tpu.streaming import StreamingRunner

        sfn = jax.jit(build_detect_fn(cfg, cam, encoding="mono8"))
        det1, _ = sfn(jnp.asarray(frame))       # compile
        np.asarray(det1.valid)
        N_STREAM = 16
        stream = [frame] * N_STREAM

        def run_depth(depth):
            t0 = time.perf_counter()
            for det, _ in StreamingRunner(sfn, depth=depth).run(stream):
                np.asarray(det.valid)           # consumer readback (true sync)
            return time.perf_counter() - t0

        run_depth(2)                            # warm path
        t_sync = run_depth(1)
        t_pipe = run_depth(3)
        detail["stream_fps_sync"] = round(N_STREAM / t_sync, 1)
        detail["stream_fps_pipelined"] = round(N_STREAM / t_pipe, 1)

    # --- per-stage breakdown ----------------------------------------------
    if os.environ.get("BENCH_STAGES", "1") == "1":
        detail["stage_ms"] = _stage_table(cam, frame, cfg, max(ITERS, 10))

    print(json.dumps({
        "metric": "tag36h11_fps_1080p_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": detail,
    }))

    if det_per_frame == 0:
        print("BENCH FAILED: 0 detections per frame — refusing to publish a "
              "throughput number for a broken config", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
