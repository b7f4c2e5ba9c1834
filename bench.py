"""Benchmark driver: prints the headline JSON line IMMEDIATELY, then enriches.

Headline: tag36h11 detection throughput (frames/s/chip) at noisy 1080p with
the production `pallas` backend — the BASELINE.json primary metric.
vs_baseline is against the reference's best published single-GPU number
(596 fps @720p on RTX 5090, /root/reference/README.md:69; BASELINE.md sets
the v5e target at >= 2x that).

Artifact robustness (round-4 lesson: the driver's run timed out inside an
optional section and the whole record was lost): the headline JSON line is
printed RIGHT AFTER the headline loop, and re-printed (enriched) after every
optional section — the driver parses the last complete line, so a section
that hangs or dies can only cost its own fields, never the record. Every
optional section also checks a wall-clock budget (BENCH_BUDGET_S, default
1500 s) and skips with `<name>_skipped_budget` once it is exhausted.

Timing methodology (see isaac_ros_apriltag_tpu/utils/timing.py and
CLAUDE.md): jax.block_until_ready does NOT synchronize on the tunneled axon
platform, so every loop forces a host readback per completed call. The
headline keeps 2 calls in flight (steady-state throughput: the readback RTT
hides behind device compute; every call is still truly synced);
`fps_serial` records the fully-serial dispatch->readback->dispatch rate.

detail carries: the XLA-oracle fps, the 720p line (the reference's own
benchmark resolution, README.md:67-70), the graph-pipeline fps on REAL
graph work (8 MP distorted input -> separable rectify -> 2x resize ->
detect at 1080p, reproducing README.md:24-26), an on-hardware
pallas-vs-xla parity check covering ids + corners (<=0.1 px) AND poses
(translation <=1 cm, quaternion <=0.01 — the reference's full
backends-compare contract, ref test:162-253), a pallas batched-vs-single
parity check (so a production-side batching bug cannot hide behind the
known batched-oracle anomaly), streaming-runner lines (batched + single),
a per-stage ms table and the residual (measured - stage sum). Exits
nonzero on 0 detections or parity failure.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 596.0  # RTX 5090 anchor (reference README.md:69)

# The reference's shipped usb_cam calibration (isaac_ros_apriltag/config/
# camera_info.yaml:19-44), scaled 3x to the 8 MP graph input.
REF_K = dict(fx=942.53242, fy=946.21221, cx=642.81122, cy=346.71313)
REF_D = [0.065725, -0.096954, 0.002318, 0.004110, 0.0]


def _tag_layout(fam):
    tags = []
    for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                                (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
        t = np.array([x, y, 2.5])
        tags.append(dict(family=fam, id=7 * i + 1, R=None, t=t, tag_size=0.3))
    return tags


def _scene(H, W, noise=2.0, cam=None):
    from isaac_ros_apriltag_tpu import CameraModel
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

    if cam is None:
        cam = CameraModel.create(fx=900.0 * W / 1920, fy=900.0 * W / 1920,
                                 cx=W / 2, cy=H / 2, width=W, height=H)
    fam = get_family("tag36h11")
    tags = _tag_layout(fam)
    for i, tg in enumerate(tags):
        tg["R"] = upright_pose(tg["t"], 0.1 * i)
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=noise)
    return cam, frame


def _stage_table(cam, frame, cfg, iters):
    """Per-stage ms at the bench configuration (isolated stage jits)."""
    import jax
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles, _upscale_coords
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.ops.ccl import connected_components
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.decode import decode_quads
    from isaac_ros_apriltag_tpu.ops.pose import estimate_poses
    from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
    from isaac_ros_apriltag_tpu.ops.refine import refine_edges
    from isaac_ros_apriltag_tpu.ops.resolve import (resolve_components,
                                                    resolve_roots_rank)
    from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold

    fam = get_family(cfg.tag_family)
    d = cfg.quad_decimate
    use_pallas = cfg.backend == "pallas"
    if use_pallas:
        from isaac_ros_apriltag_tpu.ops.pallas.ccl_fused import ccl_scan_pallas
        from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas

    gray = jnp.asarray(frame, jnp.float32)
    table = {}

    K = max(4, min(iters, 8))
    _probe = jax.jit(lambda s: s + 1.0)

    def _rtt():
        # min over probes: the tunnel RTT drifts (26-50 ms); the subtraction
        # must not absorb a spike into a stage number.
        vals = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(_probe(jnp.float32(1.0)))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    float(_probe(jnp.float32(0.0)))  # warm the probe

    def timeit(name, fn, *args):
        # lax.map runs K sequential executions inside ONE dispatch, so the
        # per-op time is clean of the tunnel RTT (see timing methodology);
        # the single remaining RTT is measured and subtracted.
        mapped = jax.jit(lambda xs: jax.lax.map(lambda a: fn(*a), xs))
        stacked = jax.tree.map(lambda x: jnp.stack([x] * K), tuple(args))
        out = mapped(stacked)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(2):
            r0 = _rtt()
            t0 = time.perf_counter()
            out = mapped(stacked)
            np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0 - r0)
        table[name] = round(max(1000 * best / K, 0.0), 3)
        return jax.tree.map(lambda x: x[0], out)

    seg = timeit("decimate", lambda g: _pad_to_tiles(_decimate(g, d), cfg.tile_size), gray)
    E_eff, R_eff = cfg.effective_capacities(*seg.shape)
    if use_pallas:
        tri = timeit("threshold", lambda s: adaptive_threshold_pallas(
            s, cfg.tile_size, cfg.min_white_black_diff), seg)

        # The FULL production front: phase-1 scan -> compacted RANK-space
        # contraction -> opaque phase-2 scan (detector.py) — not just phase
        # 1, so the 'ccl' row attributes the whole two-phase cost instead
        # of leaking contraction + phase 2 into residual_ms.
        def full_ccl(t):
            label, _ = ccl_scan_pallas(t, cfg.ccl_scan_rounds)
            if cfg.ccl_phase2_rounds > 0:
                label = jax.lax.optimization_barrier(label)
                rank_img, T, _ovf = resolve_roots_rank(
                    label, t != 127, max_components=R_eff,
                    chain_steps=cfg.ccl_contraction_steps)
                label, _ = ccl_scan_pallas(
                    t, cfg.ccl_phase2_rounds,
                    label0=jax.lax.optimization_barrier(rank_img),
                    opaque=True)
                return label, T
            return label, None

        lab, rtab = timeit("ccl", full_ccl, tri)
        dense = timeit("resolve", lambda t, l, T: resolve_components(
            l, t != 127, min_component_pixels=cfg.min_component_pixels,
            max_components=R_eff, chain_steps=cfg.ccl_resolve_steps,
            rank_table=T).dense, tri, lab, rtab)
    else:
        tri = timeit("threshold", lambda s: adaptive_threshold(
            s, cfg.tile_size, cfg.min_white_black_diff), seg)
        lab = timeit("ccl", lambda t: connected_components(
            t, cfg.ccl_rounds, cfg.ccl_jumps, cfg.ccl_jump_every), tri)
        dense = timeit("resolve", lambda t, l: resolve_components(
            l, t != 127, min_component_pixels=cfg.min_component_pixels,
            max_components=R_eff,
            chain_steps=cfg.ccl_resolve_steps).dense, tri, lab)
    mom = timeit("cluster_moments", lambda t, dn: extract_cluster_moments(
        t, dn, comp_overflow=jnp.bool_(False),
        max_edge_points=E_eff,
        max_clusters=cfg.max_clusters,
        min_cluster_pixels=cfg.min_cluster_pixels,
        max_cluster_points=cfg.max_cluster_points), tri, dense)
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
    from isaac_ros_apriltag_tpu.utils.timing import throughput

    H, W = 1080, 1920
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    ITERS = int(os.environ.get("BENCH_ITERS", "30"))
    BACKEND = os.environ.get("BENCH_BACKEND", "pallas")
    BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()
    fail = []

    cam, frame = _scene(H, W)
    frames = np.stack([frame] * BATCH)
    x = jnp.asarray(frames)

    # --- headline: production backend, batched 1080p, 2-deep pipeline ------
    cfg = DetectorConfig(backend=BACKEND, tag_size=0.3)
    fn = jax.jit(jax.vmap(build_detect_fn(cfg, cam, encoding="mono8")))
    dt, (det0, stats0) = throughput(fn, x, ITERS, overlap=2)
    fps = BATCH * ITERS / dt
    n_det = int(np.asarray(stats0.num_detections).sum())
    det_per_frame = n_det // BATCH

    detail = {
        "batch": BATCH, "iters": ITERS,
        "ms_per_frame": round(1000.0 * dt / (BATCH * ITERS), 3),
        "detections_per_frame": det_per_frame,
        "device": str(jax.devices()[0]),
        "backend": cfg.backend,
    }

    def emit():
        # The driver parses the LAST complete JSON line; emitting after the
        # headline AND after every section means a later hang/kill can only
        # lose its own section's fields, never the record (round-4 lesson:
        # BENCH_r04 was rc=124/parsed=null because the single print came
        # after every optional section).
        print(json.dumps({
            "metric": "tag36h11_fps_1080p_per_chip",
            "value": round(fps, 1),
            "unit": "frames/s",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
            "detail": detail,
        }), flush=True)

    emit()

    dt_s, _ = throughput(fn, x, max(ITERS // 2, 5), overlap=1)
    detail["fps_serial"] = round(BATCH * max(ITERS // 2, 5) / dt_s, 1)

    import contextlib

    @contextlib.contextmanager
    def section(name):
        """Optional sections survive transient failures (the remote compile
        service occasionally drops a connection mid-body); errors are
        recorded in the detail instead of losing the whole run. Each section
        checks the wall-clock budget first and skips once it is exhausted."""
        elapsed = time.monotonic() - t_start
        if elapsed > BUDGET_S:
            detail[name + "_skipped_budget"] = round(elapsed, 1)
            print(f"# bench section {name} SKIPPED (budget: {elapsed:.0f}s "
                  f"> {BUDGET_S:.0f}s)", file=sys.stderr, flush=True)
            yield False
            return
        try:
            yield True
            print(f"# bench section {name} done", file=sys.stderr, flush=True)
        except Exception as e:
            # Recorded, not fatal: a transient remote-compile drop in an
            # optional section must not lose the headline record. Absent
            # fields (e.g. parity_ok) are visible in the artifact.
            detail[name + "_error"] = str(e)[:200]
            print(f"# bench section {name} FAILED: {e}", file=sys.stderr,
                  flush=True)
        emit()

    # --- secondary: XLA oracle fps + on-hardware backend parity ------------
    if os.environ.get("BENCH_XLA", "1") == "1" and BACKEND != "xla":
        with section("xla") as live:
            if live:
                cfg_x = DetectorConfig(backend="xla", tag_size=0.3)
                fn_x = jax.jit(jax.vmap(build_detect_fn(cfg_x, cam, encoding="mono8")))
                dt_x, (det_x, stats_x) = throughput(fn_x, x, ITERS, overlap=2)
                detail["xla_fps"] = round(BATCH * ITERS / dt_x, 1)
                detail["xla_detections_per_frame"] = int(
                    np.asarray(stats_x.num_detections).sum()) // BATCH
                # Parity on real hardware: the reference's backends-compare
                # contract (same ids; corners AND poses numerically close,
                # ref test:162-253) between the production output and the
                # oracle, SINGLE-frame like the reference's test. (The
                # batched oracle graph hit an XLA:TPU miscompile in round 4:
                # identical trinary, diverged CCL labels, one tag lost per
                # frame — tracked via xla_batched_anomaly below.)
                fn_x1 = jax.jit(build_detect_fn(cfg_x, cam, encoding="mono8"))
                det_x1, _ = fn_x1(x[0])
                np.asarray(det_x1.valid)
                va = np.asarray(det0.valid)[0]
                vb = np.asarray(det_x1.valid)
                ia = np.asarray(det0.id)[0]
                ib = np.asarray(det_x1.id)
                ca = np.asarray(det0.corners)[0]
                cb = np.asarray(det_x1.corners)
                parity = bool((va == vb).all() and (ia[va] == ib[vb]).all())
                if parity:
                    max_err = float(np.abs(ca[va] - cb[vb]).max())
                    ta = np.asarray(det0.translation)[0][va]
                    tb = np.asarray(det_x1.translation)[vb]
                    qa = np.asarray(det0.quaternion)[0][va]
                    qb = np.asarray(det_x1.quaternion)[vb]
                    t_err = float(np.abs(ta - tb).max()) if va.any() else 0.0
                    # q and -q are the same rotation: per-detection sign min.
                    q_err = float(np.minimum(
                        np.abs(qa - qb).max(axis=-1),
                        np.abs(qa + qb).max(axis=-1)).max()) if va.any() else 0.0
                else:
                    max_err = t_err = q_err = float("inf")
                detail["parity_ok"] = bool(parity and max_err <= 0.1
                                           and t_err <= 0.01 and q_err <= 0.01)
                detail["parity_max_corner_err_px"] = round(max_err, 5)
                detail["parity_max_translation_err_m"] = round(t_err, 6)
                detail["parity_max_quaternion_err"] = round(q_err, 6)
                detail["xla_batched_anomaly"] = bool(
                    detail["xla_detections_per_frame"]
                    != int(np.asarray(det_x1.valid).sum()))
                if not detail["parity_ok"]:
                    fail.append(f"backend parity failed (corner {max_err}, "
                                f"t {t_err}, q {q_err})")
                # BATCHED parity vs a lax.map oracle (identical math,
                # per-frame graphs sequenced in one jit). The vmap-composed
                # oracle is unusable at batch shape: its float tail
                # (quadfit..pose) diverges under vmap while every prefix
                # through cluster moments is bit-exact, and lax.map equals
                # single-frame EXACTLY (tools/repro_batched_oracle.py,
                # ROUND5_NOTES) — so this closes the reference's
                # same-shape backends-compare contract (ref test:37-253)
                # without the vmap fusion bug in the loop.
                fn_xm = jax.jit(lambda xs: jax.lax.map(
                    build_detect_fn(cfg_x, cam, encoding="mono8"), xs))
                det_xm, _ = fn_xm(x)
                np.asarray(det_xm.valid)
                vA = np.asarray(det0.valid)
                vM = np.asarray(det_xm.valid)
                bok = bool((vA == vM).all())
                berr = 0.0
                if bok:
                    iA = np.asarray(det0.id)
                    iM = np.asarray(det_xm.id)
                    cA = np.asarray(det0.corners)
                    cM = np.asarray(det_xm.corners)
                    bok = bool((iA[vA] == iM[vM]).all())
                    berr = float(np.abs(cA[vA] - cM[vM]).max()) \
                        if bok and vA.any() else (0.0 if bok else float("inf"))
                else:
                    berr = float("inf")
                detail["parity_batched_ok"] = bool(bok and berr <= 0.1)
                detail["parity_batched_max_corner_err_px"] = round(berr, 5)
                if not detail["parity_batched_ok"]:
                    fail.append("batched parity vs lax.map oracle failed")

    # --- pallas batched-vs-single parity -----------------------------------
    # The oracle validates the production path single-frame only (batched
    # oracle anomaly above); this closes the remaining hole: a batching bug
    # in the PRODUCTION pallas graph would show up here.
    if os.environ.get("BENCH_SELF_PARITY", "1") == "1":
        with section("self_parity") as live:
            if live:
                fn_p1 = jax.jit(build_detect_fn(cfg, cam, encoding="mono8"))
                det_p1, _ = fn_p1(x[0])
                np.asarray(det_p1.valid)
                va = np.asarray(det0.valid)[0]
                vb = np.asarray(det_p1.valid)
                ok = bool((va == vb).all()
                          and (np.asarray(det0.id)[0][va]
                               == np.asarray(det_p1.id)[vb]).all())
                err = float(np.abs(np.asarray(det0.corners)[0][va]
                                   - np.asarray(det_p1.corners)[vb]).max()) \
                    if ok and va.any() else (0.0 if ok else float("inf"))
                detail["pallas_batch_parity_ok"] = bool(ok and err <= 0.1)
                detail["pallas_batch_max_corner_err_px"] = round(err, 5)
                if not detail["pallas_batch_parity_ok"]:
                    fail.append("pallas batched-vs-single parity failed")

    # --- per-stage breakdown + residual ------------------------------------
    if os.environ.get("BENCH_STAGES", "1") == "1":
        with section("stages") as live:
            if live:
                detail["stage_ms"] = _stage_table(cam, frame, cfg, max(ITERS, 10))
                detail["residual_ms"] = round(
                    detail["ms_per_frame"] - sum(detail["stage_ms"].values()), 3)
                # Spatial-parallel Amdahl split (VERDICT r4 item 5): the
                # row-sharded SpatialDetector shards the front (decimate,
                # threshold, CCL) and replicates the tail after all_gather
                # (parallel/spatial.py:215-249), so the tail bounds its
                # multi-chip speedup. Measured here on real hardware from
                # the same stage table.
                st = detail["stage_ms"]
                front = sum(st.get(k, 0.0)
                            for k in ("decimate", "threshold", "ccl"))
                tail = sum(v for k, v in st.items()
                           if k not in ("decimate", "threshold", "ccl"))
                detail["spatial_front_ms"] = round(front, 3)
                detail["spatial_tail_ms"] = round(tail, 3)
                detail["spatial_max_speedup"] = round(
                    (front + tail) / tail, 2) if tail > 0 else None

    # --- apples-to-apples 720p line (reference anchor is 596 fps @720p) ----
    if os.environ.get("BENCH_720", "1") == "1":
        with section("720p") as live:
            if live:
                cam7, frame7 = _scene(720, 1280)
                fn7 = jax.jit(jax.vmap(build_detect_fn(cfg, cam7, encoding="mono8")))
                x7 = jnp.asarray(np.stack([frame7] * BATCH))
                dt7, (_, stats7) = throughput(fn7, x7, ITERS, overlap=2)
                detail["fps_720p"] = round(BATCH * ITERS / dt7, 1)
                detail["detections_per_frame_720p"] = int(
                    np.asarray(stats7.num_detections).sum()) // BATCH

    # --- graph pipeline with REAL graph work (README.md:24-26, :70): -------
    # 8 MP distorted sensor input -> separable rectify -> 2x area resize ->
    # detect at 1080p, using the reference's shipped plumb_bob calibration
    # scaled 3x to 3840x2160.
    if os.environ.get("BENCH_GRAPH", "1") == "1":
        with section("graph") as live:
            if live:
                from isaac_ros_apriltag_tpu import CameraModel
                from isaac_ros_apriltag_tpu.pipeline import GraphPipeline
                from isaac_ros_apriltag_tpu.utils.render import distort_image

                cam8 = CameraModel.create(
                    fx=REF_K["fx"] * 3, fy=REF_K["fy"] * 3, cx=REF_K["cx"] * 3,
                    cy=REF_K["cy"] * 3, width=3840, height=2160, dist=REF_D)
                _, ideal8 = _scene(2160, 3840, cam=cam8)
                frame8 = distort_image(ideal8, cam8)
                gp = GraphPipeline(cfg, cam8, downscale=2, encoding="mono8")
                gfn = jax.jit(jax.vmap(
                    gp.fn_with_plan, in_axes=(0,) + (None,) * len(gp.plan_args)))
                x8 = jnp.asarray(np.stack([frame8] * BATCH))
                g_iters = max(ITERS // 2, 5)
                dt_g, (gdet, gstats) = throughput(
                    lambda x: gfn(x, *gp.plan_args), x8, g_iters, overlap=2)
                detail["graph_fps"] = round(BATCH * g_iters / dt_g, 1)
                detail["graph_detections_per_frame"] = int(
                    np.asarray(gstats.num_detections).sum()) // BATCH
                detail["graph_input"] = "3840x2160 plumb_bob -> rectify -> 2x -> detect"
                if detail["graph_detections_per_frame"] == 0:
                    fail.append("graph pipeline found 0 detections")

    # --- streaming runner: batched chunks (the production feed) ------------
    if os.environ.get("BENCH_STREAM", "1") == "1":
        with section("stream") as live:
            if live:
                from isaac_ros_apriltag_tpu.streaming import StreamingRunner

                N_CHUNKS = 8
                # Chunks are pre-uploaded; the caveat rides in the artifact:
                detail["stream_note"] = (
                    "chunks pre-uploaded to device; the dev tunnel's "
                    "host->device relay (~6.8 fps when uploading) is not a "
                    "production path and is excluded")
                stream = [jax.device_put(x)] * N_CHUNKS

                def run_depth(depth):
                    t0 = time.perf_counter()
                    for _ in StreamingRunner(fn, depth=depth).run(stream):
                        pass                 # runner syncs via host readback
                    return time.perf_counter() - t0

                run_depth(2)                 # warm path
                t_pipe = run_depth(3)
                detail["stream_fps_pipelined"] = round(N_CHUNKS * BATCH / t_pipe, 1)
                # single-frame stream (latency-oriented feed)
                sfn = jax.jit(build_detect_fn(cfg, cam, encoding="mono8"))
                s1 = [jax.device_put(jnp.asarray(frame))] * 16
                for _ in StreamingRunner(sfn, depth=2).run(s1[:4]):
                    pass
                t0 = time.perf_counter()
                for _ in StreamingRunner(sfn, depth=1).run(s1):
                    pass
                t_sync = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in StreamingRunner(sfn, depth=3).run(s1):
                    pass
                t_pipe1 = time.perf_counter() - t0
                detail["stream_fps_single_sync"] = round(len(s1) / t_sync, 1)
                detail["stream_fps_single_pipelined"] = round(len(s1) / t_pipe1, 1)

    emit()

    if det_per_frame == 0:
        fail.append("0 detections per frame")
    if fail:
        print("BENCH FAILED: " + "; ".join(fail), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
