"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: tag36h11 detection throughput (frames/s/chip) at 1080p, batched —
the BASELINE.json primary metric. vs_baseline is against the reference's
best published single-GPU number (596 fps @720p on RTX 5090,
/root/reference/README.md:69; BASELINE.md sets the v5e target at >= 2x that).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 596.0  # RTX 5090 anchor (reference README.md:69)


def main():
    import jax

    from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
    from isaac_ros_apriltag_tpu.detector import build_detect_fn
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

    H, W = 1080, 1920
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    ITERS = int(os.environ.get("BENCH_ITERS", "30"))

    cam = CameraModel.create(fx=900.0, fy=900.0, cx=W / 2, cy=H / 2,
                             width=W, height=H)
    fam = get_family("tag36h11")
    rng = np.random.default_rng(0)

    # One frame with 6 tags at varied poses; batch = jittered copies.
    tags = []
    for i, (x, y) in enumerate([(-0.8, -0.45), (0.0, -0.45), (0.8, -0.45),
                                (-0.8, 0.45), (0.0, 0.45), (0.8, 0.45)]):
        t = np.array([x, y, 2.5])
        tags.append(dict(family=fam, id=7 * i + 1, R=upright_pose(t, 0.1 * i),
                         t=t, tag_size=0.3))
    frame = render_tags(np.asarray(cam.K), (H, W), tags, noise=2.0)
    frames = np.stack([frame] * BATCH)

    cfg = DetectorConfig(backend=os.environ.get("BENCH_BACKEND", "xla"),
                         tag_size=0.3)
    fn = jax.jit(jax.vmap(build_detect_fn(cfg, cam, encoding="mono8")))

    import jax.numpy as jnp

    x = jnp.asarray(frames)
    det, stats = fn(x)  # compile + warmup
    jax.block_until_ready(det.valid)
    n_det = int(np.asarray(stats.num_detections).sum())

    t0 = time.perf_counter()
    for _ in range(ITERS):
        det, stats = fn(x)
    jax.block_until_ready(det.valid)
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "tag36h11_fps_1080p_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": {
            "batch": BATCH, "iters": ITERS,
            "ms_per_frame": round(1000.0 * dt / (BATCH * ITERS), 3),
            "detections_per_frame": n_det // BATCH,
            "device": str(jax.devices()[0]),
            "backend": cfg.backend,
        },
    }))


if __name__ == "__main__":
    main()
