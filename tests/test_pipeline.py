"""Graph-pipeline tests: rectify (real plumb_bob distortion) -> resize ->
detect, including the reference's motivating 8 MP downscale path.

Calibration is the reference's shipped usb_cam calibration
(ref: isaac_ros_apriltag/config/camera_info.yaml:19-44 — 1280x720,
K = [942.532, 946.212, 642.811, 346.713],
D = [0.065725, -0.096954, 0.002318, 0.004110, 0]); the 8 MP case mirrors
README.md:24-26 (3840x2160 downscaled to 1080p before detection).
"""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.pipeline import GraphPipeline
from isaac_ros_apriltag_tpu.utils.render import (project_corners, render_tags,
                                                 upright_pose)

# ref: isaac_ros_apriltag/config/camera_info.yaml:19-44
REF_K = dict(fx=942.53242, fy=946.21221, cx=642.81122, cy=346.71313)
REF_D = [0.065725, -0.096954, 0.002318, 0.004110, 0.0]
REF_W, REF_H = 1280, 720


from isaac_ros_apriltag_tpu.utils.render import distort_image


def _scene_tags(z=1.6, size=0.22):
    fam = get_family("tag36h11")
    out = []
    for i, (x, y) in enumerate([(-0.35, -0.1), (0.35, 0.12)]):
        t = np.array([x, y, z])
        out.append(dict(family=fam, id=2 * i + 1, R=upright_pose(t, 0.1 * i),
                        t=t, tag_size=size))
    return out


def test_rectify_with_reference_distortion():
    """distorted render -> GraphPipeline(rectify -> detect) -> golden corners."""
    cam = CameraModel.create(width=REF_W, height=REF_H, dist=REF_D, **REF_K)
    tags = _scene_tags()
    ideal = render_tags(np.asarray(cam.K), (REF_H, REF_W), tags)
    distorted = distort_image(ideal, cam)

    # sanity: distortion actually moved the corners (several px at the edges)
    gp = GraphPipeline(DetectorConfig(tag_size=0.22, backend="xla"), cam,
                       encoding="mono8")
    det, stats = gp(distorted)
    rows = {int(i): c for i, c in
            zip(np.asarray(det.id)[np.asarray(det.valid)],
                np.asarray(det.corners)[np.asarray(det.valid)])}
    assert sorted(rows) == [t["id"] for t in tags]
    for t in tags:
        want = project_corners(np.asarray(cam.K), t["R"], t["t"], t["tag_size"])
        err = np.linalg.norm(rows[t["id"]] - want, axis=-1).max()
        # two bilinear resamples (synthesis + rectify) soften edges; the
        # reference's own accuracy gate is 2 px (pol_test.py:125-128)
        assert err < 1.0, (t["id"], err)


def test_rectify_map_roundtrip():
    """rectify_map must invert the forward distortion to subpixel accuracy."""
    cam = CameraModel.create(width=REF_W, height=REF_H, dist=REF_D, **REF_K)
    grid = cam.rectify_map()                      # (H, W, 2) source coords
    # forward-distort a lattice of ideal pixels and look them up in the map
    K = np.asarray(cam.K, np.float64)
    pts = np.stack(np.meshgrid(np.linspace(100, REF_W - 100, 7),
                               np.linspace(80, REF_H - 80, 5)), -1).reshape(-1, 2)
    import jax.numpy as jnp
    norm = (pts - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    dist_xy = np.asarray(cam.distort_normalized(jnp.asarray(norm)))
    expect = dist_xy * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    got = np.stack([[grid[int(round(p[1])), int(round(p[0])), 0] for p in pts],
                    [grid[int(round(p[1])), int(round(p[0])), 1] for p in pts]],
                   -1)
    # nearest-pixel lookup of the map vs exact forward distortion: the map is
    # smooth, so one pixel of lattice quantization stays well under 1 px here.
    assert np.abs(got - expect).max() < 1.0


def test_8mp_downscale_graph():
    """3840x2160 -> 2x2 area downscale -> detect (README.md:24-26 path)."""
    W8, H8 = 3840, 2160
    cam = CameraModel.create(fx=1800.0, fy=1800.0, cx=W8 / 2, cy=H8 / 2,
                             width=W8, height=H8)
    tags = _scene_tags(z=2.0, size=0.3)
    img = render_tags(np.asarray(cam.K), (H8, W8), tags)
    gp = GraphPipeline(DetectorConfig(tag_size=0.3, backend="xla"), cam,
                       downscale=2, encoding="mono8")
    det, stats = gp(img)
    valid = np.asarray(det.valid)
    ids = sorted(np.asarray(det.id)[valid].tolist())
    assert ids == [t["id"] for t in tags]
    cam_lo = gp.detect_camera
    rows = {int(i): c for i, c in zip(np.asarray(det.id)[valid],
                                      np.asarray(det.corners)[valid])}
    for t in tags:
        want = project_corners(np.asarray(cam_lo.K), t["R"], t["t"],
                               t["tag_size"])
        err = np.linalg.norm(rows[t["id"]] - want, axis=-1).max()
        assert err < 0.5, (t["id"], err)


def test_separable_rectify_matches_gather_oracle():
    """ops.remap.SeparableRectify (banded shift-mul-accumulate, the
    production path) vs remap_bilinear (gather oracle): sub-0.15-gray-level
    interior agreement on a smooth image with the reference calibration."""
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.ops.remap import SeparableRectify, remap_bilinear

    cam = CameraModel.create(width=REF_W, height=REF_H, dist=REF_D, **REF_K)
    grid = np.asarray(cam.rectify_map())
    y, x = np.mgrid[0:REF_H, 0:REF_W]
    img = (128 + 90 * np.sin(x / 29.0) * np.cos(y / 31.0)).astype(np.float32)
    a = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(grid, jnp.float32)))
    b = np.asarray(SeparableRectify.from_grid(grid)(jnp.asarray(img)))
    d = np.abs(a - b)[8:-8, 8:-8]
    assert d.max() < 0.15, d.max()


def test_graph_pipeline_separable_vs_exact_corners():
    """End-to-end: the default (separable) rectify path and the gather
    oracle path must detect the same tags with corners within 0.05 px."""
    cam = CameraModel.create(width=REF_W, height=REF_H, dist=REF_D, **REF_K)
    tags = _scene_tags()
    ideal = render_tags(np.asarray(cam.K), (REF_H, REF_W), tags)
    distorted = distort_image(ideal, cam)
    cfg = DetectorConfig(tag_size=0.22, backend="xla")
    det_a, _ = GraphPipeline(cfg, cam, encoding="mono8")(distorted)
    det_b, _ = GraphPipeline(cfg, cam, encoding="mono8",
                             exact_remap=True)(distorted)
    va, vb = np.asarray(det_a.valid), np.asarray(det_b.valid)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(np.asarray(det_a.id)[va],
                                  np.asarray(det_b.id)[vb])
    np.testing.assert_allclose(np.asarray(det_a.corners)[va],
                               np.asarray(det_b.corners)[vb], atol=0.05)
