"""Spatial (halo-exchange) parallelism tests on the virtual CPU mesh.

The row-sharded front half must reproduce the single-device ops EXACTLY:
threshold is bit-identical by construction (halo covers tile stats +
dilation), and the sharded CCL converges to the same global min-index
labels via cut-row min-merges (survey §5.7a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.detector import _decimate, _pad_to_tiles
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops.ccl import connected_components
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
from isaac_ros_apriltag_tpu.parallel.spatial import build_spatial_front_fn
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]), ("y",))


@pytest.fixture(scope="module")
def camera():
    return CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                              width=640, height=480)


def _scene(camera, noise):
    fam = get_family("tag36h11")
    tags = []
    for i, (x, y) in enumerate([(-0.25, -0.15), (0.25, -0.15),
                                (-0.25, 0.18), (0.25, 0.18)]):
        t = np.array([x, y, 1.1])
        tags.append(dict(family=fam, id=3 * i + 1, R=upright_pose(t, 0.1 * i),
                         t=t, tag_size=0.16))
    return render_tags(np.asarray(camera.K), (camera.height, camera.width),
                       tags, noise=noise)


def test_front_half_matches_single_device(mesh, camera):
    """On a converged scene the sharded front half is BIT-IDENTICAL to the
    single-device ops (threshold always; labels at convergence — both
    assign the global min flat index per component)."""
    cfg = DetectorConfig(tag_size=0.16, backend="xla")
    img = _scene(camera, 0.0)
    fn = build_spatial_front_fn(cfg, camera, mesh)
    tri_s, lab_s = fn(jnp.asarray(img))

    gray = jnp.asarray(img, jnp.float32)
    seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
    tri = adaptive_threshold(seg, cfg.tile_size, cfg.min_white_black_diff)
    lab = connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps,
                               cfg.ccl_jump_every)
    np.testing.assert_array_equal(np.asarray(tri_s), np.asarray(tri))
    np.testing.assert_array_equal(np.asarray(lab_s), np.asarray(lab))


def test_noisy_detection_parity(mesh, camera):
    """Under noise the iteration-bounded CCLs may label unconverged speckle
    blobs differently between the sharded and single-device runs, but the
    threshold stays bit-identical and the END-TO-END detections (the user
    contract) must match: same ids, corners within float tolerance."""
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
    from isaac_ros_apriltag_tpu.ops.resolve import resolve_components

    cfg = DetectorConfig(tag_size=0.16, backend="xla")
    img = _scene(camera, 1.5)
    tri_s, lab_s = build_spatial_front_fn(cfg, camera, mesh)(jnp.asarray(img))

    gray = jnp.asarray(img, jnp.float32)
    seg = _pad_to_tiles(_decimate(gray, cfg.quad_decimate), cfg.tile_size)
    tri = adaptive_threshold(seg, cfg.tile_size, cfg.min_white_black_diff)
    np.testing.assert_array_equal(np.asarray(tri_s), np.asarray(tri))

    def tail(tri_in, lab_in):
        res = resolve_components(
            lab_in, tri_in != 127,
            min_component_pixels=cfg.min_component_pixels,
            max_components=cfg.max_components,
            chain_steps=cfg.ccl_resolve_steps)
        m = extract_cluster_moments(
            tri_in, res.dense, comp_overflow=res.overflow,
            max_edge_points=cfg.max_edge_points,
            max_clusters=cfg.max_clusters,
            min_cluster_pixels=cfg.min_cluster_pixels)
        q = fit_quads_from_moments(m, min_area=64.0 / cfg.quad_decimate ** 2)
        c = np.asarray(q.corners)[np.asarray(q.valid)]
        # canonicalize: sort by centroid for comparison
        order = np.lexsort((c.mean(1)[:, 1], c.mean(1)[:, 0]))
        return c[order]

    lab = connected_components(tri, cfg.ccl_rounds, cfg.ccl_jumps,
                               cfg.ccl_jump_every)
    qs, qd = tail(tri_s, lab_s), tail(tri, lab)
    assert len(qs) >= 4 and len(qd) >= 4

    # Speckle-quad sets may differ (unconverged noise blobs); the TAG quads
    # must exist in both runs and coincide to subpixel.
    from isaac_ros_apriltag_tpu.utils.render import project_corners
    fam = get_family("tag36h11")
    for i, (x, y) in enumerate([(-0.25, -0.15), (0.25, -0.15),
                                (-0.25, 0.18), (0.25, 0.18)]):
        t = np.array([x, y, 1.1])
        gt = project_corners(np.asarray(camera.K), upright_pose(t, 0.1 * i),
                             t, 0.16).mean(0) / cfg.quad_decimate
        for qset in (qs, qd):
            d = np.linalg.norm(qset.mean(1) - gt, axis=-1)
            assert d.min() < 2.0, f"tag at {gt} missing from a quad set"
        a = qs[np.linalg.norm(qs.mean(1) - gt, axis=-1).argmin()]
        b = qd[np.linalg.norm(qd.mean(1) - gt, axis=-1).argmin()]
        np.testing.assert_allclose(a, b, atol=0.1)


def test_front_half_feeds_detector_tail(mesh, camera):
    """Sharded front outputs drive the tail to the same detections."""
    from isaac_ros_apriltag_tpu.ops.cluster_moments import extract_cluster_moments
    from isaac_ros_apriltag_tpu.ops.quadfit import fit_quads_from_moments
    from isaac_ros_apriltag_tpu.ops.resolve import resolve_components

    cfg = DetectorConfig(tag_size=0.16, backend="xla")
    img = _scene(camera, 1.0)
    tri_s, lab_s = build_spatial_front_fn(cfg, camera, mesh)(jnp.asarray(img))
    res = resolve_components(
        lab_s, tri_s != 127, min_component_pixels=cfg.min_component_pixels,
        max_components=cfg.max_components, chain_steps=cfg.ccl_resolve_steps)
    m = extract_cluster_moments(
        tri_s, res.dense, comp_overflow=res.overflow,
        max_edge_points=cfg.max_edge_points,
        max_clusters=cfg.max_clusters,
        min_cluster_pixels=cfg.min_cluster_pixels)
    q = fit_quads_from_moments(m, min_area=64.0 / cfg.quad_decimate ** 2)
    assert int(jnp.sum(q.valid)) >= 4


def test_band_misalignment_autopads(mesh):
    """A height that doesn't split into tile-aligned bands (244 -> seg 122,
    not divisible by 4 shards x tile 4) auto-pads with edge rows and still
    detects; outputs crop back to the unpadded segmentation height."""
    camera = CameraModel.create(fx=220.0, fy=220.0, cx=320.0, cy=61.0,
                                width=640, height=244)
    cfg = DetectorConfig(tag_size=0.16, backend="xla")
    fam = get_family("tag36h11")
    t = np.array([0.0, 0.0, 0.6])
    img = render_tags(np.asarray(camera.K), (244, 640),
                      [dict(family=fam, id=9, R=upright_pose(t), t=t,
                            tag_size=0.16)])
    tri_s, lab_s = build_spatial_front_fn(cfg, camera, mesh)(jnp.asarray(img))
    assert tri_s.shape[0] == 124   # ceil(122 / 4) * 4, unpadded seg height
    from isaac_ros_apriltag_tpu.parallel.spatial import SpatialDetector

    det = SpatialDetector(cfg, camera, mesh).detect(jnp.asarray(img))
    ids = np.asarray(det.id)[np.asarray(det.valid)].tolist()
    assert ids == [9]


def test_spatial_detector_one_call(mesh, camera):
    """The user-facing sharded entry: SpatialDetector.detect(frame) on the
    8-band mesh equals the single-device Detector bit-exactly on a clean
    scene (both CCLs converge -> identical labels -> identical tail)."""
    from isaac_ros_apriltag_tpu import Detector
    from isaac_ros_apriltag_tpu.parallel.spatial import SpatialDetector

    cfg = DetectorConfig(tag_size=0.16, backend="xla")
    img = _scene(camera, 0.0)
    sd = SpatialDetector(cfg, camera, mesh)
    det_s, stats_s = sd.detect_with_stats(jnp.asarray(img))
    det_1, stats_1 = Detector(cfg, camera).detect_with_stats(
        img, encoding="mono8")
    np.testing.assert_array_equal(np.asarray(det_s.valid),
                                  np.asarray(det_1.valid))
    np.testing.assert_array_equal(np.asarray(det_s.id), np.asarray(det_1.id))
    np.testing.assert_array_equal(np.asarray(det_s.corners),
                                  np.asarray(det_1.corners))
    np.testing.assert_array_equal(np.asarray(det_s.translation),
                                  np.asarray(det_1.translation))
    assert int(stats_s.num_detections) == int(stats_1.num_detections) == 4


def test_spatial_detector_8mp(mesh):
    """The reference's motivating workload (README.md:24-26): one 8 MP frame
    split row-wise across the mesh, detected in one call."""
    from isaac_ros_apriltag_tpu.parallel.spatial import SpatialDetector
    from isaac_ros_apriltag_tpu.utils.render import project_corners

    W8, H8 = 3840, 2160
    cam8 = CameraModel.create(fx=1800.0, fy=1800.0, cx=W8 / 2, cy=H8 / 2,
                              width=W8, height=H8)
    fam = get_family("tag36h11")
    tags = []
    for i, (x, y) in enumerate([(-0.35, -0.1), (0.35, 0.12)]):
        t = np.array([x, y, 2.0])
        tags.append(dict(family=fam, id=2 * i + 1, R=upright_pose(t, 0.1 * i),
                         t=t, tag_size=0.3))
    img = render_tags(np.asarray(cam8.K), (H8, W8), tags)
    cfg = DetectorConfig(tag_size=0.3, backend="xla")
    det = SpatialDetector(cfg, cam8, mesh).detect(jnp.asarray(img))
    valid = np.asarray(det.valid)
    ids = sorted(np.asarray(det.id)[valid].tolist())
    assert ids == [1, 3]
    rows = {int(i): c for i, c in zip(np.asarray(det.id)[valid],
                                      np.asarray(det.corners)[valid])}
    for t in tags:
        want = project_corners(np.asarray(cam8.K), t["R"], t["t"],
                               t["tag_size"])
        err = np.linalg.norm(rows[t["id"]] - want, axis=-1).max()
        assert err < 0.6, (t["id"], err)
