"""End-to-end detector tests on synthetic scenes (small frames for CI speed).

Replicates the reference's integration-test structure: POL-style golden
assertions (pol_test.py), input-format coverage (mono8_test.py), and adds
rotation/pose-convention checks the reference lacks.
"""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu import CameraModel, Detector, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.utils.render import (project_corners, render_tags,
                                                 rotz, upright_pose)
from tests.conftest import make_scene

TAG_SIZE = 0.16


def small_config(**kw):
    kw.setdefault("tag_size", TAG_SIZE)
    kw.setdefault("backend", "xla")
    return DetectorConfig(**kw)


@pytest.fixture(scope="module")
def detector(small_camera_mod):
    return Detector(small_config(), small_camera_mod)


@pytest.fixture(scope="module")
def small_camera_mod():
    return CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                              width=640, height=480)


def corner_err(got, want):
    """Max corner distance under the best cyclic roll."""
    got = np.asarray(got)
    errs = [np.linalg.norm(np.roll(got, r, 0) - want, axis=-1).max()
            for r in range(4)]
    return min(errs)


def test_single_tag(detector, small_camera_mod):
    fam = get_family("tag36h11")
    t = np.array([0.05, -0.02, 0.8])
    R = upright_pose(t)
    img = make_scene(small_camera_mod,
                     [dict(family=fam, id=3, R=R, t=t, tag_size=TAG_SIZE)])
    det = detector.detect(img, encoding="mono8")
    rows = det.to_list()
    assert len(rows) == 1
    row = rows[0]
    assert row["id"] == 3
    assert row["hamming"] == 0
    gt = project_corners(np.asarray(small_camera_mod.K), R, t, TAG_SIZE)
    # exact corner order must match the convention (no roll allowed)
    err = np.linalg.norm(np.asarray(row["corners"]) - gt, axis=-1).max()
    assert err < 0.5, (row["corners"], gt)
    assert np.linalg.norm(np.asarray(row["translation"]) - t) < 0.01
    q = np.asarray(row["quaternion"])
    assert np.abs(q - np.array([0.0, 0.0, 0.0, 1.0])).max() < 0.01


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_inplane_rotations(detector, small_camera_mod, k):
    """Tag rotated by k*90deg in-plane: id must be stable and the pose
    quaternion must track the rotation (pins the corner-roll convention)."""
    fam = get_family("tag36h11")
    t = np.array([0.0, 0.0, 0.7])
    R = upright_pose(t, inplane=k * np.pi / 2)
    img = make_scene(small_camera_mod,
                     [dict(family=fam, id=11, R=R, t=t, tag_size=TAG_SIZE)])
    det = detector.detect(img, encoding="mono8")
    rows = det.to_list()
    assert len(rows) == 1, f"k={k}"
    assert rows[0]["id"] == 11
    R_est = np.asarray(det.rotation)[np.asarray(det.valid)][0]
    # rotation error angle
    dR = R_est.T @ R
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.02, f"k={k}: rotation error {ang}"
    assert np.linalg.norm(np.asarray(rows[0]["translation"]) - t) < 0.01


def test_multiple_tags(detector, small_camera_mod):
    fam = get_family("tag36h11")
    tags = []
    poses = {}
    for i, (tid, x, y) in enumerate([(5, -0.25, -0.15), (17, 0.25, -0.15),
                                     (42, -0.25, 0.18), (99, 0.25, 0.18)]):
        t = np.array([x, y, 1.1])
        R = upright_pose(t)
        tags.append(dict(family=fam, id=tid, R=R, t=t, tag_size=TAG_SIZE))
        poses[tid] = (R, t)
    img = make_scene(small_camera_mod, tags)
    det = detector.detect(img, encoding="mono8")
    rows = det.to_list()
    assert sorted(r["id"] for r in rows) == [5, 17, 42, 99]
    for r in rows:
        R, t = poses[r["id"]]
        gt = project_corners(np.asarray(small_camera_mod.K), R, t, TAG_SIZE)
        assert np.linalg.norm(np.asarray(r["corners"]) - gt, axis=-1).max() < 0.5
        assert np.linalg.norm(np.asarray(r["translation"]) - t) < 0.015


def test_rgb_encoding(detector, small_camera_mod):
    fam = get_family("tag36h11")
    t = np.array([0.0, 0.0, 0.8])
    R = upright_pose(t)
    mono = make_scene(small_camera_mod,
                      [dict(family=fam, id=7, R=R, t=t, tag_size=TAG_SIZE)])
    rgb = np.stack([mono] * 3, -1)
    det = detector.detect(rgb, encoding="rgb8")
    rows = det.to_list()
    assert len(rows) == 1 and rows[0]["id"] == 7


def test_empty_scene(detector, small_camera_mod):
    img = np.full((480, 640), 140, np.uint8)
    det = detector.detect(img, encoding="mono8")
    assert len(det.to_list()) == 0


def test_oblique_view(detector, small_camera_mod):
    """Out-of-plane rotated tag still detects with accurate corners."""
    fam = get_family("tag36h11")
    t = np.array([0.02, 0.01, 0.75])
    rx = 0.5  # ~29deg tilt
    Rx = np.array([[1, 0, 0],
                   [0, np.cos(rx), -np.sin(rx)],
                   [0, np.sin(rx), np.cos(rx)]])
    R = Rx @ upright_pose(t)
    img = make_scene(small_camera_mod,
                     [dict(family=fam, id=23, R=R, t=t, tag_size=TAG_SIZE)])
    det = detector.detect(img, encoding="mono8")
    rows = det.to_list()
    assert len(rows) == 1 and rows[0]["id"] == 23
    gt = project_corners(np.asarray(small_camera_mod.K), R, t, TAG_SIZE)
    assert np.linalg.norm(np.asarray(rows[0]["corners"]) - gt, axis=-1).max() < 0.7


@pytest.mark.parametrize("family_name", ["tag16h5", "tag25h9", "tag36h10",
                                         "tagStandard41h12", "tagCircle21h7",
                                         "tagCircle49h12", "tagCustom48h12",
                                         "tagStandard52h13"])
def test_other_families(small_camera_mod, family_name):
    fam = get_family(family_name)
    cfg = small_config(tag_family=family_name,
                       max_hamming=min(2, (fam.min_hamming - 1) // 2))
    det = Detector(cfg, small_camera_mod)
    t = np.array([0.0, 0.0, 0.7])
    R = upright_pose(t)
    tid = min(9, fam.ncodes - 1)
    img = make_scene(small_camera_mod,
                     [dict(family=fam, id=tid, R=R, t=t, tag_size=TAG_SIZE)])
    rows = det.detect(img, encoding="mono8").to_list()
    assert len(rows) == 1, family_name
    assert rows[0]["id"] == tid


def test_detect_checked_passes_invariants(small_camera_mod):
    """The checkify debug path (survey §5.2) validates output invariants
    (finite geometry, normalized quaternions, id range, count consistency)
    and returns the same detections as the plain path."""
    import numpy as np

    from isaac_ros_apriltag_tpu import Detector, DetectorConfig
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

    fam = get_family("tag36h11")
    t = np.array([0.0, 0.0, 1.1])
    img = render_tags(np.asarray(small_camera_mod.K),
                      (small_camera_mod.height, small_camera_mod.width),
                      [dict(family=fam, id=9, R=upright_pose(t), t=t,
                            tag_size=0.16)], noise=1.0)
    det = Detector(DetectorConfig(tag_size=0.16, backend="xla"), small_camera_mod)
    d1, s1 = det.detect_checked(img, encoding="mono8")
    d0, s0 = det.detect_with_stats(img, encoding="mono8")
    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d0.valid))
    np.testing.assert_array_equal(np.asarray(d1.id), np.asarray(d0.id))
    assert int(s1.num_detections) == 1
