"""Timestamp alignment (message_filters analog) + TF frame-id naming."""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu.sync import TimestampAligner
from isaac_ros_apriltag_tpu.types import Detections


def f(v):
    return np.full((4, 4), v, np.uint8)


def test_exact_time_pairs_in_lockstep():
    al = TimestampAligner(n_cameras=3, tolerance=0.0)
    assert al.push(0, 1.0, f(0)) is None
    assert al.push(1, 1.0, f(1)) is None
    stamps, frames = al.push(2, 1.0, f(2))
    np.testing.assert_array_equal(stamps, [1.0, 1.0, 1.0])
    assert [int(x[0, 0]) for x in frames] == [0, 1, 2]
    # queues drained: next frame alone does not match
    assert al.push(0, 2.0, f(3)) is None


def test_exact_time_rejects_mismatched_stamps():
    al = TimestampAligner(n_cameras=2, tolerance=0.0)
    al.push(0, 1.0, f(0))
    assert al.push(1, 1.01, f(1)) is None


def test_approximate_time_matches_within_tolerance():
    al = TimestampAligner(n_cameras=2, tolerance=0.02)
    al.push(0, 1.000, f(0))
    stamps, frames = al.push(1, 1.012, f(1))
    assert abs(stamps[0] - stamps[1]) <= 0.02


def test_stale_frames_age_out():
    al = TimestampAligner(n_cameras=2, tolerance=0.0, queue_size=3)
    for k in range(5):                       # camera 0 runs ahead
        al.push(0, float(k), f(k))
    # only the last 3 stamps survive in cam 0's queue
    assert al.push(1, 1.0, f(9)) is None     # stamp 1.0 already evicted
    out = al.push(1, 4.0, f(10))
    assert out is not None


def test_invalid_config_raises():
    with pytest.raises(ValueError):
        TimestampAligner(n_cameras=0)
    al = TimestampAligner(n_cameras=2)
    with pytest.raises(ValueError):
        al.push(5, 0.0, f(0))


def test_frame_ids_reference_convention():
    import jax.numpy as jnp

    d = Detections.empty(4)
    d = Detections(
        valid=d.valid.at[0].set(True).at[2].set(True),
        id=d.id.at[0].set(7).at[2].set(42),
        hamming=d.hamming, decision_margin=d.decision_margin,
        center=d.center, corners=d.corners, translation=d.translation,
        quaternion=d.quaternion, rotation=d.rotation)
    # ref: apriltag_node.cpp:353-356 child frame "<family>:<id>"
    assert d.frame_ids("tag36h11") == ["tag36h11:7", "tag36h11:42"]
