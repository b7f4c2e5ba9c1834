"""Golden-fixture proof-of-life test at full 1080p.

Port of the reference's POL integration test with its exact numerical
contract (ref: test/isaac_ros_apriltag_pol_test.py:116-175; tolerances
:125-128: center/corners +-2 px, translation +-0.01 m, quaternion +-0.01).
The LFS fixture image content is absent from the reference checkout, so the
scene is re-synthesized at the golden pose (see utils/render.py docstring).
"""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu import CameraModel, Detector, DetectorConfig
from isaac_ros_apriltag_tpu.utils.render import GOLDEN


@pytest.mark.slow
def test_golden_pol(golden_scene):
    g = GOLDEN
    cam = CameraModel.create(fx=g["K"][0, 0], fy=g["K"][1, 1],
                             cx=g["K"][0, 2], cy=g["K"][1, 2],
                             width=1920, height=1080)
    # Reference node defaults: size=0.22, max_tags=64, tag36h11
    # (apriltag_node.cpp:564-567).
    det = Detector(DetectorConfig(backend="xla", tag_size=g["tag_size"]), cam)
    rows = det.detect(golden_scene, encoding="mono8").to_list()
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == 0
    assert r["hamming"] == 0
    center = np.asarray(r["center"])
    assert np.abs(center - g["center"]).max() < 2.0
    corners = np.asarray(r["corners"])
    assert np.abs(corners - g["corners"]).max() < 2.0
    assert np.abs(np.asarray(r["translation"]) - g["translation"]).max() < 0.01
    assert np.abs(np.asarray(r["quaternion"]) - g["quaternion_wxyz"]).max() < 0.01
