"""Overlay-rendering tests (the rviz-display analog, survey §1 L6)."""

import numpy as np

from isaac_ros_apriltag_tpu.types import Detections
from isaac_ros_apriltag_tpu.utils.viz import draw_detections


def _one_detection():
    import jax.numpy as jnp

    d = Detections.empty(4)
    return Detections(
        valid=d.valid.at[0].set(True),
        id=d.id.at[0].set(7),
        hamming=d.hamming,
        decision_margin=d.decision_margin,
        center=d.center.at[0].set(jnp.array([32.0, 24.0])),
        corners=d.corners.at[0].set(jnp.array(
            [[44.0, 36.0], [20.0, 36.0], [20.0, 12.0], [44.0, 12.0]])),
        translation=d.translation.at[0].set(jnp.array([0.0, 0.0, 1.0])),
        quaternion=d.quaternion.at[0].set(jnp.array([0.0, 0.0, 0.0, 1.0])),
        rotation=d.rotation.at[0].set(jnp.asarray(np.diag([-1.0, -1.0, 1.0]))),
    )


def test_draw_on_grayscale_promotes_rgb_and_marks_pixels():
    img = np.full((48, 64), 100, np.uint8)
    det = _one_detection()
    out = draw_detections(img, det)
    assert out.shape == (48, 64, 3)
    assert out.dtype == img.dtype
    assert (out != 100).any(), "overlay drew nothing"
    # input untouched; corner pixels got the edge colors
    assert (img == 100).all()
    assert (out[36, 30] != (100, 100, 100)).any(), "edge pixel not drawn"


def test_draw_with_axes_and_empty():
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    det = _one_detection()
    out = draw_detections(np.zeros((48, 64, 3), np.uint8), det, K=K,
                          tag_size=0.2)
    assert (out != 0).any()
    from isaac_ros_apriltag_tpu.types import Detections as D

    empty = D.empty(4)
    out2 = draw_detections(np.zeros((48, 64), np.uint8), empty)
    assert (out2 == 0).all(), "empty detections must draw nothing"
