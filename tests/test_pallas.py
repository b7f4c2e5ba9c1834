"""Differential tests: Pallas kernels (interpret mode) vs the XLA oracle.

This is the reference's cross-backend parity pattern (ref:
test/isaac_ros_apriltag_backends_compare_test.py:162-249) applied at the
kernel level: the Pallas TPU kernels must be BIT-exact against the pure
jax.numpy pipeline, not merely within tolerance.
"""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu import CameraModel, Detector, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.ops.pallas.threshold import adaptive_threshold_pallas
from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose
from tests.conftest import make_scene


@pytest.mark.parametrize("shape,ts", [((480, 640), 4), ((96, 128), 4),
                                      ((200, 256), 8), ((64, 128), 2)])
def test_threshold_parity_random(shape, ts):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    g = rng.uniform(0, 255, shape).astype(np.float32)
    g[10:40, 20:90] = 100.0  # flat low-contrast region
    a = np.asarray(adaptive_threshold(jnp.asarray(g), ts, 5))
    b = np.asarray(adaptive_threshold_pallas(jnp.asarray(g), ts, 5,
                                             interpret=True))
    np.testing.assert_array_equal(a, b)


def test_threshold_parity_scene():
    import jax.numpy as jnp

    fam = get_family("tag36h11")
    K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]])
    t = np.array([0.0, 0.05, 0.8])
    img = render_tags(K, (480, 640),
                      [dict(family=fam, id=3, R=upright_pose(t), t=t,
                            tag_size=0.16)], noise=3.0).astype(np.float32)
    a = np.asarray(adaptive_threshold(jnp.asarray(img), 4, 5))
    b = np.asarray(adaptive_threshold_pallas(jnp.asarray(img), 4, 5,
                                             interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape", [(96, 128)])
def test_ccl_parity(shape):
    """Pallas CCL rounds vs the XLA CCL: bit-identical labels at convergence
    (both converge to the component-min flat index). Random speckle at
    percolation density has snake components whose convergence depth grows
    with image size, so the adversarial case stays small; realistic content
    is covered by test_ccl_parity_noisy_scene at production round counts."""
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.ops.ccl import connected_components
    from isaac_ros_apriltag_tpu.ops.pallas.ccl import connected_components_pallas

    rng = np.random.default_rng(3)
    tri = rng.choice(np.array([0, 127, 255], np.uint8), size=shape,
                     p=[0.4, 0.2, 0.4])
    # add a large ring (the tag border topology that needs multiple rounds)
    tri[10:min(80, shape[0] - 4), 12:min(100, shape[1] - 4)] = 255
    tri[14:min(76, shape[0] - 8), 16:min(96, shape[1] - 8)] = 0
    tri[22:min(68, shape[0] - 16), 24:min(88, shape[1] - 16)] = 255
    # Random speckle has snake-like components needing many rounds; compare
    # at convergence (16 rounds), where both must be bit-identical.
    a = np.asarray(connected_components(jnp.asarray(tri), 16, 2))
    b = np.asarray(connected_components_pallas(jnp.asarray(tri), 16, 2,
                                               interpret=True))
    np.testing.assert_array_equal(a, b)


def test_ccl_parity_noisy_scene():
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.ops.ccl import connected_components
    from isaac_ros_apriltag_tpu.ops.pallas.ccl import connected_components_pallas
    from isaac_ros_apriltag_tpu.ops.threshold import adaptive_threshold

    fam = get_family("tag36h11")
    K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]])
    t = np.array([0.0, 0.05, 0.8])
    img = render_tags(K, (480, 640),
                      [dict(family=fam, id=3, R=upright_pose(t), t=t,
                            tag_size=0.16)], noise=2.0).astype(np.float32)
    tri = adaptive_threshold(jnp.asarray(img), 4, 5)
    a = np.asarray(connected_components(tri, 8, 2))
    b = np.asarray(connected_components_pallas(tri, 8, 2, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_detector_backend_parity():
    """End-to-end: 'interpret' backend detections == 'xla' backend detections
    (same count/id and bit-identical corners/poses), the reference's
    backends-compare contract at zero tolerance."""
    cam = CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    fam = get_family("tag36h11")
    t = np.array([-0.1, 0.05, 0.9])
    img = make_scene(cam, [dict(family=fam, id=21, R=upright_pose(t), t=t,
                                tag_size=0.16)])
    det_x = Detector(DetectorConfig(backend="xla", tag_size=0.16), cam)
    det_p = Detector(DetectorConfig(backend="interpret", tag_size=0.16), cam)
    rx = det_x.detect(img, encoding="mono8").to_list()
    rp = det_p.detect(img, encoding="mono8").to_list()
    assert len(rx) == len(rp) == 1
    assert rx[0]["id"] == rp[0]["id"] == 21
    np.testing.assert_array_equal(np.asarray(rx[0]["corners"]),
                                  np.asarray(rp[0]["corners"]))
    np.testing.assert_array_equal(np.asarray(rx[0]["translation"]),
                                  np.asarray(rp[0]["translation"]))
