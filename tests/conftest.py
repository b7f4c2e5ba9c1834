"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

The reference tests hardware variants via runtime platform sniffing
(ref: test/isaac_ros_apriltag_mono8_test.py:36-38); here the multi-device
story is testable anywhere via XLA's forced host device count (survey §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pre-import jax and force a hardware platform before
# conftest runs (site customization); the env var above is then too late.
# Updating the config post-import keeps the whole suite on the virtual
# 8-device CPU mesh and guarantees the hardware backend is never initialized
# from test processes (initializing it can block on an exclusive device grant
# held by another process).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compile cache: the detector graph takes minutes to compile on
# CPU; cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def golden_scene():
    """Synthesized golden fixture (see utils/render.py docstring)."""
    from isaac_ros_apriltag_tpu.models.families import get_family
    from isaac_ros_apriltag_tpu.utils.render import GOLDEN, render_tags, upright_pose

    fam = get_family(GOLDEN["family"])
    R = upright_pose(GOLDEN["translation"])
    img = render_tags(GOLDEN["K"], GOLDEN["size"],
                      [dict(family=fam, id=GOLDEN["id"], R=R,
                            t=GOLDEN["translation"], tag_size=GOLDEN["tag_size"])])
    return img


@pytest.fixture(scope="session")
def small_camera():
    from isaac_ros_apriltag_tpu.camera.model import CameraModel

    return CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                              width=640, height=480)


def make_scene(camera, tags, **kw):
    """Render tags onto a camera-sized grayscale image."""
    from isaac_ros_apriltag_tpu.utils.render import render_tags

    K = np.asarray(camera.K)
    return render_tags(K, (camera.height, camera.width), tags, **kw)
