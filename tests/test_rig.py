"""Multi-camera rig detection on the virtual CPU mesh (BASELINE config #5
substrate): cam-sharded results must equal the single-device detector's,
and throughput-constancy across mesh sizes is the scaling proxy this
environment allows (real ICI scaling needs real chips)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from isaac_ros_apriltag_tpu import CameraModel, DetectorConfig
from isaac_ros_apriltag_tpu.detector import build_detect_fn
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.parallel.rig import RigDetector
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

N_CAM = 8


@pytest.fixture(scope="module")
def camera():
    return CameraModel.create(fx=210.0, fy=210.0, cx=160.0, cy=120.0,
                              width=320, height=240)


@pytest.fixture(scope="module")
def rig_frames(camera):
    fam = get_family("tag36h11")
    frames = []
    for c in range(N_CAM):
        t = np.array([0.05 * (c % 3 - 1), 0.04 * (c // 3 - 1), 0.8])
        frames.append(render_tags(
            np.asarray(camera.K), (camera.height, camera.width),
            [dict(family=fam, id=5 * c + 2, R=upright_pose(t, 0.07 * c),
                  t=t, tag_size=0.16)], noise=1.0, seed=c))
    return np.stack(frames)


def test_rig_matches_single_device(camera, rig_frames):
    cfg = DetectorConfig(tag_size=0.16, backend="xla", max_tags=8,
                         max_clusters=16)
    mesh = Mesh(np.asarray(jax.devices()[:N_CAM]), ("cam",))
    rig = RigDetector(cfg, camera, n_cameras=N_CAM, mesh=mesh)
    det, stats = rig.detect(rig_frames)

    single = jax.jit(jax.vmap(build_detect_fn(cfg, camera, "mono8")))
    det1, stats1 = single(jnp.asarray(rig_frames))

    np.testing.assert_array_equal(np.asarray(det.valid), np.asarray(det1.valid))
    np.testing.assert_array_equal(np.asarray(det.id), np.asarray(det1.id))
    np.testing.assert_allclose(np.asarray(det.corners),
                               np.asarray(det1.corners), rtol=0, atol=1e-4)
    want = [5 * c + 2 for c in range(N_CAM)]
    got = [int(np.asarray(det.id)[c][np.asarray(det.valid)[c]][0])
           for c in range(N_CAM)]
    assert got == want


def test_rig_throughput_constancy(camera, rig_frames):
    """Scaling proxy on the virtual mesh: per-camera wall time must not blow
    up as cameras spread over more (virtual) devices. This checks the
    program PARTITIONS (no accidental replication of per-camera work);
    absolute speedups need real chips."""
    cfg = DetectorConfig(tag_size=0.16, backend="xla", max_tags=8,
                         max_clusters=16)
    times = {}
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("cam",))
        rig = RigDetector(cfg, camera, n_cameras=N_CAM, mesh=mesh)
        det, _ = rig.detect(rig_frames)       # compile + warm
        jax.block_until_ready(det.valid)
        t0 = time.perf_counter()
        for _ in range(3):
            det, _ = rig.detect(rig_frames)
            np.asarray(det.valid)
        times[n_dev] = (time.perf_counter() - t0) / 3
    # virtual CPU devices share the same cores, so times should be roughly
    # flat; a partitioning bug (replicated work) would scale ~linearly.
    assert times[8] < times[1] * 3.0, times
