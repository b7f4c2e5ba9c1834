"""SLAM end-to-end: rendered trajectory -> Detector -> TagMapper ->
(distributed) BA -> ATE, plus map checkpoint/resume and a >=1000-landmark
sparse-BA scale check (BASELINE configs #4/#5; survey §7.2 step 7, §5.4)."""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu import CameraModel, Detector, DetectorConfig
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.parallel.slam import ba
from isaac_ros_apriltag_tpu.parallel.slam.map import TagMapper, ate_rmse
from isaac_ros_apriltag_tpu.utils.render import render_tags, rotz

TAG_SIZE = 0.16
N_TAGS = 6
N_FRAMES = 6


def wall_tags():
    return [(i * 3 + 1, np.array([(i % 3 - 1) * 0.5, (i // 3 - 0.5) * 0.5, 0.0]))
            for i in range(N_TAGS)]


def gt_camera(k):
    """World-frame camera center + rotation for frame k of the orbit."""
    ang = 0.3 * np.sin(2 * np.pi * k / N_FRAMES)
    c = np.array([1.0 * np.sin(ang), 0.12 * np.sin(2 * ang),
                  -2.0 - 0.25 * np.cos(ang)])
    return rotz(0.04 * np.sin(ang)), c


def render_frame(camera, k, noise=0.5):
    fam = get_family("tag36h11")
    R_wc, c = gt_camera(k)
    tags = []
    for tid, p in wall_tags():
        R_ct = R_wc.T @ np.eye(3) @ np.diag([-1.0, -1.0, 1.0])
        t_ct = R_wc.T @ (p - c)
        tags.append(dict(family=fam, id=tid, R=R_ct, t=t_ct, tag_size=TAG_SIZE))
    return render_tags(np.asarray(camera.K), (camera.height, camera.width),
                       tags, noise=noise, seed=k)


@pytest.fixture(scope="module")
def camera():
    return CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                              width=640, height=480)


@pytest.fixture(scope="module")
def mapped(camera):
    det = Detector(DetectorConfig(tag_size=TAG_SIZE, backend="xla"), camera)
    mapper = TagMapper(K=np.asarray(camera.K), tag_size=TAG_SIZE)
    for k in range(N_FRAMES):
        mapper.process_frame(det.detect(render_frame(camera, k),
                                        encoding="mono8"))
    return mapper


def test_trajectory_ate(mapped):
    p = mapped.build_problem()
    p, rms = ba.solve(p, iters=8)
    mapped.update_from_problem(p)
    est = np.stack(mapped.kf_t)
    gt = np.stack([gt_camera(k)[1] for k in range(N_FRAMES)])
    ate = ate_rmse(est, gt)
    assert len(mapped.lm_ids) == N_TAGS
    assert float(np.asarray(rms)[-1]) < 1.0, "BA should reach subpixel rms"
    assert ate < 0.02, f"ATE {ate:.4f} m"


def test_checkpoint_roundtrip(mapped, tmp_path, camera):
    path = str(tmp_path / "map.npz")
    mapped.save(path)
    fresh = TagMapper(K=np.zeros((3, 3)), tag_size=0.0)
    fresh.load(path)
    assert fresh.lm_ids == mapped.lm_ids
    assert fresh.tag_size == mapped.tag_size
    np.testing.assert_array_equal(np.stack(fresh.kf_t), np.stack(mapped.kf_t))
    p0 = mapped.build_problem()
    p1 = fresh.build_problem()
    np.testing.assert_array_equal(np.asarray(p0.obs_uv), np.asarray(p1.obs_uv))
    np.testing.assert_array_equal(np.asarray(p0.obs_kf), np.asarray(p1.obs_kf))

    # resumed mapper keeps accumulating
    det = Detector(DetectorConfig(tag_size=TAG_SIZE, backend="xla"), camera)
    k = fresh.process_frame(det.detect(render_frame(camera, 0),
                                       encoding="mono8"))
    assert k == N_FRAMES
    assert len(fresh.obs) > len(mapped.obs)


def test_sparse_ba_1000_landmarks():
    """The 10k-tag north star is representable now that BA never builds a
    (K, L, 6, 6) coupling table; exercise K=16, L=1200, O=4800."""
    rng = np.random.default_rng(3)
    Kn, Ln, On = 16, 1200, 4800
    fx = 420.0
    K = np.array([[fx, 0, 320], [0, fx, 240], [0, 0, 1]], np.float32)

    # ground truth: cameras along a line, landmarks in a slab in front
    cam_t_gt = np.stack([np.array([0.1 * k, 0.0, 0.0]) for k in range(Kn)])
    lm_t_gt = rng.uniform([-3, -2, 2.0], [3 + 1.6, 2, 4.0], (Ln, 3))
    lm_R_gt = np.broadcast_to(np.diag([-1.0, -1.0, 1.0]), (Ln, 3, 3))

    from isaac_ros_apriltag_tpu.ops.pose import TAG_CORNERS
    obs_kf = rng.integers(0, Kn, On).astype(np.int32)
    obs_lm = rng.integers(0, Ln, On).astype(np.int32)
    corners_tag = np.concatenate([np.asarray(TAG_CORNERS) * 0.08,
                                  np.zeros((4, 1))], -1)
    p_w = corners_tag @ np.swapaxes(lm_R_gt[obs_lm], 1, 2) + lm_t_gt[obs_lm][:, None]
    p_c = p_w - cam_t_gt[obs_kf][:, None]
    uv = np.stack([fx * p_c[..., 0] / p_c[..., 2] + 320,
                   fx * p_c[..., 1] / p_c[..., 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)

    import jax.numpy as jnp
    p = ba.BAProblem(
        cam_R=jnp.broadcast_to(jnp.eye(3), (Kn, 3, 3)).astype(jnp.float32),
        cam_t=jnp.asarray(cam_t_gt + rng.normal(0, 0.05, (Kn, 3)), jnp.float32),
        lm_R=jnp.asarray(lm_R_gt, jnp.float32),
        lm_t=jnp.asarray(lm_t_gt + rng.normal(0, 0.05, (Ln, 3)), jnp.float32),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(uv), obs_valid=jnp.ones(On, bool),
        K=jnp.asarray(K), tag_size=jnp.float32(0.16))
    p2, rms = ba.solve(p, iters=5)
    r = np.asarray(rms)
    assert r[-1] < 0.5, f"rms history {r}"
    assert r[-1] < r[0] * 0.2, f"rms should drop: {r}"
