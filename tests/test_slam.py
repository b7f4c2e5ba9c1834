"""SLAM layer tests: BA convergence, distributed-BA parity, pose graph, ATE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_apriltag_tpu.parallel.slam import ba, dba, posegraph
from isaac_ros_apriltag_tpu.parallel.slam.map import ate_rmse
from isaac_ros_apriltag_tpu.ops.pose import TAG_CORNERS
from isaac_ros_apriltag_tpu.utils.render import upright_pose

K = np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]], np.float32)
TAG_SIZE = 0.16


def make_problem(n_kf=6, n_lm=8, noise_px=0.0, state_noise=0.0, seed=0):
    """Synthetic scene: tags on the z=2 wall, camera sliding along x."""
    rng = np.random.default_rng(seed)
    lm_R, lm_t = [], []
    for l in range(n_lm):
        t = np.array([0.5 * (l % 4) - 0.75, 0.6 * (l // 4) - 0.3, 2.0])
        lm_R.append(upright_pose(t))
        lm_t.append(t)
    kf_R, kf_t = [], []
    for k in range(n_kf):
        kf_R.append(np.eye(3))
        kf_t.append(np.array([0.15 * k - 0.4, 0.05 * np.sin(k), 0.0]))

    obs_kf, obs_lm, obs_uv = [], [], []
    corners_tag = np.concatenate([TAG_CORNERS * TAG_SIZE / 2, np.zeros((4, 1))], -1)
    for k in range(n_kf):
        for l in range(n_lm):
            p_w = corners_tag @ lm_R[l].T + lm_t[l]
            p_c = (p_w - kf_t[k]) @ kf_R[k]
            uv = np.stack([K[0, 0] * p_c[:, 0] / p_c[:, 2] + K[0, 2],
                           K[1, 1] * p_c[:, 1] / p_c[:, 2] + K[1, 2]], -1)
            if (uv < 0).any() or (uv[:, 0] > 640).any() or (uv[:, 1] > 480).any():
                continue
            obs_kf.append(k)
            obs_lm.append(l)
            obs_uv.append(uv + rng.normal(0, noise_px, uv.shape))

    gt = dict(kf_t=np.stack(kf_t), lm_t=np.stack(lm_t))

    def perturb_R(R):
        w = rng.normal(0, state_noise, 3)
        from isaac_ros_apriltag_tpu.utils.geometry import se3_exp
        dR, _ = se3_exp(jnp.asarray(np.concatenate([w, np.zeros(3)])))
        return R @ np.asarray(dR)

    p = ba.BAProblem(
        cam_R=jnp.asarray(np.stack([perturb_R(R) for R in kf_R]).astype(np.float32)),
        cam_t=jnp.asarray((np.stack(kf_t)
                           + rng.normal(0, state_noise, (n_kf, 3))).astype(np.float32)),
        lm_R=jnp.asarray(np.stack([perturb_R(R) for R in lm_R]).astype(np.float32)),
        lm_t=jnp.asarray((np.stack(lm_t)
                          + rng.normal(0, state_noise, (n_lm, 3))).astype(np.float32)),
        obs_kf=jnp.asarray(np.array(obs_kf, np.int32)),
        obs_lm=jnp.asarray(np.array(obs_lm, np.int32)),
        obs_uv=jnp.asarray(np.stack(obs_uv).astype(np.float32)),
        obs_valid=jnp.ones(len(obs_kf), bool),
        K=jnp.asarray(K),
        tag_size=jnp.float32(TAG_SIZE),
    )
    return p, gt


def test_ba_converges():
    p, gt = make_problem(state_noise=0.03)
    solved, rms = jax.jit(lambda q: ba.solve(q, iters=8))(p)
    rms = np.asarray(rms)
    assert rms[-1] < 1e-2, rms
    # first camera pinned at origin -> trajectory comparable directly
    assert ate_rmse(np.asarray(solved.cam_t), gt["kf_t"]) < 1e-3


def test_ba_noise_robust():
    p, gt = make_problem(noise_px=0.3, state_noise=0.02, seed=3)
    solved, rms = jax.jit(lambda q: ba.solve(q, iters=8))(p)
    assert np.asarray(rms)[-1] < 0.5  # converges to ~ observation noise
    # noise floor: 0.3 px at fx=420, depth 2 m, ~40 obs -> a few mm ATE
    assert ate_rmse(np.asarray(solved.cam_t), gt["kf_t"]) < 8e-3


def test_distributed_ba_matches_single():
    mesh = jax.make_mesh((1, 4), ("cam", "map"))
    p, gt = make_problem(state_noise=0.02, seed=1)
    pp = dba.partition_problem(p, 4)
    solver = dba.make_distributed_solver(mesh, iters=6)
    shardings = dba.problem_shardings(mesh)
    pp = jax.device_put(pp, shardings)
    solved_d, rms_d = solver(pp)

    solved_s, rms_s = jax.jit(lambda q: ba.solve(q, iters=6))(p)
    # same converged camera trajectory
    np.testing.assert_allclose(np.asarray(solved_d.cam_t),
                               np.asarray(solved_s.cam_t), atol=1e-3)
    assert np.asarray(rms_d)[-1] < 1e-2


def test_posegraph_loop_closure():
    rng = np.random.default_rng(0)
    n = 12
    # ground truth: poses around a circle
    R_gt, t_gt = [], []
    for i in range(n):
        th = 2 * np.pi * i / n
        R_gt.append(np.array([[np.cos(th), -np.sin(th), 0],
                              [np.sin(th), np.cos(th), 0], [0, 0, 1]]))
        t_gt.append(np.array([np.cos(th), np.sin(th), 0.0]))
    edges_i, edges_j, eR, et = [], [], [], []
    for i in range(n):
        j = (i + 1) % n
        edges_i.append(i)
        edges_j.append(j)
        eR.append(R_gt[i].T @ R_gt[j])
        et.append(R_gt[i].T @ (t_gt[j] - t_gt[i]))
    # noisy initialization
    init_t = np.stack(t_gt) + rng.normal(0, 0.05, (n, 3))
    init_t[0] = t_gt[0]
    g = posegraph.PoseGraph(
        R=jnp.asarray(np.stack(R_gt).astype(np.float32)),
        t=jnp.asarray(init_t.astype(np.float32)),
        edge_i=jnp.asarray(np.array(edges_i, np.int32)),
        edge_j=jnp.asarray(np.array(edges_j, np.int32)),
        edge_R=jnp.asarray(np.stack(eR).astype(np.float32)),
        edge_t=jnp.asarray(np.stack(et).astype(np.float32)),
        edge_valid=jnp.ones(n, bool),
    )
    solved, rms = jax.jit(lambda q: posegraph.solve(q, iters=10))(g)
    assert np.asarray(rms)[-1] < 1e-3
    assert np.abs(np.asarray(solved.t) - np.stack(t_gt)).max() < 1e-2


def test_ate_alignment_invariance():
    rng = np.random.default_rng(5)
    traj = rng.normal(size=(20, 3))
    from isaac_ros_apriltag_tpu.utils.geometry import rotmat_from_quat
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(rotmat_from_quat(jnp.asarray(q)))
    moved = traj @ R.T + np.array([1.0, -2.0, 0.5])
    assert ate_rmse(moved, traj) < 1e-6
