"""Unit tests for batched geometry primitives."""

import jax.numpy as jnp
import numpy as np

from isaac_ros_apriltag_tpu.utils import geometry as G


def _random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_rotmat_roundtrip():
    q = _random_rotations(64)
    # canonical sign: largest-|component| positive (library convention)
    lead = np.take_along_axis(q, np.argmax(np.abs(q), -1)[:, None], -1)
    q *= np.where(lead < 0, -1.0, 1.0)
    R = G.rotmat_from_quat(jnp.asarray(q))
    q2 = G.quat_from_rotmat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_quat_golden_convention():
    # diag(-1,-1,1) is a 180deg rotation about z: q = (0, 0, 0, 1)
    R = jnp.asarray(np.diag([-1.0, -1.0, 1.0]))
    q = np.asarray(G.quat_from_rotmat(R))
    np.testing.assert_allclose(q, [0.0, 0.0, 0.0, 1.0], atol=1e-6)


def test_homography_exact():
    rng = np.random.default_rng(1)
    src = rng.uniform(-1, 1, (8, 4, 2)).astype(np.float32)
    # well-conditioned targets: random affine + mild projective
    dst = src * rng.uniform(50, 80) + rng.uniform(100, 200, (8, 1, 2))
    H = G.homography_from_correspondences(jnp.asarray(src), jnp.asarray(dst.astype(np.float32)))
    out = G.apply_homography(H, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(out), dst, atol=1e-2)


def test_line_intersection():
    p = G.line_intersection(jnp.array([0.0, 0.0]), jnp.array([1.0, 1.0]),
                            jnp.array([2.0, 0.0]), jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), [2.0, 2.0], atol=1e-6)


def test_orthonormalize():
    rng = np.random.default_rng(2)
    R = np.asarray(G.rotmat_from_quat(jnp.asarray(_random_rotations(16))))
    noisy = R + rng.normal(scale=1e-3, size=R.shape)
    R2 = np.asarray(G.orthonormalize_rotation(jnp.asarray(noisy)))
    err = np.einsum("nij,nkj->nik", R2, R2) - np.eye(3)
    assert np.abs(err).max() < 1e-5
    assert np.allclose(np.linalg.det(R2), 1.0, atol=1e-5)
    assert np.abs(R2 - R).max() < 5e-3


def test_se3_exp():
    R, t = G.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-7)
    tau = jnp.array([0.0, 0.0, np.pi, 1.0, 0.0, 0.0])
    R, t = G.se3_exp(tau)
    np.testing.assert_allclose(np.asarray(R), np.diag([-1.0, -1.0, 1.0]), atol=1e-6)
