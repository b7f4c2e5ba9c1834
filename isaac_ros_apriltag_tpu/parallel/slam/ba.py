"""Tag-map bundle adjustment: batched Gauss-Newton with Schur elimination.

No reference analog (the reference is a stateless per-frame detector); this
implements the BASELINE.json north-star SLAM layer. Problem structure:

  states:  keyframe camera poses T_w_cam (K of them), tag landmark poses
           T_w_tag (L of them), both as (R, t); increments in se(3).
  factors: one observation = all 4 corners of one tag seen from one keyframe;
           residual = reprojection error (8-dim) using the detector's corner
           convention (ops/pose.TAG_CORNERS).

The normal equations are bipartite: H = [[Hcc, W], [W^T, Hll]] with
block-diagonal Hcc (6x6 per keyframe) and Hll (6x6 per landmark). Landmarks
are eliminated by the Schur complement S = Hcc - W Hll^-1 W^T; S is small
(6K x 6K) and dense-solved; landmark updates back-substitute.

Everything is fixed-shape: observations are a capacity-O arrays with a valid
mask; Jacobians come from vmapped jax.jacfwd of the per-observation residual
(exact, no finite differences). The landmark axis is the sharding axis for
the distributed version (see dba.py): each shard computes its additive
contribution to S and g_c, reduced with psum over the 'map' mesh axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.pose import TAG_CORNERS
from ...utils.geometry import se3_exp


class BAProblem(NamedTuple):
    # states
    cam_R: jax.Array      # (K, 3, 3) R_world_cam
    cam_t: jax.Array      # (K, 3)
    lm_R: jax.Array       # (L, 3, 3) R_world_tag
    lm_t: jax.Array       # (L, 3)
    # observations (fixed capacity O)
    obs_kf: jax.Array     # (O,) int32 keyframe index
    obs_lm: jax.Array     # (O,) int32 landmark index
    obs_uv: jax.Array     # (O, 4, 2) float32 observed corners (pixels)
    obs_valid: jax.Array  # (O,) bool
    # calibration
    K: jax.Array          # (3, 3) intrinsics
    tag_size: jax.Array   # () float32


def _project(K, pts_cam):
    z = jnp.maximum(pts_cam[..., 2:3], 1e-6)
    uv = pts_cam[..., :2] / z
    return jnp.stack([K[0, 0] * uv[..., 0] + K[0, 2],
                      K[1, 1] * uv[..., 1] + K[1, 2]], -1)


def _obs_residual(cam_inc, lm_inc, cam_R, cam_t, lm_R, lm_t, uv, K, tag_size):
    """8-dim reprojection residual for one observation, as a function of the
    se(3) increments (linearization point at zero)."""
    dRc, dtc = se3_exp(cam_inc)
    dRl, dtl = se3_exp(lm_inc)
    Rc = cam_R @ dRc
    tc = cam_t + cam_R @ dtc
    Rl = lm_R @ dRl
    tl = lm_t + lm_R @ dtl
    corners_tag = jnp.concatenate(
        [jnp.asarray(TAG_CORNERS) * tag_size * 0.5, jnp.zeros((4, 1))], -1)
    p_w = corners_tag @ Rl.T + tl                      # (4, 3)
    p_c = (p_w - tc) @ Rc                              # R_c^T (p - t): (4, 3)
    return (_project(K, p_c) - uv).reshape(8)


def _linearize(p: BAProblem):
    """Per-observation residuals + Jacobians at the current linearization
    point. Returns r (O, 8), Jc (O, 8, 6), Jl (O, 8, 6), masked."""
    cam_R = p.cam_R[p.obs_kf]
    cam_t = p.cam_t[p.obs_kf]
    lm_R = p.lm_R[p.obs_lm]
    lm_t = p.lm_t[p.obs_lm]

    def rfun(ci, li, CR, Ct, LR, Lt, uv):
        return _obs_residual(ci, li, CR, Ct, LR, Lt, uv, p.K, p.tag_size)

    z6 = jnp.zeros(6)
    r = jax.vmap(lambda CR, Ct, LR, Lt, uv: rfun(z6, z6, CR, Ct, LR, Lt, uv))(
        cam_R, cam_t, lm_R, lm_t, p.obs_uv)
    Jc = jax.vmap(lambda CR, Ct, LR, Lt, uv: jax.jacfwd(rfun, 0)(
        z6, z6, CR, Ct, LR, Lt, uv))(cam_R, cam_t, lm_R, lm_t, p.obs_uv)
    Jl = jax.vmap(lambda CR, Ct, LR, Lt, uv: jax.jacfwd(rfun, 1)(
        z6, z6, CR, Ct, LR, Lt, uv))(cam_R, cam_t, lm_R, lm_t, p.obs_uv)
    m = p.obs_valid.astype(r.dtype)
    return r * m[:, None], Jc * m[:, None, None], Jl * m[:, None, None]


def _schur_terms(p: BAProblem, r, Jc, Jl, damping):
    """Assemble Hcc, gc, Hll, gl, W (dense over (K, L) blocks)."""
    Kn = p.cam_R.shape[0]
    Ln = p.lm_R.shape[0]
    Hcc = jnp.zeros((Kn, 6, 6)).at[p.obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jc, Jc))
    gc = jnp.zeros((Kn, 6)).at[p.obs_kf].add(jnp.einsum("oij,oi->oj", Jc, r))
    Hll = jnp.zeros((Ln, 6, 6)).at[p.obs_lm].add(
        jnp.einsum("oij,oik->ojk", Jl, Jl))
    gl = jnp.zeros((Ln, 6)).at[p.obs_lm].add(jnp.einsum("oij,oi->oj", Jl, r))
    Wkl = jnp.zeros((Kn, Ln, 6, 6)).at[p.obs_kf, p.obs_lm].add(
        jnp.einsum("oij,oik->ojk", Jc, Jl))
    eye = jnp.eye(6)
    Hcc = Hcc + damping * eye
    Hll = Hll + damping * eye
    return Hcc, gc, Hll, gl, Wkl


def gauss_newton_step(p: BAProblem, damping: float = 1e-4,
                      fix_first_cam: bool = True
                      ) -> tuple[BAProblem, jax.Array]:
    """One damped GN step with Schur elimination. Returns (new, rms_error)."""
    r, Jc, Jl = _linearize(p)
    Hcc, gc, Hll, gl, Wkl = _schur_terms(p, r, Jc, Jl, damping)
    Kn, Ln = Hcc.shape[0], Hll.shape[0]

    Hll_inv = jnp.linalg.inv(Hll)                        # (L, 6, 6)
    # S = Hcc - W Hll^-1 W^T  (dense 6K x 6K; Hcc is block diagonal)
    WHinv = jnp.einsum("klij,ljm->klim", Wkl, Hll_inv)   # (K, L, 6, 6)
    S_off = jnp.einsum("klim,nljm->kinj", WHinv, Wkl)    # (K, 6, K, 6)
    S = -S_off
    S = S.at[jnp.arange(Kn), :, jnp.arange(Kn), :].add(Hcc)
    b = gc - jnp.einsum("klim,lm->ki", WHinv, gl)        # (K, 6)

    if fix_first_cam:
        # Gauge freedom: pin keyframe 0 by a strong prior.
        S = S.at[0, :, 0, :].add(1e8 * jnp.eye(6))

    Sd = S.reshape(Kn * 6, Kn * 6)
    dx_c = jnp.linalg.solve(Sd, -b.reshape(Kn * 6)).reshape(Kn, 6)
    # back-substitute landmarks: Hll dx_l = -gl - W^T dx_c
    rhs = -gl - jnp.einsum("klij,ki->lj", Wkl, dx_c)
    dx_l = jnp.einsum("lij,lj->li", Hll_inv, rhs)

    dRc, dtc = se3_exp(dx_c)
    dRl, dtl = se3_exp(dx_l)
    new = p._replace(
        cam_R=jnp.einsum("kij,kjm->kim", p.cam_R, dRc),
        cam_t=p.cam_t + jnp.einsum("kij,kj->ki", p.cam_R, dtc),
        lm_R=jnp.einsum("lij,ljm->lim", p.lm_R, dRl),
        lm_t=p.lm_t + jnp.einsum("lij,lj->li", p.lm_R, dtl),
    )
    nobs = jnp.maximum(jnp.sum(p.obs_valid), 1)
    rms = jnp.sqrt(jnp.sum(r * r) / (8.0 * nobs))
    return new, rms


def solve(p: BAProblem, iters: int = 10, damping: float = 1e-4) -> tuple[BAProblem, jax.Array]:
    """Run `iters` GN steps (static unroll via scan)."""
    def body(carry, _):
        prob = carry
        prob, rms = gauss_newton_step(prob, damping)
        return prob, rms

    p, rms_hist = jax.lax.scan(body, p, None, length=iters)
    return p, rms_hist
