"""Quad fitting: boundary clusters -> candidate quads (4 subpixel corners).

Dense re-formulation of AprilTag 3's fit_quad for the TPU: every step is a
fixed-shape vectorized op, batched over clusters with vmap.

  1. sort points by angle around the centroid (batched argsort);
  2. circular prefix sums of the moments (x, y, xx, xy, yy) give O(1)
     line fits over any arc;
  3. per-point line-fit error over a sliding window; smooth; local maxima
     are corner candidates;
  4. exhaustive search over 4-subsets of the top-M candidates (cyclic order),
     scoring each by total line-fit error of the 4 induced arcs — all
     C(M, 4) combos evaluated densely in parallel;
  5. winning arcs re-fit -> 4 lines -> corner positions from intersections;
  6. geometric gates: arc MSE, corner angles, area, winding normalization.

The winding/gradient polarity of the quad (dark interior vs light interior)
is returned so the detector can gate on the family's reversed_border flag.
"""

from __future__ import annotations

import functools
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .clusters import Clusters

_MAXIMA = 10
# All 4-subsets of the top-M maxima in cyclic (ascending angular) order.
_COMBOS = np.array(list(itertools.combinations(range(_MAXIMA), 4)), np.int32)


class Quads(NamedTuple):
    corners: jax.Array    # (C, 4, 2) float32 — pixel coords, cyclic order
    valid: jax.Array      # (C,) bool
    dark_inside: jax.Array  # (C,) bool — True if quad interior is dark
    fit_err: jax.Array    # (C,) float32 — total arc MSE of winning combo
    gates: jax.Array      # (C, 6) bool — [combo, mse, area, angle, finite, n>=8]


def _window_sum(S: jax.Array, a: jax.Array, b: jax.Array, n: jax.Array) -> jax.Array:
    """Sum of f over circular index range [a, b] inclusive, given prefix sums
    S (P+1,) of f over the sorted (valid-first) points. Requires 0 <= a < n,
    a <= b < a + n; b may exceed n (wraps)."""
    wrap = b >= n
    direct = S[jnp.clip(b + 1, 0, S.shape[0] - 1)] - S[a]
    wrapped = S[n] - S[a] + S[jnp.clip(b - n + 1, 0, S.shape[0] - 1)]
    return jnp.where(wrap, wrapped, direct)


def _line_fit(msums: tuple, W: jax.Array):
    """Given window moment sums (Sx, Sy, Sxx, Sxy, Syy) and count W, return
    (ex, ey, cxx, cxy, cyy, err) where err = smaller covariance eigenvalue."""
    Sx, Sy, Sxx, Sxy, Syy = msums
    Wf = jnp.maximum(W.astype(jnp.float32), 1.0)
    ex, ey = Sx / Wf, Sy / Wf
    cxx = Sxx / Wf - ex * ex
    cxy = Sxy / Wf - ex * ey
    cyy = Syy / Wf - ey * ey
    disc = jnp.sqrt(jnp.maximum((cxx - cyy) ** 2 + 4 * cxy * cxy, 0.0))
    err = 0.5 * (cxx + cyy - disc)
    return ex, ey, cxx, cxy, cyy, err


def _line_dir(cxx, cxy, cyy):
    """Principal direction (largest-eigenvalue eigenvector) of the 2x2 cov."""
    disc = jnp.sqrt(jnp.maximum((cxx - cyy) ** 2 + 4 * cxy * cxy, 0.0))
    lam = 0.5 * (cxx + cyy + disc)
    # Two candidate eigenvectors; pick the numerically larger one.
    v1 = jnp.stack([cxy, lam - cxx], -1)
    v2 = jnp.stack([lam - cyy, cxy], -1)
    n1 = jnp.sum(v1 * v1, -1, keepdims=True)
    n2 = jnp.sum(v2 * v2, -1, keepdims=True)
    v = jnp.where(n1 > n2, v1, v2)
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-12))


def _fit_one(xy, grad, mask, n, *, max_line_fit_mse, critical_cos, min_area):
    """Fit a quad to one cluster. xy: (P, 2); grad: (P, 2); mask: (P,); n: ()."""
    P = xy.shape[0]
    nf = jnp.maximum(n, 1)
    fmask = mask.astype(jnp.float32)

    # --- centroid + angular sort (invalid points to the end) -------------
    cx = jnp.sum(xy[:, 0] * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
    cy = jnp.sum(xy[:, 1] * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
    theta = jnp.arctan2(xy[:, 1] - cy, xy[:, 0] - cx)
    theta = jnp.where(mask, theta, jnp.inf)
    order = jnp.argsort(theta)
    # Center AND scale-normalize coordinates: prefix-sum moments of raw pixel
    # coords (x ~ 1e3, x^2 ~ 1e6, prefix ~ 1e9) are destroyed by f32
    # cancellation when the variance (~0.1 px^2) is recovered. In normalized
    # units all moments are O(1) and f32 is ample.
    r2 = (xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2
    scale = jnp.sqrt(jnp.sum(r2 * fmask) / jnp.maximum(jnp.sum(fmask), 1.0))
    scale = jnp.maximum(scale, 1e-6)
    sx = (xy[order, 0] - cx) / scale
    sy = (xy[order, 1] - cy) / scale
    sg = grad[order]
    svalid = mask[order]
    fvalid = svalid.astype(jnp.float32)

    # --- winding / polarity ----------------------------------------------
    # Outward gradient (black->white): positive mean radial dot => dark inside.
    rad = jnp.stack([sx, sy], -1)   # already centered
    mean_dot = jnp.sum(jnp.sum(rad * sg, -1) * fvalid) / jnp.maximum(jnp.sum(fvalid), 1.0)
    dark_inside = mean_dot > 0

    # --- circular prefix moments -----------------------------------------
    fields = (sx * fvalid, sy * fvalid, sx * sx * fvalid,
              sx * sy * fvalid, sy * sy * fvalid)
    S = tuple(jnp.concatenate([jnp.zeros(1), jnp.cumsum(f)]) for f in fields)
    Sw = jnp.concatenate([jnp.zeros(1), jnp.cumsum(fvalid)])

    # --- sliding-window line-fit errors ----------------------------------
    ksz = jnp.minimum(20, nf // 12)
    ksz = jnp.maximum(ksz, 2)
    i = jnp.arange(P, dtype=jnp.int32)
    a = jnp.mod(i - ksz, nf)
    b = a + 2 * ksz  # inclusive, spans the window
    msums = tuple(_window_sum(s, a, b, nf) for s in S)
    Wn = _window_sum(Sw, a, b, nf)
    _, _, _, _, _, errs = _line_fit(msums, Wn)
    errs = jnp.where(i < nf, errs, 0.0)

    # --- circular smoothing (7-tap gaussian, sigma=1) --------------------
    taps = np.exp(-0.5 * (np.arange(-3, 4) ** 2)).astype(np.float32)
    taps /= taps.sum()
    sm = jnp.zeros_like(errs)
    for k, w in enumerate(taps):
        j = jnp.mod(i + (k - 3), nf)
        sm = sm + w * errs[j]
    errs = jnp.where(i < nf, sm, -1.0)

    # --- local maxima -> top-M corner candidates -------------------------
    prev = errs[jnp.mod(i - 1, nf)]
    nxt = errs[jnp.mod(i + 1, nf)]
    is_max = (errs > prev) & (errs >= nxt) & (i < nf)
    max_errs = jnp.where(is_max, errs, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(max_errs, _MAXIMA)
    cand_valid = jnp.isfinite(top_vals)
    # cyclic order: sort candidate indices ascending (invalid -> +inf)
    cand_sorted = jnp.sort(jnp.where(cand_valid, top_idx, jnp.int32(P + 1)))

    # --- score all 4-subsets ---------------------------------------------
    combos = jnp.asarray(_COMBOS)                   # (Ncomb, 4)
    cidx = cand_sorted[combos]                      # (Ncomb, 4)
    combo_ok = jnp.all(cidx <= P, -1) & (cidx[:, 3] < nf)

    c0 = cidx
    c1 = jnp.roll(cidx, -1, axis=-1)                # next corner (cyclic)
    arc_a = jnp.mod(c0 + 1, nf)                     # exclude corner points
    arc_b = jnp.where(c1 > c0, c1 - 1, c1 - 1 + nf)
    arc_len = arc_b - arc_a + 1
    arc_ok = arc_len >= 3
    arc_a2 = jnp.clip(arc_a, 0, nf - 1)
    arc_b2 = jnp.maximum(arc_b, arc_a2)
    msums = tuple(_window_sum(s, arc_a2, arc_b2, nf) for s in S)
    Wn = _window_sum(Sw, arc_a2, arc_b2, nf)
    ex, ey, cxx, cxy, cyy, aerr = _line_fit(msums, Wn)   # each (Ncomb, 4)
    combo_err = jnp.sum(aerr, -1)
    combo_ok = combo_ok & jnp.all(arc_ok, -1)
    combo_err = jnp.where(combo_ok, combo_err, jnp.inf)
    best = jnp.argmin(combo_err)
    best_err = combo_err[best]
    have_combo = jnp.isfinite(best_err)

    # --- winning lines -> corners ----------------------------------------
    pts = jnp.stack([ex[best], ey[best]], -1)       # (4, 2) line centroids
    dirs = _line_dir(cxx[best], cxy[best], cyy[best])  # (4, 2)
    # corner k = intersection of line (k-1) and line k
    from ..utils.geometry import line_intersection
    p_prev = jnp.roll(pts, 1, 0)
    d_prev = jnp.roll(dirs, 1, 0)
    corners = line_intersection(p_prev, d_prev, pts, dirs)  # (4, 2), normalized
    corners = corners * scale + jnp.stack([cx, cy])  # back to pixels

    # --- gates ------------------------------------------------------------
    # max per-arc MSE (convert normalized err -> px^2)
    mse_ok = jnp.max(aerr[best]) * scale * scale <= max_line_fit_mse
    # signed area (shoelace); also normalizes winding below
    x0, y0 = corners[:, 0], corners[:, 1]
    x1, y1 = jnp.roll(x0, -1), jnp.roll(y0, -1)
    area2 = jnp.sum(x0 * y1 - x1 * y0)
    area = 0.5 * jnp.abs(area2)
    area_ok = area >= min_area
    # corner angles: |cos| of angle between adjacent edges bounded away from 1
    e_in = corners - jnp.roll(corners, 1, 0)
    e_out = jnp.roll(corners, -1, 0) - corners
    cosang = jnp.sum(e_in * e_out, -1) / jnp.maximum(
        jnp.linalg.norm(e_in, axis=-1) * jnp.linalg.norm(e_out, axis=-1), 1e-9)
    ang_ok = jnp.all(jnp.abs(cosang) < critical_cos)
    finite_ok = jnp.all(jnp.isfinite(corners))

    gates = jnp.stack([have_combo, mse_ok, area_ok, ang_ok, finite_ok, n >= 8])
    valid = jnp.all(gates)

    # Normalize winding: force positive signed area (y-down CCW) so corner
    # order is consistent for decode; reverse 1<->3 if needed.
    corners = jnp.where(area2 < 0, corners[jnp.array([0, 3, 2, 1])], corners)

    return corners, valid, dark_inside, best_err * scale * scale, gates


def fit_quads(clusters: Clusters, *, max_line_fit_mse: float = 10.0,
              critical_cos: float = 0.985, min_area: float = 64.0) -> Quads:
    fit = functools.partial(_fit_one, max_line_fit_mse=max_line_fit_mse,
                            critical_cos=critical_cos, min_area=min_area)
    corners, valid, dark_inside, fit_err, gates = jax.vmap(fit)(
        clusters.xy, clusters.grad, clusters.mask, clusters.count)
    return Quads(corners=corners, valid=valid, dark_inside=dark_inside,
                 fit_err=fit_err, gates=gates)
