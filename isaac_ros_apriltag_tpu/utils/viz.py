"""Detection overlay rendering (host-side, numpy).

Replaces the reference's rviz-based visualization (Image + TF displays,
ref: rviz/default.rviz:53,:227-240): draws corners, edges, center and id onto
a frame for quick inspection, with axes projected from the estimated pose.
"""

from __future__ import annotations

import numpy as np

from ..types import Detections

_EDGE_COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]


def _draw_line(img, p0, p1, color):
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    n = int(max(2, np.ceil(np.abs(p1 - p0).max() * 2)))
    ts = np.linspace(0.0, 1.0, n)
    pts = p0[None] + ts[:, None] * (p1 - p0)[None]
    xs = np.clip(np.round(pts[:, 0]).astype(int), 0, img.shape[1] - 1)
    ys = np.clip(np.round(pts[:, 1]).astype(int), 0, img.shape[0] - 1)
    img[ys, xs] = color


def draw_detections(image: np.ndarray, det: Detections,
                    K: np.ndarray | None = None,
                    tag_size: float | None = None) -> np.ndarray:
    """Return an RGB copy of `image` with detection overlays."""
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img.copy()
    valid = np.asarray(det.valid)
    corners = np.asarray(det.corners)
    centers = np.asarray(det.center)
    for i in np.nonzero(valid)[0]:
        c = corners[i]
        for e in range(4):
            _draw_line(img, c[e], c[(e + 1) % 4], _EDGE_COLORS[e])
        cx, cy = centers[i]
        _draw_line(img, (cx - 3, cy), (cx + 3, cy), (255, 0, 255))
        _draw_line(img, (cx, cy - 3), (cx, cy + 3), (255, 0, 255))
        if K is not None and tag_size is not None:
            R = np.asarray(det.rotation)[i]
            t = np.asarray(det.translation)[i]
            for axis, color in zip(np.eye(3) * tag_size * 0.5,
                                   [(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
                p = R @ axis + t
                K = np.asarray(K)
                uv = (K[0, 0] * p[0] / p[2] + K[0, 2],
                      K[1, 1] * p[1] / p[2] + K[1, 2])
                _draw_line(img, (cx, cy), uv, color)
    return img
