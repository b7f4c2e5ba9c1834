"""Image warping ops: rectification remap + resize.

TPU-native equivalents of the external isaac_ros_image_proc Rectify/Resize
nodes the reference composes upstream of the detector
(ref: isaac_ros_apriltag/package.xml:49, launch/isaac_ros_apriltag_usb_cam.
launch.py:43-52, README.md:16-26 — incl. the motivating 8 MP -> 4:1 downscale
path). Pure gather/reduce formulations that XLA vectorizes on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def remap_bilinear(image: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample `image` at source coords `grid`.

    image: (H, W) or (H, W, C) float32/uint8; grid: (H', W', 2) source (x, y).
    Out-of-range samples clamp to the border. Returns float32.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H, W, C = image.shape
    img = image.astype(jnp.float32)
    x = jnp.clip(grid[..., 0], 0.0, W - 1.001)
    y = jnp.clip(grid[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out[..., 0] if squeeze else out


def resize_area(image: jax.Array, factor: int) -> jax.Array:
    """Integer-factor area downsample ((H, W[, C]) -> (H/f, W/f[, C])).

    The reference's README recommends exactly this for 8 MP inputs
    (4:1 -> 1080p, README.md:24-26); an integer box filter is a pure reshape
    + mean, the cheapest possible formulation on TPU.
    """
    f = int(factor)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H, W, C = image.shape
    assert H % f == 0 and W % f == 0, (H, W, f)
    out = image.astype(jnp.float32).reshape(H // f, f, W // f, f, C).mean((1, 3))
    return out[..., 0] if squeeze else out


def resize_bilinear(image: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H', W') via jax.image (XLA-fused gather math)."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H2, W2 = out_hw
    out = jax.image.resize(image.astype(jnp.float32),
                           (H2, W2, image.shape[-1]), method="bilinear")
    return out[..., 0] if squeeze else out
