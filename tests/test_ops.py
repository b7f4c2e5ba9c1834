"""Unit tests for the low-level image ops (threshold, CCL, grayscale, remap)."""

import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_apriltag_tpu.ops import ccl, grayscale, remap, threshold


def test_grayscale_encodings():
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0] = 255  # pure red
    g_rgb = np.asarray(grayscale.grayscale(jnp.asarray(rgb), "rgb8"))
    g_bgr = np.asarray(grayscale.grayscale(jnp.asarray(rgb), "bgr8"))
    assert abs(g_rgb[0, 0] - 255 * 0.299) < 1e-3
    assert abs(g_bgr[0, 0] - 255 * 0.114) < 1e-3
    mono = np.full((8, 8), 42, np.uint8)
    assert np.asarray(grayscale.grayscale(jnp.asarray(mono), "mono8"))[0, 0] == 42
    with pytest.raises(ValueError, match="Unsupported image encoding"):
        grayscale.grayscale(jnp.asarray(rgb), "yuv422")


def test_adaptive_threshold_basic():
    img = np.full((32, 32), 100.0, np.float32)
    img[8:24, 8:24] = 200.0
    tri = np.asarray(threshold.adaptive_threshold(jnp.asarray(img), 4, 5))
    assert tri[16, 22] == 255     # bright pixel near the edge -> white
    assert tri[16, 26] == 0       # dark pixel near the edge -> black
    # uniform areas far from any contrast must be 'skip'
    assert tri[16, 16] == 127
    assert tri[0, 0] == 127


def test_ccl_two_blobs():
    img = np.full((32, 32), 127, np.uint8)
    img[2:10, 2:10] = 255
    img[20:30, 20:30] = 255
    img[2:10, 20:30] = 0
    lab = np.asarray(ccl.connected_components(jnp.asarray(img), rounds=4, jumps=2))
    a = lab[2:10, 2:10]
    b = lab[20:30, 20:30]
    c = lab[2:10, 20:30]
    assert len(np.unique(a)) == 1
    assert len(np.unique(b)) == 1
    assert len(np.unique(c)) == 1
    assert len({a[0, 0], b[0, 0], c[0, 0]}) == 3
    sizes = np.asarray(ccl.component_sizes(jnp.asarray(lab)))
    assert sizes[a[0, 0]] == 64
    assert sizes[b[0, 0]] == 100
    assert sizes[c[0, 0]] == 80


def test_ccl_concave_component():
    # A U-shape: propagation must flow around the bend.
    img = np.full((24, 24), 127, np.uint8)
    img[4:20, 4:8] = 0
    img[16:20, 4:20] = 0
    img[4:20, 16:20] = 0
    lab = np.asarray(ccl.connected_components(jnp.asarray(img), rounds=6, jumps=2))
    ys, xs = np.nonzero(img == 0)
    assert len(np.unique(lab[ys, xs])) == 1


def test_ccl_ring_component():
    # A 1-px ring (the tag-border topology): the hard CCL convergence case —
    # min label must travel half the perimeter. Scans must close the loop.
    img = np.full((64, 64), 127, np.uint8)
    img[8:56, 8:56] = 0
    img[12:52, 12:52] = 127  # hollow it out -> 4px-wide ring, perimeter ~200
    lab = np.asarray(ccl.connected_components(jnp.asarray(img), rounds=6, jumps=2))
    ys, xs = np.nonzero(img == 0)
    assert len(np.unique(lab[ys, xs])) == 1


def test_ccl_matches_scipy_on_random_blobs():
    """Partition equality against scipy.ndimage ground truth on random
    percolation noise — the adversarial case for scan-based CCL.

    Checked for dark components (4-connectivity): segmented scans converge
    these in a handful of rounds even on percolation clusters. White
    components use 8-connectivity whose diagonal-only bridges advance one
    link per round by design (AprilTag scenes have shallow diagonal chains;
    arbitrarily long chains only arise in noise like this)."""
    from scipy import ndimage

    rng = np.random.default_rng(7)
    img = rng.choice(np.array([0, 127, 255], np.uint8), size=(96, 96),
                     p=[0.35, 0.3, 0.35])
    lab = np.asarray(ccl.connected_components(jnp.asarray(img), rounds=8, jumps=3))
    s4 = ndimage.generate_binary_structure(2, 1)
    gt, n = ndimage.label(img == 0, structure=s4)
    ys, xs = np.nonzero(img == 0)
    ours = lab[ys, xs]
    pairs = set(zip(ours.tolist(), gt[ys, xs].tolist()))
    assert len(pairs) == n == len(set(ours.tolist()))


def test_resize_area():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = np.asarray(remap.resize_area(jnp.asarray(img), 2))
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_remap_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 16)).astype(np.float32)
    xs, ys = np.meshgrid(np.arange(16, dtype=np.float32),
                         np.arange(16, dtype=np.float32))
    grid = jnp.asarray(np.stack([xs, ys], -1))
    out = np.asarray(remap.remap_bilinear(jnp.asarray(img), grid))
    np.testing.assert_allclose(out[:15, :15], img[:15, :15], atol=1e-4)
