"""Family registry / codebook invariants + config validation.

Mirrors the reference's constructor-validation unit tests
(ref: test/apriltag_node_test.cpp:29-96) plus codebook integrity checks the
reference delegates to its closed backends.
"""

import numpy as np
import pytest

from isaac_ros_apriltag_tpu.config import DetectorConfig
from isaac_ros_apriltag_tpu.models.families import FAMILY_SPECS, family_names, get_family


def test_nine_families_registered():
    # Same nine names as the reference registry (apriltag_node.cpp:47-58).
    assert set(family_names()) == {
        "tag36h11", "tag36h10", "tag25h9", "tag16h5", "tagCircle21h7",
        "tagCircle49h12", "tagCustom48h12", "tagStandard41h12",
        "tagStandard52h13"}


@pytest.mark.parametrize("name", family_names())
def test_family_layout(name):
    fam = get_family(name)
    assert fam.nbits == FAMILY_SPECS[name][0]
    assert len(fam.bit_x) == fam.nbits
    # rotation closure is asserted inside rotation_perm
    perms = fam.rotation_perm
    assert perms.shape == (4, fam.nbits)
    assert np.array_equal(perms[0], np.arange(fam.nbits))
    assert fam.ncodes > 0
    # codes fit in nbits
    assert int(fam.codes.max()) < (1 << fam.nbits)


@pytest.mark.parametrize("name", family_names())
def test_codebook_distance(name):
    """Min pairwise Hamming distance across rotations >= design distance
    (sampled for big families to keep the test fast)."""
    fam = get_family(name)
    codes = fam.codes
    if fam.ncodes > 256:
        rng = np.random.default_rng(0)
        codes = codes[rng.choice(fam.ncodes, 256, replace=False)]
    # expand rotations via bit matrices
    nb = fam.nbits
    shifts = np.arange(nb - 1, -1, -1, dtype=np.uint64)
    bits = ((codes[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    rots = bits[:, fam.rotation_perm]              # (N, 4, nb)
    packed = (rots.astype(np.uint64) << shifts).sum(-1, dtype=np.uint64)  # (N, 4)
    flat = packed.reshape(-1)
    x = np.bitwise_count(flat[:, None] ^ flat[None, :])
    n = len(codes)
    same_code = np.repeat(np.arange(n), 4)
    mask = same_code[:, None] != same_code[None, :]
    assert x[mask].min() >= fam.min_hamming, name
    # self-rotation distinctness
    self_mask = (same_code[:, None] == same_code[None, :]) & (
        np.arange(4 * n)[:, None] != np.arange(4 * n)[None, :])
    assert x[self_mask].min() >= fam.min_hamming, name


def test_code_grid_roundtrip():
    fam = get_family("tag36h11")
    code = int(fam.codes[7])
    grid = fam.code_grid(code)
    assert grid.shape == (fam.total_width, fam.total_width)
    off = (fam.total_width - fam.width_at_border) // 2
    # read data bits back out
    got = 0
    for i in range(fam.nbits):
        x, y = int(fam.bit_x[i]) + off, int(fam.bit_y[i]) + off
        got = (got << 1) | int(grid[y, x])
    assert got == code
    # border ring is black, margin is white (normal family)
    assert grid[off, off] == 0 and grid[off, off + fam.width_at_border - 1] == 0
    assert grid[0, 0] == 1


def test_config_validation():
    # invalid family name -> raises (ref: apriltag_node_test.cpp:29-49)
    with pytest.raises(ValueError, match="Invalid tag family"):
        DetectorConfig(tag_family="tag41h7")
    # valid family on a supporting backend -> ok (ref: :74-89)
    DetectorConfig(tag_family="tag36h10", backend="xla")
    with pytest.raises(ValueError, match="Invalid backend"):
        DetectorConfig(backend="cuda")
    with pytest.raises(ValueError, match="max_hamming"):
        DetectorConfig(tag_family="tag16h5", max_hamming=3)


def test_register_family_vendoring_path():
    """The vendoring hook for the five non-published codebooks: a user with
    the OFFICIAL table (e.g. vendored from the AprilTag 3 sources) registers
    it under the family name and the whole stack — config validation,
    Detector construction, rendering, end-to-end decode — honors the
    injected table instead of the built-in stand-in.

    Simulated here by injecting a REVERSED-order tagCircle21h7 codebook:
    the rendered codeword for id k is then the stand-in's id (n-1-k), so a
    correct decode proves the detector consulted the injected table.
    """
    import dataclasses as dc

    import jax

    from isaac_ros_apriltag_tpu import CameraModel, Detector, DetectorConfig
    from isaac_ros_apriltag_tpu.models import families
    from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose

    standin = families.get_family("tagCircle21h7")
    vendored = dc.replace(standin, codes=standin.codes[::-1].copy(), exact=True)
    families.register_family(vendored)
    try:
        fam = families.get_family("tagCircle21h7")
        assert fam.exact and fam.codes[0] == standin.codes[-1]
        cam = CameraModel.create(fx=420.0, fy=420.0, cx=320.0, cy=240.0,
                                 width=640, height=480)
        t = np.array([0.0, 0.02, 0.7])
        img = render_tags(np.asarray(cam.K), (480, 640),
                          [dict(family=fam, id=5, R=upright_pose(t), t=t,
                                tag_size=0.16)])
        det = Detector(DetectorConfig(tag_family="tagCircle21h7",
                                      backend="xla", tag_size=0.16), cam)
        rows = det.detect(img, encoding="mono8").to_list()
        assert len(rows) == 1 and rows[0]["id"] == 5
        # the same bitmap under the BUILT-IN table would decode to n-1-5
        assert standin.ncodes - 1 - 5 != 5
    finally:
        families.register_family(standin)   # restore for other tests
