"""CLI + streaming-runner smoke tests (survey §7.1 L5/L8).

The CLI mirrors the reference's launch-arg surface (ref: isaac_ros_apriltag/
launch/isaac_ros_apriltag_core.launch.py:55-69); invoked in-process to share
the jit cache with the rest of the suite.
"""

import json

import numpy as np
import pytest

from isaac_ros_apriltag_tpu.cli import main
from isaac_ros_apriltag_tpu.models.families import get_family
from isaac_ros_apriltag_tpu.utils.render import render_tags, upright_pose


@pytest.fixture()
def scene_npy(tmp_path):
    fam = get_family("tag36h11")
    t = np.array([0.0, 0.0, 1.1])
    img = render_tags(np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]]),
                      (480, 640),
                      [dict(family=fam, id=7, R=upright_pose(t), t=t,
                            tag_size=0.16)])
    p = tmp_path / "scene.npy"
    np.save(p, img)
    return str(p)


def test_cli_detect(scene_npy, capsys):
    rc = main(["detect", "--image", scene_npy, "--backends", "xla",
               "--size", "0.16", "--fx", "420", "--fy", "420",
               "--cx", "320", "--cy", "240"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(line) for line in out]
    assert [r["id"] for r in rows] == [7]
    assert abs(rows[0]["translation"][2] - 1.1) < 0.01


def test_cli_detect_rejects_bad_family(scene_npy):
    with pytest.raises(ValueError):
        main(["detect", "--image", scene_npy, "--tag-family", "tag99h9"])


def test_cli_slam_roundtrip(tmp_path, capsys):
    mp = str(tmp_path / "map.npz")
    rc = main(["slam", "--backends", "xla", "--size", "0.16",
               "--frames", "4", "--tags", "4", "--ba-iters", "4",
               "--noise", "0.5", "--save-map", mp])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["tags_mapped"] == 4
    assert res["ate_rmse_m"] < 0.05
    assert (tmp_path / "map.npz").exists()


def test_streaming_runner_overlaps_and_preserves_order():
    import jax
    import jax.numpy as jnp

    from isaac_ros_apriltag_tpu.streaming import StreamingRunner, run_stream

    @jax.jit
    def fn(x):
        return jnp.sum(x) * 2.0

    frames = [np.full((16, 16), i, np.float32) for i in range(7)]
    want = [float(np.sum(f) * 2.0) for f in frames]
    for depth in (1, 2, 4):
        got = [float(r) for r in run_stream(fn, frames, depth=depth)]
        assert got == want, depth
    with pytest.raises(ValueError):
        StreamingRunner(fn, depth=0)
