"""TUM RGB-D benchmark ingestion (io/tum.py): association, depth scaling,
ground-truth conversion, frame-source auto-detection."""

import numpy as np
import pytest

from graph_slam_tpu.io import (
    TumDataset,
    associate_timestamps,
    open_frame_source,
    read_tum_groundtruth,
)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Tiny synthetic TUM sequence: 4 rgb frames, 4 depth frames with
    timestamp jitter, one unmatchable depth entry, a short gt file."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tum")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)

    rgb_lines = ["# color images", "# timestamp filename"]
    dep_lines = ["# depth images"]
    for k in range(4):
        t = 10.0 + 0.1 * k
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "rgb" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        td = t + 0.008        # depth ~8 ms later (within the 20 ms gate)
        depth = np.full((48, 64), 5000 + 100 * k, np.uint16)  # ~1 m
        Image.fromarray(depth).save(
            root / "depth" / f"{td:.6f}.png")
        dep_lines.append(f"{td:.6f} depth/{td:.6f}.png")
    # one depth frame far from any rgb timestamp: must stay unmatched
    lone = 99.0
    Image.fromarray(np.full((48, 64), 5000, np.uint16)).save(
        root / "depth" / f"{lone:.6f}.png")
    dep_lines.append(f"{lone:.6f} depth/{lone:.6f}.png")

    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    gt = ["# ground truth", "10.0 1.0 2.0 3.0 0.0 0.0 0.0 1.0",
          "10.1 1.1 2.0 3.0 0.0 0.0 0.7071 0.7071"]
    (root / "groundtruth.txt").write_text("\n".join(gt) + "\n")
    return root


def test_association_greedy_nearest():
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([0.015, 0.99, 5.0])
    ia, ib = associate_timestamps(a, b, max_dt=0.02)
    assert list(ia) == [0, 1] and list(ib) == [0, 1]
    # each side used at most once, best pair wins
    a2 = np.array([0.0])
    b2 = np.array([0.01, 0.005])
    ia2, ib2 = associate_timestamps(a2, b2, max_dt=0.02)
    assert list(ia2) == [0] and list(ib2) == [1]


def test_dataset_frames_and_scaling(tum_dir):
    ds = TumDataset(str(tum_dir))
    assert len(ds) == 4                 # the lone depth frame dropped
    inten, depth = ds(0)
    assert inten.shape == (48, 64) and inten.ndim == 2
    assert depth.shape == (48, 64)
    np.testing.assert_allclose(depth, 1.0, atol=1e-6)   # 5000 units = 1 m
    _, d3 = ds(3)
    np.testing.assert_allclose(d3, 5300 / 5000, atol=1e-6)
    assert ds(99) is None
    assert np.allclose(np.diff(ds.timestamps), 0.1)


def test_open_frame_source_detects_tum(tum_dir):
    src = open_frame_source(str(tum_dir))
    assert isinstance(src, TumDataset)


def test_groundtruth_quat_reorder(tum_dir):
    traj = read_tum_groundtruth(str(tum_dir / "groundtruth.txt"))
    assert len(traj.ids) == 2
    np.testing.assert_allclose(traj.t[0], [1.0, 2.0, 3.0])
    # TUM qx qy qz qw -> framework w x y z
    np.testing.assert_allclose(traj.quat[0], [1.0, 0, 0, 0])
    np.testing.assert_allclose(traj.quat[1], [0.7071, 0, 0, 0.7071])


def test_map_pipeline_on_tum(tum_dir):
    """A TUM sequence drives the mapping tier unmodified."""
    from graph_slam_tpu.config import TUM_FR1
    from graph_slam_tpu.io import Trajectory
    from graph_slam_tpu.mapping import accumulate_cloud

    ds = TumDataset(str(tum_dir))
    n = len(ds)
    traj = Trajectory(ids=np.arange(n),
                      t=np.zeros((n, 3)),
                      quat=np.tile([1.0, 0, 0, 0], (n, 1)),
                      seq=np.arange(n))
    pts, cols = accumulate_cloud(traj, ds, TUM_FR1, stride=2, skip=8)
    assert len(pts) > 0
    assert np.all(np.abs(pts[:, 2] - 1.0) < 0.1)   # wall of ~1 m depth
