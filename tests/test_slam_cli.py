"""Online frames-driven SLAM CLI (test_gt_graph ONLINE role) end-to-end:
TUM-layout sequence -> `slam` -> trajectory + ATE vs groundtruth.txt, and
the recorded VRO log replays through `posegraph`."""

import os

import numpy as np
import pytest

from test_cli import run_cli
from test_pipelines2 import render_wall_frame
from graph_slam_tpu.config import SR4000
from graph_slam_tpu.io import groundtruth_at, read_trajectory

XS = [0.0, 0.12, 0.24, 0.36, 0.48]
T0 = 100.0


@pytest.fixture(scope="module")
def tum_scene(tmp_path_factory):
    """TUM-layout dir of SR4000-sized rendered wall frames + groundtruth
    shifted/permuted by a rigid transform (ATE must align it away)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tum_slam")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for k, x in enumerate(XS):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        t = T0 + 0.1 * k
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            root / "rgb" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        td = t + 0.005
        Image.fromarray((depth * 5000.0).astype(np.uint16)).save(
            root / "depth" / f"{td:.6f}.png")
        dep_lines.append(f"{td:.6f} depth/{td:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    # ground truth in a different rigid frame: x_cam -> (z+1, -x, y+2)
    gt = ["# t tx ty tz qx qy qz qw"]
    for k, x in enumerate(XS):
        t = T0 + 0.1 * k
        gt.append(f"{t:.6f} 1.0 {-x:.6f} 2.0 0.0 0.0 0.0 1.0")
    (root / "groundtruth.txt").write_text("\n".join(gt) + "\n")
    return root


def test_slam_cli_tum_end_to_end(tum_scene, tmp_path):
    out_dir = tmp_path / "out"
    rec = tmp_path / "recorded_vro.log"
    marg = tmp_path / "marginals.log"
    stdout = run_cli(
        "slam", "--frames", str(tum_scene), "--camera", "sr4000",
        "--out-dir", str(out_dir), "--record", str(rec),
        "--marginals", str(marg),
        "--gt", str(tum_scene / "groundtruth.txt"),
        "--n-hyp", "512", "--min-inliers", "10")
    assert "final chi2:" in stdout
    assert "ATE RMSE:" in stdout
    ate = float(stdout.split("ATE RMSE:")[1].split()[0])
    assert ate < 0.05, stdout

    traj = read_trajectory(str(out_dir / "trajectory.log"))
    assert len(traj.t) == len(XS)          # every 0.12 m step keyframed
    for k, x in enumerate(XS):
        assert abs(traj.t[k, 0] - x) < 0.04, (k, traj.t[k], x)

    # pose marginals: one per keyframe, anchored node tightest
    from graph_slam_tpu.io import read_marginals
    mids, mcovs = read_marginals(str(marg))
    assert len(mids) == len(XS)
    assert np.trace(mcovs[0]) < np.trace(mcovs[-1])

    # the recorded VRO log replays through the offline pipeline
    assert os.path.exists(rec)
    stdout2 = run_cli("posegraph", "--vro", str(rec),
                      "--out-dir", str(tmp_path / "replay"))
    assert "chi2:" in stdout2
    traj2 = read_trajectory(str(tmp_path / "replay" / "trajectory.log"))
    assert len(traj2.t) == len(XS)


def test_groundtruth_at_association(tum_scene):
    ts = np.array([T0, T0 + 0.1, T0 + 0.55])   # last has no gt neighbor
    iq, t, q = groundtruth_at(str(tum_scene / "groundtruth.txt"), ts)
    assert list(iq) == [0, 1]
    np.testing.assert_allclose(t[:, 0], 1.0)
    np.testing.assert_allclose(t[0, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(t[1, 1], -0.12, atol=1e-9)
    assert q.shape == (2, 4) and np.allclose(q[:, 0], 1.0)  # w-first
