"""CLI driver-tier end-to-end smoke (VERDICT ask #8).

One synthetic scenario exercises the full executable surface in a tmpdir:
VRO log -> posegraph -> trajectory -> map (PCD + PLY) -> mesh -> video
snapshots -> plane-check -> ba-imu -> g2o ingest. All subcommands run as
real subprocesses (``python -m graph_slam_tpu ...``) on CPU.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from test_pipelines2 import render_wall_frame
from graph_slam_tpu.config import SR4000
from graph_slam_tpu.core import se3
from graph_slam_tpu.io import read_trajectory, write_vro_log
from graph_slam_tpu.io.frames import FrameStore
from graph_slam_tpu.io.vro_log import VROLog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")


def run_cli(*args, timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-m", "graph_slam_tpu", *args],
                         env=env, capture_output=True, text=True,
                         timeout=timeout, cwd=REPO)
    assert out.returncode == 0, (args, out.stdout[-800:], out.stderr[-800:])
    return out.stdout


@pytest.fixture(scope="module")
def scenario(tmp_path_factory):
    """5-frame translating-camera scene: .gsf frames + VRO log on disk."""
    root = tmp_path_factory.mktemp("cli")
    frames_dir = root / "frames"
    store = FrameStore(str(frames_dir))
    xs = [0.0, 0.12, 0.24, 0.36, 0.48]
    for k, x in enumerate(xs):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        store.save(k, img, depth)
    # NB: info(0,0) == 1e4 would collide with the failed-edge sentinel
    info = np.diag([8e3] * 3 + [4e3] * 3)
    rows = []
    for k in range(1, len(xs)):
        T = se3.Pose(jnp.eye(3), jnp.array([xs[k] - xs[k - 1], 0.0, 0.0]))
        rows.append((k, k - 1, np.asarray(se3.logmap(T)), info))
    log = VROLog(np.asarray([r[0] for r in rows]),
                 np.asarray([r[1] for r in rows]),
                 np.stack([r[2] for r in rows]),
                 np.stack([r[3] for r in rows]))
    vro_path = root / "vro.log"
    write_vro_log(str(vro_path), log)
    return root, str(frames_dir), str(vro_path), xs


class TestCliEndToEnd:
    def test_posegraph_map_mesh_video(self, scenario):
        root, frames_dir, vro_path, xs = scenario
        out_dir = str(root / "out")
        stdout = run_cli("posegraph", "--vro", vro_path,
                         "--out-dir", out_dir)
        assert "chi2" in stdout
        traj_path = os.path.join(out_dir, "trajectory.log")
        traj = read_trajectory(traj_path)
        assert len(traj.ids) == len(xs)

        # map -> PCD and PLY
        pcd = str(root / "map.pcd")
        run_cli("map", "--traj", traj_path, "--frames", frames_dir,
                "--out", pcd, "--stride", "1", "--voxel", "0.05")
        assert os.path.getsize(pcd) > 1000
        ply = str(root / "map.ply")
        run_cli("map", "--traj", traj_path, "--frames", frames_dir,
                "--out", ply, "--stride", "2")
        assert open(ply).readline().strip() == "ply"

        # mesh from the map
        mesh = str(root / "mesh.ply")
        run_cli("mesh", "--pcd", pcd, "--out", mesh)
        assert os.path.getsize(mesh) > 200

        # filter round trip
        filt = str(root / "map_f.pcd")
        run_cli("filter", "--pcd", pcd, "--out", filt, "--voxel", "0.1")
        assert os.path.exists(filt)

        # video snapshots
        snaps = str(root / "snaps")
        out = run_cli("video", "--traj", traj_path, "--frames", frames_dir,
                      "--out-dir", snaps, "--every", "2")
        assert "snapshots" in out
        assert any(f.endswith(".ply") for f in os.listdir(snaps))

    def test_plane_check(self, scenario):
        root, frames_dir, vro_path, xs = scenario
        out = str(root / "plane_check.log")
        stdout = run_cli("plane-check", "--vro", vro_path,
                         "--frames", frames_dir, "--out", out)
        assert "scored 4 edges" in stdout
        assert os.path.exists(out)

    def test_plane_check_single_pair(self, scenario):
        """test_plane_dis role (plane_dis_two_frames.launch): one edge
        scored under the log's VO covariance."""
        root, frames_dir, vro_path, xs = scenario
        stdout = run_cli("plane-check", "--vro", vro_path,
                         "--frames", frames_dir, "--pair", "0:1",
                         "--min-support", "200")
        assert "scored 1 edges" in stdout
        assert "edge 0->1:" in stdout

    def test_match_two_frames_svd_and_pnp(self, scenario):
        """test_match_two_frames / test_match_PnP roles: both methods must
        recover the scenario's pure +x translation."""
        root, frames_dir, vro_path, xs = scenario
        for method in ("svd", "pnp"):
            stdout = run_cli("match", "--frames", frames_dir,
                             "--src", "1", "--tar", "0",
                             "--method", method)
            assert "match OK" in stdout, method
            t_line = next(l for l in stdout.splitlines()
                          if l.startswith("t:"))
            t = np.array([float(x) for x in t_line.split()[1:]])
            np.testing.assert_allclose(t, [xs[1] - xs[0], 0.0, 0.0],
                                       atol=5e-3, err_msg=method)

    def test_view_modes(self, scenario):
        """Headless viewer tier (view_registration_vo/list/range.launch,
        view_planes.launch)."""
        root, frames_dir, vro_path, xs = scenario
        views = str(root / "views")
        out = run_cli("view", "--mode", "pair", "--frames", frames_dir,
                      "--vro", vro_path, "--from-id", "0", "--to-id", "1",
                      "--out-dir", views)
        assert "wrote 1/1" in out
        assert os.path.exists(os.path.join(views, "reg_0_1.ply"))
        out = run_cli("view", "--mode", "range", "--frames", frames_dir,
                      "--vro", vro_path, "--start", "0", "--end", "3",
                      "--out-dir", views)
        assert "wrote 3/3" in out
        lst = str(root / "vo_list.log")
        with open(lst, "w") as f:
            f.write("1 0 20\n2 1 30\n")
        out = run_cli("view", "--mode", "list", "--frames", frames_dir,
                      "--vro", vro_path, "--list", lst,
                      "--min-num", "1", "--max-num", "26",
                      "--out-dir", views)
        assert "wrote 1/1" in out          # num=30 filtered by max 26
        out = run_cli("view", "--mode", "planes", "--frames", frames_dir,
                      "--frame-id", "0", "--min-support", "200",
                      "--out-dir", views)
        assert "planes" in out
        assert os.path.exists(os.path.join(views, "planes_0.png"))

    def test_imu_preview(self, scenario):
        """launch/display tier: gyro dead-reckoning preview."""
        root, _, _, _ = scenario
        imu = str(root / "imu_v100.log")
        t = np.arange(0, 2, 0.005)
        gyr = np.zeros((len(t), 3))
        gyr[:, 2] = 0.1                       # steady yaw rate
        acc = np.tile([0.0, 0.0, 9.81], (len(t), 1))
        rpy = np.zeros((len(t), 3))           # file order: yaw pitch roll
        rpy[:, 0] = np.degrees(0.1 * t)
        np.savetxt(imu, np.column_stack([t, acc, gyr, rpy]))
        out_log = str(root / "rpy.log")
        stdout = run_cli("imu-preview", "--imu", imu, "--imu-type",
                         "vn100", "--static-samples", "0", "--out",
                         out_log)
        assert "drift" in stdout
        rows = np.loadtxt(out_log)
        # integrated yaw (col 4, deg) tracks the measured stream (col 7)
        np.testing.assert_allclose(rows[-1, 4], rows[-1, 7], atol=0.5)

    def test_map_preset_roi_and_zmax(self, scenario):
        """mapping_PCD.launch twin drives map through --config: the ROI
        and passthrough params must be honored."""
        root, frames_dir, vro_path, xs = scenario
        traj_dir = str(root / "po")
        run_cli("posegraph", "--vro", vro_path, "--out-dir", traj_dir)
        traj = os.path.join(traj_dir, "trajectory.log")
        full = str(root / "full.pcd")
        run_cli("map", "--traj", traj, "--frames", frames_dir,
                "--out", full, "--stride", "1")
        roi = str(root / "roi.pcd")
        run_cli("map", "--traj", traj, "--frames", frames_dir,
                "--config", "mapping_PCD", "--stride", "1", "--out", roi)
        from graph_slam_tpu.mapping import read_pcd

        pts_full, _ = read_pcd(full)
        pts_roi, _ = read_pcd(roi)
        assert 0 < len(pts_roi) < len(pts_full)

    def test_delete_vo_and_add_vo_sparse(self, scenario):
        """The two remaining gtsam/test log tools as CLI drivers
        (delete_vo_by_plane_check.cpp / add_vo_at_sparse_area.cpp)."""
        from graph_slam_tpu.io import read_vro_log

        root, frames_dir, vro_path, xs = scenario
        scores = str(root / "scores.log")
        run_cli("plane-check", "--vro", vro_path, "--frames", frames_dir,
                "--out", scores)
        out_del = str(root / "vro_del.log")
        stdout = run_cli("delete-vo", "--vro", vro_path,
                         "--scores", scores, "--thresh", "-1.0",
                         "--out", out_del)
        assert "voided" in stdout
        voided = read_vro_log(out_del)
        assert (~voided.valid).sum() >= 1   # thresh -1 voids scored edges

        out_add = str(root / "vro_add.log")
        stdout = run_cli("add-vo-sparse", "--vro", vro_path,
                         "--frames", frames_dir,
                         "--sparse-thresh", "9999", "--window", "3",
                         "--out", out_add)
        assert "edges added" in stdout
        added = read_vro_log(out_add)
        assert len(added) >= len(read_vro_log(vro_path))

    def test_delete_vo_frames_with_failed_edge(self, scenario):
        """delete-vo --frames on a log CONTAINING a failed-sentinel record
        (the normal case for real logs): check_vo_edges skips invalid
        rows, so the scores must align to log rows by edge id, not by
        compacted position (regression: misaligned voiding/IndexError)."""
        from graph_slam_tpu.io import read_vro_log, write_vro_log
        from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL, VROLog

        root, frames_dir, vro_path, xs = scenario
        log = read_vro_log(vro_path)
        bad = np.eye(6)
        bad[0, 0] = FAILED_INFO_SENTINEL
        # failed record FIRST, so every valid row sits after it
        mixed = VROLog(np.concatenate([[1], log.id_to]),
                       np.concatenate([[0], log.id_from]),
                       np.concatenate([np.zeros((1, 6)), log.xi]),
                       np.concatenate([bad[None], log.info]))
        mixed_path = str(root / "vro_failed.log")
        write_vro_log(mixed_path, mixed)
        out_del = str(root / "vro_del_failed.log")
        stdout = run_cli("delete-vo", "--vro", mixed_path,
                         "--frames", frames_dir, "--thresh", "-1.0",
                         "--out", out_del)
        assert "voided" in stdout
        voided = read_vro_log(out_del)
        # every VALID edge scored > -1 and was voided; the failed record
        # itself is untouched (still exactly one sentinel row + others)
        assert (~voided.valid).all()

    def test_ba_imu(self, scenario):
        root, frames_dir, vro_path, xs = scenario
        stdout = run_cli("ba-imu", "--frames", frames_dir,
                         "--seqs", f"0:{len(xs)}")
        assert "chi2" in stdout and "proj=" in stdout

    def test_ba_imu_sharded(self, scenario):
        """Landmark-sharded square-root Schur solve over the 8-way mesh,
        driven through the executable tier."""
        root, frames_dir, vro_path, xs = scenario
        stdout = run_cli("ba-imu", "--frames", frames_dir,
                         "--seqs", f"0:{len(xs)}", "--sharded", "8")
        assert "chi2" in stdout and "proj=" in stdout

    def test_vio_flagship_with_frames(self, tmp_path):
        """Full flagship driver: .gsf frames + VN100 IMU log + timestamps +
        VRO log with a failed edge -> `vio --plane-mode rescue --frames`
        (the test_vro_imu_graph invocation shape)."""
        from test_plane_node import simulate_frames, K

        log, img_times, stream, params, X, frames = simulate_frames()
        frames_dir = tmp_path / "frames"
        store = FrameStore(str(frames_dir))
        for seq, (inten, depth) in frames.items():
            store.save(seq, inten, depth)
        vro = str(tmp_path / "vro.log")
        from graph_slam_tpu.io import write_vro_log

        write_vro_log(vro, log)
        imu_path = str(tmp_path / "imu_v100.log")
        rows = np.concatenate(
            [stream.t[:, None], stream.acc, stream.gyr,
             np.zeros((len(stream.t), 3))], axis=1)
        np.savetxt(imu_path, rows)
        times_path = str(tmp_path / "timestamp.log")
        with open(times_path, "w") as f:
            for seq, t in img_times.items():
                f.write(f"{seq} {t}\n")

        stdout = run_cli("vio", "--vro", vro, "--imu", imu_path,
                         "--times", times_path, "--plane-mode", "rescue",
                         "--frames", str(frames_dir),
                         "--extrinsic", "identity",
                         "--out-dir", str(tmp_path / "out"))
        assert "plane=" in stdout
        n_planes = int(stdout.split("plane=")[1].split(")")[0])
        assert n_planes >= 4          # firstPlaneNode + rescue factors
        traj = read_trajectory(str(tmp_path / "out" / "trajectory.log"))
        assert len(traj.ids) == len(X)

    def test_vio_scan_engine_with_frames(self, tmp_path):
        """The fused flagship through the CLI: `vio --engine scan
        --frames` routes the plane rescue into the segmented scan engine
        (plane-mode defaults to 'rescue' with frames)."""
        from test_plane_node import simulate_frames

        log, img_times, stream, params, X, frames = simulate_frames()
        frames_dir = tmp_path / "frames"
        store = FrameStore(str(frames_dir))
        for seq, (inten, depth) in frames.items():
            store.save(seq, inten, depth)
        vro = str(tmp_path / "vro.log")
        from graph_slam_tpu.io import write_vro_log

        write_vro_log(vro, log)
        imu_path = str(tmp_path / "imu_v100.log")
        rows = np.concatenate(
            [stream.t[:, None], stream.acc, stream.gyr,
             np.zeros((len(stream.t), 3))], axis=1)
        np.savetxt(imu_path, rows)
        times_path = str(tmp_path / "timestamp.log")
        with open(times_path, "w") as f:
            for seq, t in img_times.items():
                f.write(f"{seq} {t}\n")

        stdout = run_cli("vio", "--vro", vro, "--imu", imu_path,
                         "--times", times_path, "--engine", "scan",
                         "--frames", str(frames_dir),
                         "--extrinsic", "identity",
                         "--out-dir", str(tmp_path / "out"))
        assert "plane=" in stdout
        n_planes = int(stdout.split("plane=")[1].split(")")[0])
        assert n_planes >= 2
        traj = read_trajectory(str(tmp_path / "out" / "trajectory.log"))
        assert len(traj.ids) == len(X)

    def test_g2o(self, scenario, tmp_path):
        stdout = run_cli("g2o", "--input",
                         os.path.join(GOLDENS, "sphere200_noisy.g2o"),
                         "--out-dir", str(tmp_path))
        assert "200 vertices" in stdout
        traj = read_trajectory(str(tmp_path / "trajectory.log"))
        assert len(traj.ids) == 200

    def test_g2o_sharded(self, tmp_path):
        """Multi-device optimization as a user-facing CLI feature: the
        sharded matrix-free PCG reaches the same optimum as batch LM."""
        stdout = run_cli("g2o", "--input",
                         os.path.join(GOLDENS, "sphere200_noisy.g2o"),
                         "--out-dir", str(tmp_path),
                         "--sharded", "8", "--iters", "15")
        assert "over 8 devices" in stdout
        final = float(stdout.split("-> ")[1].split(" ")[0])
        import json

        pins = json.load(open(os.path.join(GOLDENS, "chi2.json")))
        assert abs(final - pins["g2o_error"]) <= 1e-3 * pins["g2o_error"]
