"""Native IO runtime tests: C parser/writer/loader vs Python fallback."""

import numpy as np
import pytest

from graph_slam_tpu import native
from graph_slam_tpu.io import VROLog, read_vro_log, write_vro_log
from graph_slam_tpu.io.frames import FrameStore, load_frame, save_frame


def _log(n=50, seed=0):
    r = np.random.default_rng(seed)
    infos = []
    for _ in range(n):
        A = r.normal(size=(6, 6))
        infos.append(A @ A.T + 6 * np.eye(6))
    return VROLog(np.arange(1, n + 1), np.arange(n),
                  r.normal(size=(n, 6)), np.stack(infos))


class TestNativeVroParser:
    def test_native_available(self):
        assert native.available(), "g++ build of gst_native failed"

    def test_native_matches_python(self, tmp_path):
        log = _log()
        p = str(tmp_path / "vro.log")
        write_vro_log(p, log)

        rows = native.parse_vro_log(p)
        assert rows is not None and len(rows) == len(log)

        # full reader (uses native fast path)
        back = read_vro_log(p)
        np.testing.assert_array_equal(back.id_to, log.id_to)
        np.testing.assert_array_equal(back.id_from, log.id_from)
        np.testing.assert_allclose(back.xi, log.xi, rtol=0, atol=0)
        np.testing.assert_allclose(back.info, log.info, rtol=0, atol=0)

    def test_native_writer_roundtrip(self, tmp_path):
        log = _log(seed=1)
        rows = np.zeros((len(log), 29))
        rows[:, 0] = log.id_to
        rows[:, 1] = log.id_from
        rows[:, 2:8] = log.xi
        iu = np.triu_indices(6)
        rows[:, 8:] = log.info[:, iu[0], iu[1]]
        p = str(tmp_path / "native.log")
        assert native.write_vro_log(p, rows)
        back = read_vro_log(p)
        np.testing.assert_allclose(back.xi, log.xi)
        np.testing.assert_allclose(back.info, log.info)


class TestFrameStore:
    def test_frame_roundtrip(self, tmp_path):
        r = np.random.default_rng(2)
        inten = r.uniform(0, 255, (32, 40)).astype(np.float32)
        depth = r.uniform(0.5, 4.0, (32, 40)).astype(np.float32)
        p = str(tmp_path / "f.gsf")
        save_frame(p, inten, depth)
        i2, d2 = load_frame(p)
        np.testing.assert_allclose(i2, np.floor(inten + 0.0).astype(int),
                                   atol=1.0)
        np.testing.assert_allclose(d2, depth, atol=1e-3)

    def test_batch_loader(self, tmp_path):
        store = FrameStore(str(tmp_path))
        r = np.random.default_rng(3)
        h, w = 24, 30
        frames = []
        for s in range(5):
            inten = r.uniform(0, 255, (h, w))
            depth = r.uniform(0.5, 4.0, (h, w))
            store.save(s, inten, depth)
            frames.append((inten, depth))
        intens, depths = store.load_batch(range(5), w, h)
        assert intens.shape == (5, h, w)
        for s in range(5):
            np.testing.assert_allclose(intens[s], np.asarray(
                frames[s][0], np.uint16).astype(np.float32), atol=1.0)
            np.testing.assert_allclose(depths[s], frames[s][1], atol=1e-3)

    def test_missing_frame_returns_none(self, tmp_path):
        store = FrameStore(str(tmp_path))
        assert store(99) is None


class TestNativeCloudWriter:
    """native.write_cloud_ascii (savePCDFile / ASCII-PLY role): the
    native body writer and the Python fallback must produce equivalent,
    f32-exact files (round-4 native-runtime addition)."""

    def _cloud(self, n=2000, seed=0):
        r = np.random.default_rng(seed)
        return (r.normal(size=(n, 3)).astype(np.float32),
                r.integers(0, 255, (n, 3)).astype(np.uint8))

    def test_pcd_roundtrip_both_paths(self, tmp_path, monkeypatch):
        from graph_slam_tpu.mapping import read_pcd, write_pcd

        pts, cols = self._cloud()
        p_nat = str(tmp_path / "nat.pcd")
        write_pcd(p_nat, pts, cols)
        b, c = read_pcd(p_nat)
        np.testing.assert_array_equal(np.float32(b), pts)
        np.testing.assert_array_equal(c, cols)

        # force the Python fallback; parsed contents must agree f32-exactly
        monkeypatch.setattr(native, "write_cloud_ascii",
                            lambda *a, **k: False)
        p_py = str(tmp_path / "py.pcd")
        write_pcd(p_py, pts, cols)
        b2, c2 = read_pcd(p_py)
        np.testing.assert_array_equal(np.float32(b2), np.float32(b))
        np.testing.assert_array_equal(c2, c)

    def test_ply_rows_and_header(self, tmp_path, monkeypatch):
        from graph_slam_tpu.io import write_ply_points

        pts, cols = self._cloud(n=123, seed=1)
        p = str(tmp_path / "a.ply")
        write_ply_points(p, pts, cols)
        lines = open(p).read().splitlines()
        assert lines[0] == "ply" and "end_header" in lines
        body = lines[lines.index("end_header") + 1:]
        assert len(body) == 123
        first = body[0].split()
        np.testing.assert_array_equal(
            np.float32(first[:3]), pts[0])
        assert [int(x) for x in first[3:]] == list(cols[0])

    def test_pcd_without_colors(self, tmp_path):
        from graph_slam_tpu.mapping import read_pcd, write_pcd

        pts, _ = self._cloud(n=57, seed=2)
        p = str(tmp_path / "xyz.pcd")
        write_pcd(p, pts)
        b, c = read_pcd(p)
        np.testing.assert_array_equal(np.float32(b), pts)
        assert c is None


class TestNativeTableParser:
    """native.parse_table (readTraj / readImuData roles): line-based
    numeric-table parse must match the Python readers exactly."""

    def test_trajectory_roundtrip_both_paths(self, tmp_path, monkeypatch):
        from graph_slam_tpu.io import read_trajectory, write_trajectory

        r = np.random.default_rng(4)
        n = 64
        t = r.normal(size=(n, 3))
        q = r.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)   # stored wxyz
        ids = np.arange(n)
        seq = np.arange(0, 2 * n, 2)
        p = str(tmp_path / "traj.log")
        write_trajectory(p, ids, t, q, seq)

        nat = read_trajectory(p)
        monkeypatch.setattr(native, "parse_table", lambda *a, **k: None)
        py = read_trajectory(p)
        np.testing.assert_array_equal(nat.ids, py.ids)
        np.testing.assert_array_equal(nat.t, py.t)
        np.testing.assert_array_equal(nat.quat, py.quat)
        np.testing.assert_array_equal(nat.seq, py.seq)
        np.testing.assert_allclose(nat.t, t, rtol=0, atol=0)
        np.testing.assert_allclose(nat.quat, q, rtol=0, atol=0)

    def test_skips_short_and_comment_lines(self, tmp_path):
        p = str(tmp_path / "t.txt")
        with open(p, "w") as f:
            f.write("# a comment line\n")
            f.write("1 2 3\n")            # short: skipped
            f.write("1 2 3 4 5\n")
            f.write("\n")
            f.write("6 7 8 9 10 extra-text\n")   # first 5 numbers taken
        rows = native.parse_table(p, 5)
        assert rows is not None
        np.testing.assert_array_equal(
            rows, [[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]])

    def test_imu_log_parity_with_loadtxt(self, tmp_path, monkeypatch):
        from graph_slam_tpu.imu import read_mems_log, read_vn100_log

        r = np.random.default_rng(5)
        vn = r.normal(size=(40, 10))
        p = str(tmp_path / "vn100.log")
        np.savetxt(p, vn)
        s_nat = read_vn100_log(p)

        mems = np.column_stack([np.arange(30) % 16,
                                r.integers(-500, 500, (30, 6))])
        pm = str(tmp_path / "mems.log")
        np.savetxt(pm, mems)
        m_nat = read_mems_log(pm)

        monkeypatch.setattr(native, "parse_table", lambda *a, **k: None)
        s_py = read_vn100_log(p)
        m_py = read_mems_log(pm)
        for a, b in [(s_nat.t, s_py.t), (s_nat.acc, s_py.acc),
                     (s_nat.gyr, s_py.gyr), (s_nat.rpy, s_py.rpy),
                     (m_nat.acc, m_py.acc), (m_nat.gyr, m_py.gyr)]:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert m_nat.start == m_py.start


def test_stale_so_missing_symbol_degrades_to_fallback(monkeypatch):
    """A cached .so predating a newly added symbol must degrade to the
    Python fallbacks, not crash every IO path with AttributeError
    (round-4 review: mtime-preserving installs defeat the freshness
    check in _build)."""
    import ctypes

    class StaleLib:
        def __getattr__(self, name):
            raise AttributeError(name)

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(ctypes, "CDLL", lambda path: StaleLib())
    assert native._load() is False
    assert native.available() is False
    # and the public reader still works through the Python fallback
    assert native.parse_vro_log("/nonexistent") is None
