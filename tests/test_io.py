"""IO round-trip tests: VRO log, trajectory, PLY, g2o (reference formats)."""

import numpy as np

import np_lie
from graph_slam_tpu.io import (
    FAILED_INFO_SENTINEL,
    VROLog,
    read_g2o,
    read_trajectory,
    read_vro_log,
    write_g2o,
    write_ply_points,
    write_trajectory,
    write_vro_log,
)
import pytest

pytestmark = pytest.mark.fast


def _random_log(n=20, seed=0):
    r = np.random.default_rng(seed)
    id_to = np.arange(1, n + 1)
    id_from = np.arange(0, n)
    xi = r.normal(size=(n, 6)) * 0.2
    infos = []
    for k in range(n):
        A = r.normal(size=(6, 6))
        infos.append(A @ A.T + 6 * np.eye(6))
    info = np.stack(infos)
    # one failed edge
    info[5] = np.eye(6) * FAILED_INFO_SENTINEL
    xi[5] = 0
    return VROLog(id_to, id_from, xi, info)


class TestVROLog:
    def test_roundtrip(self, tmp_path):
        log = _random_log()
        p = str(tmp_path / "vro.log")
        write_vro_log(p, log)
        back = read_vro_log(p)
        assert len(back) == len(log)
        np.testing.assert_array_equal(back.id_to, log.id_to)
        np.testing.assert_array_equal(back.id_from, log.id_from)
        np.testing.assert_allclose(back.xi, log.xi, rtol=0, atol=0)
        np.testing.assert_allclose(back.info, log.info, rtol=0, atol=0)

    def test_sentinel_mask(self, tmp_path):
        log = _random_log()
        p = str(tmp_path / "vro.log")
        write_vro_log(p, log)
        back = read_vro_log(p)
        valid = back.valid
        assert not valid[5]
        assert valid.sum() == len(log) - 1

    def test_info_symmetry(self, tmp_path):
        log = _random_log(seed=3)
        p = str(tmp_path / "vro.log")
        write_vro_log(p, log)
        back = read_vro_log(p)
        np.testing.assert_allclose(back.info, np.swapaxes(back.info, 1, 2))


class TestTrajectory:
    def test_roundtrip(self, tmp_path):
        r = np.random.default_rng(1)
        n = 15
        t = r.normal(size=(n, 3))
        q = r.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        ids = np.arange(n)
        seq = ids * 2 + 1
        p = str(tmp_path / "traj.log")
        write_trajectory(p, ids, t, q, seq)
        back = read_trajectory(p)
        np.testing.assert_array_equal(back.ids, ids)
        np.testing.assert_allclose(back.t, t)
        np.testing.assert_allclose(back.quat, q)
        np.testing.assert_array_equal(back.seq, seq)

    def test_ply_header(self, tmp_path):
        p = str(tmp_path / "pts.ply")
        write_ply_points(p, np.zeros((3, 3)), (255, 0, 0))
        lines = open(p).read().splitlines()
        assert lines[0] == "ply"
        assert "element vertex 3" in lines
        assert lines[-4] == "end_header"


class TestG2O:
    def test_roundtrip(self, tmp_path):
        r = np.random.default_rng(2)
        n = 6
        t = r.normal(size=(n, 3))
        q = r.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1
        edges = []
        for k in range(n - 1):
            A = r.normal(size=(6, 6))
            info = A @ A.T + 6 * np.eye(6)
            qe = r.normal(size=4)
            qe /= np.linalg.norm(qe)
            if qe[0] < 0:
                qe = -qe
            edges.append((k, k + 1, r.normal(size=3), qe, info))
        p = str(tmp_path / "graph.g2o")
        write_g2o(p, t, q, edges)
        verts, back_edges = read_g2o(p)
        assert len(verts) == n and len(back_edges) == n - 1
        for k in range(n):
            np.testing.assert_allclose(verts[k][0], t[k])
            np.testing.assert_allclose(verts[k][1], q[k])
        for (e0, e1) in zip(edges, back_edges):
            assert e0[0] == e1[0] and e0[1] == e1[1]
            np.testing.assert_allclose(e0[2], e1[2])
            np.testing.assert_allclose(e0[3], e1[3])
            np.testing.assert_allclose(e0[4], e1[4])
