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
