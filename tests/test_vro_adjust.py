"""Guided re-matching under a predicted transform (vroAdjust, VERDICT #7).

Renders textured-wall frame pairs, then:
- ``match_under_prior`` recovers the relative transform through the
  geometric gate (including where unguided matching is ambiguous);
- ``refine_edge_ba`` chains guided matching into two-frame BA
  (matchNodePairBA -> bundleAdjust, gtsam_graph.cpp:450-610);
- ``convert_vo2ba(mode="ba")`` runs self-contained via ``make_ba_fn``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from test_pipelines2 import render_wall_frame
from graph_slam_tpu.config import SR4000
from graph_slam_tpu.core import se3
from graph_slam_tpu.io.vro_log import VROLog
from graph_slam_tpu.tools import convert_vo2ba
from graph_slam_tpu.vision.features import extract_features
from graph_slam_tpu.vision.frontend import (
    make_ba_fn,
    match_under_prior,
    refine_edge_ba,
)

import dataclasses

# render_wall_frame is pure pinhole; zero the SR4000 distortion so the BA
# projection model matches the renderer
K = dataclasses.replace(SR4000, k1=0.0, k2=0.0)


def frame_pair(dx=0.15, seed=0):
    i0, d0 = render_wall_frame(K, np.array([0.0, 0.0, 0.0]), seed=seed)
    i1, d1 = render_wall_frame(K, np.array([dx, 0.0, 0.0]), seed=seed)
    f0 = extract_features(K, jnp.asarray(i0), jnp.asarray(d0))
    f1 = extract_features(K, jnp.asarray(i1), jnp.asarray(d1))
    return f0, f1


class TestMatchUnderPrior:
    def test_recovers_translation(self):
        f0, f1 = frame_pair(dx=0.15)
        # prior: roughly the true transform (frame 1 in frame 0: +x 0.15)
        T0 = (jnp.eye(3), jnp.array([0.13, 0.0, 0.0]))
        R, t, info, inl, nn, ok = match_under_prior(
            jax.random.PRNGKey(0), f0, f1, T0)
        assert bool(ok)
        t = np.asarray(t)
        assert abs(t[0] - 0.15) < 0.02, t
        assert abs(t[1]) < 0.02 and abs(t[2]) < 0.02
        # rotation near identity
        assert float(np.trace(np.asarray(R))) > 2.99

    def test_gate_rejects_wrong_prior(self):
        """A wildly wrong prior empties the gate -> match must fail rather
        than hallucinate a transform."""
        f0, f1 = frame_pair(dx=0.15)
        T_bad = (jnp.eye(3), jnp.array([3.0, 0.0, 0.0]))
        *_, ok = match_under_prior(jax.random.PRNGKey(0), f0, f1, T_bad,
                                   radius=0.05)
        assert not bool(ok)


class TestRefineEdgeBa:
    def test_ba_refines_pose_with_information(self):
        f0, f1 = frame_pair(dx=0.12)
        out = refine_edge_ba(jax.random.PRNGKey(1), f0, f1,
                             (jnp.eye(3), jnp.array([0.10, 0.0, 0.0])), K)
        assert out is not None
        (R, t), info, chi2 = out
        assert abs(t[0] - 0.12) < 0.02, t
        ev = np.linalg.eigvalsh(info)
        assert ev.min() > 0           # PSD information from pose marginal


class TestSparseAreaSelfContained:
    def test_add_vo_at_sparse_area_with_frame_matcher(self):
        """add_vo_at_sparse_area validated by the batched RANSAC matcher —
        self-contained from raw frames (add_vo_at_sparse_area.cpp role)."""
        from graph_slam_tpu.io.vro_log import VROLog
        from graph_slam_tpu.tools import (
            add_vo_at_sparse_area,
            make_frame_matcher,
        )

        xs = [0.0, 0.06, 0.12, 0.18, 0.24]
        frames = {k: render_wall_frame(K, np.array([x, 0.0, 0.0]))
                  for k, x in enumerate(xs)}
        info = np.diag([8e3] * 3 + [4e3] * 3)
        rows = []
        for k in range(1, 5):
            T = se3.Pose(jnp.eye(3),
                         jnp.array([xs[k] - xs[k - 1], 0.0, 0.0]))
            rows.append((k, k - 1, np.asarray(se3.logmap(T)), info))
        log = VROLog(np.asarray([r[0] for r in rows]),
                     np.asarray([r[1] for r in rows]),
                     np.stack([r[2] for r in rows]),
                     np.stack([r[3] for r in rows]))
        # frame 2 declared feature-sparse -> extra edges proposed around it
        counts = {0: 200, 1: 200, 2: 10, 3: 200, 4: 200}
        out = add_vo_at_sparse_area(log, counts,
                                    make_frame_matcher(frames.get, K),
                                    window=2, sparse_thresh=60)
        assert len(out) > len(log)
        # the appended edges recover the true relative translation
        for k in range(len(log), len(out)):
            T = se3.expmap(jnp.asarray(out.xi[k]))
            expect = xs[int(out.id_to[k])] - xs[int(out.id_from[k])]
            assert abs(float(T.t[0]) - expect) < 0.02


class TestHeadlessViewers:
    def test_registration_overlay_and_image_grid(self, tmp_path):
        from graph_slam_tpu.mapping import (
            write_image_grid,
            write_registration_ply,
        )

        f0 = render_wall_frame(K, np.array([0.0, 0.0, 0.0]))
        f1 = render_wall_frame(K, np.array([0.15, 0.0, 0.0]))
        T = se3.Pose(jnp.eye(3), jnp.array([0.15, 0.0, 0.0]))
        ply = str(tmp_path / "reg.ply")
        n = write_registration_ply(ply, K, f0, f1, T)
        assert n > 1000
        lines = open(ply).read().splitlines()
        assert lines[0] == "ply"
        assert any("230 60 60" in ln for ln in lines[-n:])

        png = str(tmp_path / "grid.png")
        shape = write_image_grid(png, [f0[0], f1[0], f0[1], f1[1]], cols=2)
        assert os.path.getsize(png) > 500
        assert shape[0] >= 2 * K.height


class TestConvertVo2BaSelfContained:
    def test_ba_mode_end_to_end(self):
        xs = [0.0, 0.12, 0.24]
        frames = {k: render_wall_frame(K, np.array([x, 0.0, 0.0]))
                  for k, x in enumerate(xs)}
        info = np.diag([1e4] * 3 + [4e3] * 3)
        rows = []
        for k in range(1, 3):
            T = se3.Pose(jnp.eye(3),
                         jnp.array([xs[k] - xs[k - 1] + 0.02, 0.0, 0.0]))
            rows.append((k, k - 1, np.asarray(se3.logmap(T)), info))
        log = VROLog(np.asarray([r[0] for r in rows]),
                     np.asarray([r[1] for r in rows]),
                     np.stack([r[2] for r in rows]),
                     np.stack([r[3] for r in rows]))
        out = convert_vo2ba(log, "ba", ba_fn=make_ba_fn(frames.get, K))
        assert out.valid.all()
        # BA pulls the (deliberately 2 cm off) logged edges back to truth
        for k in range(2):
            T = se3.expmap(jnp.asarray(out.xi[k]))
            assert abs(float(T.t[0]) - 0.12) < 0.02, np.asarray(T.t)
