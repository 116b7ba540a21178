"""Global place recognition: loop-closure proposals beyond the lookback
window (vision/place.py — no reference counterpart; the reference only
matches the last 5-7 keyframes, gtsam_graph.cpp:1716-1753)."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_pipelines2 import render_wall_frame

from graph_slam_tpu.config import SR4000, SlamParams
from graph_slam_tpu.pipelines import OnlineSlam
from graph_slam_tpu.vision import extract_features
from graph_slam_tpu.vision.place import PlaceIndex, global_descriptor


def _frame(x, seed=0):
    img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]),
                                   seed=seed)
    return extract_features(SR4000, jnp.asarray(img), jnp.asarray(depth),
                            max_features=128)


class TestGlobalDescriptor:
    def test_same_place_beats_different_place(self):
        g_a = np.asarray(global_descriptor(_frame(0.0)))
        g_a2 = np.asarray(global_descriptor(_frame(0.02)))   # tiny shift
        g_b = np.asarray(global_descriptor(_frame(0.0, seed=5)))  # new scene
        assert np.linalg.norm(g_a) == pytest.approx(1.0, abs=1e-5)
        assert g_a @ g_a2 > g_a @ g_b + 0.05

    def test_index_query_ranks_revisit_first(self):
        idx = PlaceIndex()
        xs = [0.0, 0.4, 0.8, 1.2]
        for x in xs:
            idx.add(_frame(x))
        ids, sims = idx.query(_frame(0.02), top_k=2)
        assert ids[0] == 0
        assert sims[0] > sims[-1] - 1e-9
        # max_id excludes recent rows
        ids2, _ = idx.query(_frame(0.02), top_k=4, max_id=2)
        assert set(ids2.tolist()) <= {0, 1}
        # empty when nothing is old enough
        ids3, _ = idx.query(_frame(0.02), top_k=2, max_id=0)
        assert len(ids3) == 0


def test_online_slam_global_loop_closure():
    """A revisit after an excursion longer than the lookback window gets a
    loop-closure edge only through the global tier."""
    params = SlamParams(lookback_nodes=2, optimize_step=100,
                        small_translation=0.05)
    slam = OnlineSlam(cam=SR4000, params=params, max_features=128,
                      min_inliers=10, initial_pose_cap=16,
                      global_loop_k=2, global_loop_min_gap=4)
    xs = [0.0, 0.2, 0.4, 0.6, 0.8, 0.6, 0.4, 0.2, 0.0]
    for k, x in enumerate(xs):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        slam.process_frame(img, depth, seq_id=k)
    assert slam.num_keyframes == len(xs)

    bt = slam.og.graph.between
    act = np.asarray(bt.active)
    gaps = np.asarray(bt.j)[act] - np.asarray(bt.i)[act]
    assert gaps.max() >= 4, "no long-range loop closure was added"

    # the long-range edges tie the revisit to the original pose
    slam.optimize()
    t0 = np.asarray(slam.og.pose(0).t)
    t8 = np.asarray(slam.og.pose(8).t)
    assert np.linalg.norm(t8 - t0) < 0.05


def test_global_tier_off_by_default():
    slam = OnlineSlam(cam=SR4000, params=SlamParams())
    assert slam._places is None
