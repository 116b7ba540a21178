"""Whole-replay-on-device VIO engine (``VioConfig(engine="scan")``).

The scan engine compiles the entire sequential replay — per-frame IMU
preintegration, prediction, gating, row writes, periodic fixed-lag
optimization, bias/state feedback — into ONE device program. It must
reproduce the per-frame online engine's estimates on the same log
(identical operations, different execution schedule).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_slam_tpu.core import se3
from graph_slam_tpu.imu import (
    ImuStream,
    init_preint,
    integrate_segment,
    predict_navstate,
    vn100_params,
)
from graph_slam_tpu.io.vro_log import VROLog, failed_edge
from graph_slam_tpu.pipelines.vio import VioConfig, run_vio


def synth_sequence(n_frames=40, per=15, seed=0, fail_at=(17,),
                   loop_pairs=((30, 10),)):
    """IMU-consistent trajectory + VRO log with failures and loop closures."""
    r = np.random.default_rng(seed)
    params = vn100_params()
    dt = 1.0 / 200.0
    n_meas = n_frames * per + 10
    acc = (r.normal(size=(n_meas, 3)) * 0.05 - np.asarray(params.gravity))
    gyr = r.normal(size=(n_meas, 3)) * 0.05
    for k in range(1, n_meas):
        acc[k] = 0.9 * acc[k - 1] + 0.1 * acc[k]
        gyr[k] = 0.9 * gyr[k - 1] + 0.1 * gyr[k]
    stream = ImuStream(t=np.arange(n_meas) * dt, acc=acc, gyr=gyr, dt=dt)
    X, V = [se3.identity()], [jnp.zeros(3)]
    for f in range(1, n_frames):
        st = integrate_segment(init_preint(jnp.zeros(6), params),
                               jnp.asarray(acc[(f - 1) * per:f * per]),
                               jnp.asarray(gyr[(f - 1) * per:f * per]),
                               jnp.full(per, dt), params)
        Xj, vj = predict_navstate(st, X[-1], V[-1], jnp.zeros(6),
                                  params.gravity)
        X.append(Xj)
        V.append(vj)
    info = np.diag([8e3] * 3 + [2500.0] * 3)
    id2, id1, xi, infos = [], [], [], []
    for f in range(1, n_frames):
        if f in fail_at:
            a, b, x, inf = failed_edge(f, f - 1)
            id2.append(a); id1.append(b); xi.append(x); infos.append(inf)
        else:
            id2.append(f); id1.append(f - 1)
            xi.append(np.asarray(se3.logmap(se3.between(X[f - 1], X[f]))))
            infos.append(info)
        for (j, i) in loop_pairs:
            if j == f:
                id2.append(j); id1.append(i)
                xi.append(np.asarray(se3.logmap(se3.between(X[i], X[j]))))
                infos.append(info)
    log = VROLog(np.asarray(id2), np.asarray(id1), np.stack(xi),
                 np.stack(infos))
    times = {f: f * per * dt for f in range(n_frames)}
    return log, times, stream, params, X


@pytest.mark.parametrize("window", [None, 12])
def test_scan_matches_online_engine(window):
    log, times, stream, params, X = synth_sequence()
    kw = dict(plane_mode="off", optimize_step=10, max_imu_window=32,
              bucket=64, final_batch=True, window=window)
    res_scan = run_vio(log, dict(times), stream, params,
                       cfg=VioConfig(engine="scan", **kw))
    res_onl = run_vio(log, dict(times), stream, params,
                      cfg=VioConfig(engine="online", **kw))
    assert res_scan.n_imu_factors == res_onl.n_imu_factors
    assert res_scan.n_vo_edges == res_onl.n_vo_edges
    n = len(res_scan.seq_ids)
    np.testing.assert_allclose(np.asarray(res_scan.values.pose_t[:n]),
                               np.asarray(res_onl.values.pose_t[:n]),
                               atol=1e-8)
    assert abs(res_scan.error - res_onl.error) <= 1e-8 * max(1.0,
                                                             res_onl.error)


def test_scan_accuracy_against_ground_truth():
    # default scenario + window=12: identical padded table shapes to
    # test_scan_matches_online_engine[12], so the compiled replay program
    # is reused (optimize_step is data, not a compile key)
    log, times, stream, params, X = synth_sequence()
    cfg = VioConfig(engine="scan", plane_mode="off", optimize_step=5,
                    max_imu_window=32, bucket=64, window=12,
                    final_batch=True)
    res = run_vio(log, times, stream, params, cfg=cfg)
    gt_t = np.stack([np.asarray(x.t) for x in X])
    n = len(res.seq_ids)
    err = np.linalg.norm(np.asarray(res.values.pose_t[:n]) - gt_t[:n],
                         axis=1)
    assert float(err.mean()) < 0.02, float(err.mean())
    assert res.error < 1.0


def test_scan_failed_edge_is_inactive_and_imu_carries():
    # keep the default loop pair so the record count (and thus the padded
    # table shapes keying the compiled replay) matches the other tests
    log, times, stream, params, X = synth_sequence(fail_at=(5,))
    cfg = VioConfig(engine="scan", plane_mode="off", optimize_step=10,
                    max_imu_window=32, bucket=64, final_batch=False)
    res = run_vio(log, times, stream, params, cfg=cfg)
    # one VO edge lost to the sentinel (the loop closure adds one back),
    # every frame still has an IMU factor
    assert res.n_vo_edges == len(res.seq_ids) - 1
    assert res.n_imu_factors == len(res.seq_ids) - 1
    # the pose at the failed frame comes from the IMU prediction: near GT
    gt_t = np.stack([np.asarray(x.t) for x in X])
    d = np.linalg.norm(np.asarray(res.values.pose_t[5]) - gt_t[5])
    assert d < 0.05, d


def test_scan_chunked_matches_monolithic():
    """Chunked dispatch (padded no-op records, carried feedback state)
    must be bit-equivalent to the single-scan replay."""
    log, times, stream, params, X = synth_sequence(n_frames=40)
    kw = dict(engine="scan", plane_mode="off", optimize_step=10,
              max_imu_window=32, bucket=64, window=12, final_batch=False)
    res_mono = run_vio(log, dict(times), stream, params,
                       cfg=VioConfig(scan_chunk=4096, **kw))
    res_chunk = run_vio(log, dict(times), stream, params,
                        cfg=VioConfig(scan_chunk=7, **kw))
    n = len(res_mono.seq_ids)
    np.testing.assert_array_equal(np.asarray(res_chunk.values.pose_t[:n]),
                                  np.asarray(res_mono.values.pose_t[:n]))
    assert res_chunk.error == res_mono.error
    assert res_chunk.n_vo_edges == res_mono.n_vo_edges


def test_scan_failed_loop_closure_parity():
    """A sentinel-FAILED loop closure must be skipped entirely (no row, no
    optimize-cadence trigger), exactly like the per-frame engines — a
    divergence here shifted the optimize schedule by one record."""
    # default frame count/loop pair: the appended FAILED loop closure is
    # skipped from the record list, so the padded table shapes match the
    # other tests' and the compiled replay is reused
    log, times, stream, params, X = synth_sequence(fail_at=())
    # append a failed loop closure right at an optimize boundary
    from graph_slam_tpu.io.vro_log import failed_edge
    a, b, x, inf = failed_edge(19, 9)
    log = VROLog(np.append(log.id_to, a), np.append(log.id_from, b),
                 np.vstack([log.xi, x]), np.vstack([log.info, inf[None]]))
    order = np.argsort(log.id_to, kind="stable")
    log = VROLog(log.id_to[order], log.id_from[order], log.xi[order],
                 log.info[order])
    kw = dict(plane_mode="off", optimize_step=10, max_imu_window=32,
              bucket=64, final_batch=False)
    res_scan = run_vio(log, dict(times), stream, params,
                       cfg=VioConfig(engine="scan", **kw))
    res_onl = run_vio(log, dict(times), stream, params,
                      cfg=VioConfig(engine="online", **kw))
    n = len(res_scan.seq_ids)
    np.testing.assert_allclose(np.asarray(res_scan.values.pose_t[:n]),
                               np.asarray(res_onl.values.pose_t[:n]),
                               atol=1e-9)
    assert res_scan.n_vo_edges == res_onl.n_vo_edges


def test_scan_empty_imu_window_stays_finite():
    """Non-advancing image timestamps give a frame an EMPTY measurement
    window; the preintegration covariance must stay nonsingular (a
    zero-motion step) instead of poisoning the replay with NaN."""
    log, times, stream, params, X = synth_sequence(n_frames=8,
                                                   loop_pairs=(),
                                                   fail_at=())
    times = dict(times)
    times[4] = times[3]   # duplicate timestamp -> empty window for frame 4
    for eng in ("scan", "online"):
        res = run_vio(log, dict(times), stream, params,
                      cfg=VioConfig(engine=eng, plane_mode="off",
                                    optimize_step=4, max_imu_window=32,
                                    bucket=64, final_batch=False))
        assert np.isfinite(res.error), (eng, res.error)
        assert np.isfinite(np.asarray(res.values.pose_t[:8])).all(), eng


def test_nonadjacent_recovery_edge_semantics():
    """A new frame tracked against an OLDER keyframe (id_from several
    frames back): the VO between-factor must connect the matched pair and
    the initial estimate compose from the matched node's pose
    (gtsam_graph.cpp:655-668), while the IMU factor always connects
    consecutive frames (test_vro_imu_graph.cpp:191-196) — on both engines.
    """
    log, times, stream, params, X = synth_sequence(n_frames=12,
                                                   loop_pairs=(),
                                                   fail_at=())
    # rewrite the 8->9 odometry edge as a 5->9 recovery edge with the
    # ground-truth relative transform
    idx = 8  # row creating frame 9
    assert int(log.id_to[idx]) == 9
    id_from = np.array(log.id_from)
    id_from[idx] = 5
    xi = np.array(log.xi)
    xi[idx] = np.asarray(se3.logmap(se3.between(X[5], X[9])))
    log = VROLog(log.id_to, id_from, xi, log.info)
    kw = dict(plane_mode="off", optimize_step=100, max_imu_window=32,
              bucket=64, final_batch=False)
    results = {}
    for eng in ("scan", "online"):
        res = run_vio(log, dict(times), stream, params,
                      cfg=VioConfig(engine=eng, **kw))
        g = res.graph
        active = np.asarray(g.between.active)
        i_arr = np.asarray(g.between.i)[active]
        j_arr = np.asarray(g.between.j)[active]
        # the recovery edge connects (5, 9), not (8, 9)
        assert ((i_arr == 5) & (j_arr == 9)).any(), (eng, i_arr, j_arr)
        assert not ((i_arr == 8) & (j_arr == 9)).any(), eng
        # the IMU chain stays consecutive
        imu_act = np.asarray(g.imu.active)
        ii = np.asarray(g.imu.i)[imu_act]
        jj = np.asarray(g.imu.j)[imu_act]
        np.testing.assert_array_equal(jj - ii, 1)
        results[eng] = np.asarray(res.values.pose_t[:12])
    np.testing.assert_allclose(results["scan"], results["online"],
                               atol=1e-8)
    # estimates stay near ground truth (the estimate composed from the
    # matched node, so frame 9 is consistent)
    gt = np.stack([np.asarray(x.t) for x in X])
    assert np.linalg.norm(results["scan"] - gt, axis=1).max() < 0.05


def test_scan_rejects_always_plane_mode():
    """'rescue' is now a first-class scan mode (see test_scan_rescue.py);
    'always' — planes on every frame — still requires the online engine."""
    log, times, stream, params, _ = synth_sequence(n_frames=6,
                                                   loop_pairs=())
    with pytest.raises(ValueError, match="always"):
        run_vio(log, times, stream, params,
                cfg=VioConfig(engine="scan", plane_mode="always"))
