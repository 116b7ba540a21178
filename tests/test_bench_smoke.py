"""Smoke-test the benchmark suite's code paths on CPU with tiny shapes.

The driver runs ``bench.py`` on real hardware at the end of every round;
a silent breakage there (an API drift, a generator bug) would only
surface then. This exercises every bench entry with shrunk constants —
numbers are meaningless on CPU, the assertions are about running at all
and converging.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench


@pytest.fixture(autouse=True)
def _shrink(monkeypatch):
    monkeypatch.setattr(bench, "N_POSES", 120)
    monkeypatch.setattr(bench, "ITERS_PER_CALL", 4)
    monkeypatch.setattr(bench, "N_CALLS", 1)
    monkeypatch.setattr(bench, "PCG_ITERS", 8)


def test_headline_path():
    from graph_slam_tpu.graph import gn_optimize, total_error

    graph, values, _ = bench._sphere()

    def call(v):
        return gn_optimize(graph, v, iterations=bench.ITERS_PER_CALL,
                           solver="pcg", damping=1e-3,
                           pcg_iters=bench.PCG_ITERS)

    dt, res = bench._chained_time(call, values, n_calls=1)
    e0 = float(total_error(graph, values))
    assert float(res.error) < e0
    assert dt > 0
    flops = bench._flops_estimate(
        gn_optimize, graph, values, iterations=bench.ITERS_PER_CALL,
        solver="pcg", damping=1e-3, pcg_iters=bench.PCG_ITERS)
    assert flops is None or flops > 0
    assert bench._structural_flops_per_gn_iter(graph, bench.PCG_ITERS) > 0


def test_vio_replay_path():
    out = bench.bench_vio_replay(n_frames=30)
    assert out["value"] > 0
    assert np.isfinite(out["chi2"])


def test_vio_planes_path():
    out = bench.bench_vio_planes(n_frames=30, fail_every=10)
    assert out["value"] > 0
    assert out["n_rescue_frames"] == 2
    assert out["n_plane_factors"] > 0
    assert np.isfinite(out["chi2"])
    assert out["host_stepped_online_fps"] > 0
    # accuracy artifact: ATE against the scenario's exact ground truth.
    # Pinned tight (round-3 verdict ask #4): the scenario is
    # deterministic and measures 0.39 mm ATE / 0.0006 deg rotation on a
    # 31 mm path (2026-08-19, CPU f64) — gate at ~2.5x those so any
    # convention drift trips it, plus the relative bound (<=2% of path).
    assert out["gt_path_length_m"] > 0
    assert out["ate_rmse_m"] < 0.02 * out["gt_path_length_m"]
    assert out["ate_rmse_m"] < 1e-3          # absolute pin, meters
    assert out["ate_rot_mean_deg"] < 0.05    # rotation-averaged alignment
    #                                          (measures 0.015 deg here)


def test_ba_schur_path(monkeypatch):
    # shrink the BA config through its module constants? the function
    # hardcodes sizes — patch make_ba_graph's call via a wrapper
    import graph_slam_tpu.datasets as ds

    orig = ds.make_ba_graph

    def small(n_poses, n_points, obs_per_point, seed, dtype, bucket):
        return orig(n_poses=8, n_points=60, obs_per_point=3, seed=seed,
                    dtype=dtype, bucket=32)

    monkeypatch.setattr(ds, "make_ba_graph", small)
    out = bench.bench_ba_schur()
    assert out["value"] > 0
    assert out["chi2_pcg"] < 0.5 * out["chi2_0"]


def test_ba_sqrt_path(monkeypatch):
    import graph_slam_tpu.datasets as ds

    orig = ds.make_ba_graph

    def small(n_poses, n_points, obs_per_point, seed, dtype, bucket):
        return orig(n_poses=8, n_points=60, obs_per_point=3, seed=seed,
                    dtype=dtype, bucket=32)

    monkeypatch.setattr(ds, "make_ba_graph", small)
    out = bench.bench_ba_sqrt()
    assert out["value"] > 0
    assert out["chi2_final"] < 0.1 * out["chi2_0"]
    assert out["mfu_pct"] >= 0


def test_chordal_path():
    out = bench.bench_chordal()
    assert out["value"] > 0
    assert out["chi2_chordal"] <= 1.05 * max(out["chi2_gn200"], 1e-12)


def test_banded_direct_path():
    out = bench.bench_banded_direct()
    assert out["value"] > 0
    assert out["chi2"] >= 0


def test_relay_probe():
    ms = bench._relay_probe_ms(n=3)
    assert 0 <= ms < 60000
