"""TSDF fusion + marching tetrahedra (mapping/tsdf.py — volumetric
upgrade over the reference's point-accumulation mapping tier,
mapping_PCD.cpp / pcd2mesh.cpp)."""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.config import CameraIntrinsics
from graph_slam_tpu.mapping.tsdf import (
    TsdfVolume,
    extract_mesh,
    fuse_trajectory,
    integrate,
    make_volume,
)

K = CameraIntrinsics(fx=200.0, fy=200.0, cx=80.0, cy=60.0,
                     width=160, height=120)


def _sphere_volume(n=48, r=0.6, trunc=0.2):
    vol = make_volume(origin=(-1, -1, -1), size_m=2.0, n=n)
    idx = (np.arange(n) + 0.5) * float(vol.voxel)
    X, Y, Z = np.meshgrid(idx - 1, idx - 1, idx - 1, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r
    return vol._replace(
        tsdf=jnp.asarray(np.clip(sdf / trunc, -1, 1), jnp.float32),
        weight=jnp.ones((n, n, n), jnp.float32))


class TestMarchingTetrahedra:
    def test_sphere_isosurface(self):
        """Extracted vertices lie on the analytic sphere to sub-voxel."""
        V, F = extract_mesh(_sphere_volume())
        assert len(V) > 1000 and len(F) > 2000
        rad = np.linalg.norm(V, axis=1)
        assert abs(rad.mean() - 0.6) < 2e-3
        assert np.abs(rad - 0.6).max() < 0.01
        assert F.max() < len(V)
        # no degenerate faces
        assert (F[:, 0] != F[:, 1]).all()

    def test_unobserved_region_is_skipped(self):
        vol = _sphere_volume()
        # mark half the grid unobserved; the surface there must vanish
        w = np.asarray(vol.weight).copy()
        w[:24] = 0.0
        V, _ = extract_mesh(vol._replace(weight=jnp.asarray(w)))
        assert (V[:, 0] > -0.05).all()

    def test_empty_volume(self):
        vol = make_volume(origin=(0, 0, 0), size_m=1.0, n=8)
        V, F = extract_mesh(vol)
        assert len(V) == 0 and len(F) == 0


class TestIntegrate:
    def test_flat_wall_fuses_at_depth(self):
        depth = np.full((120, 160), 1.5, np.float32)
        vol = make_volume(origin=(-1.0, -1.0, 0.0), size_m=2.0, n=64)
        R = jnp.eye(3)
        for dx in (0.0, 0.05, -0.05):
            vol = integrate(vol, K, jnp.asarray(depth), R,
                            jnp.asarray([dx, 0.0, 0.0]))
        V, F = extract_mesh(vol)
        assert len(F) > 1000
        np.testing.assert_allclose(V[:, 2], 1.5, atol=1e-3)
        # weights accumulate where the views overlap, capped elsewhere
        w = np.asarray(vol.weight)
        assert w.max() == 3.0

    def test_noise_averages_out(self):
        """Fusing noisy depth beats any single frame's surface jitter."""
        rng = np.random.default_rng(0)
        vol = make_volume(origin=(-1.0, -1.0, 0.0), size_m=2.0, n=64)
        R = jnp.eye(3)
        t = jnp.zeros(3)
        for _ in range(16):
            depth = (1.5 + rng.normal(0, 0.03, (120, 160))).astype(
                np.float32)
            vol = integrate(vol, K, jnp.asarray(depth), R, t)
        V, _ = extract_mesh(vol, min_weight=8.0)
        assert len(V) > 100
        assert abs(np.mean(V[:, 2]) - 1.5) < 5e-3
        assert np.std(V[:, 2]) < 0.02    # well under the 3 cm noise

    def test_behind_surface_not_carved(self):
        """Voxels more than the truncation behind the surface stay at the
        prior (never observed), not free space."""
        depth = np.full((120, 160), 1.0, np.float32)
        vol = make_volume(origin=(-1.0, -1.0, 0.0), size_m=2.0, n=32)
        vol = integrate(vol, K, jnp.asarray(depth), jnp.eye(3),
                        jnp.zeros(3))
        w = np.asarray(vol.weight)
        n = 32
        zi = np.arange(n)
        z = (zi + 0.5) * float(vol.voxel)
        deep = z > 1.0 + 5 * float(vol.voxel)
        assert w[n // 2, n // 2, deep].max() == 0.0
        near = (z > 0.2) & (z < 0.9)
        assert w[n // 2, n // 2, near].min() == 1.0


def test_fuse_trajectory_and_cli(tmp_path):
    """End-to-end: trajectory + frame store -> tsdf CLI -> PLY mesh."""
    from test_pipelines2 import render_wall_frame

    from graph_slam_tpu.config import SR4000
    from graph_slam_tpu.io import write_trajectory
    from graph_slam_tpu.io.frames import FrameStore

    frames_dir = tmp_path / "frames"
    store = FrameStore(str(frames_dir))
    xs = [0.0, 0.1, 0.2]
    for k, x in enumerate(xs):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        store.save(k, img, depth)
    ids = np.arange(len(xs))
    t = np.stack([[x, 0.0, 0.0] for x in xs])
    q = np.tile([1.0, 0, 0, 0], (len(xs), 1))
    traj_path = tmp_path / "traj.log"
    write_trajectory(str(traj_path), ids, t, q, ids)

    out = tmp_path / "mesh.ply"
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": __file__.rsplit("/tests/", 1)[0]}
    import os
    env = {**os.environ, **env}
    res = subprocess.run(
        [sys.executable, "-m", "graph_slam_tpu", "tsdf",
         "--traj", str(traj_path), "--frames", str(frames_dir),
         "--out", str(out), "--size", "4.0", "--n", "64",
         "--origin=-2,-2,0"],
        capture_output=True, text=True, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-800:]
    assert out.exists()
    txt = out.read_bytes()[:400].decode(errors="ignore")
    assert "ply" in txt and "face" in txt
