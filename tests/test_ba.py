"""Bundle-adjustment tests: projection factor, two-frame BA, Schur solver.

The two-frame harness mirrors the reference's ``test_ba.cpp`` (VRO-vs-BA on
a pair); the Schur solver is checked against the plain dense optimizer.
"""

import jax
import jax.numpy as jnp
import numpy as np

import np_lie
from graph_slam_tpu.config import SR4000
from graph_slam_tpu.core import se3
from graph_slam_tpu.graph import GraphBuilder, lm_optimize, total_error
from graph_slam_tpu.graph.ba_solve import ba_gn_optimize
from graph_slam_tpu.vision import TrackBook, two_frame_ba
from graph_slam_tpu.vision.cal3ds2 import Cal3DS2, project_point


def make_two_frame_scene(n_pts=40, noise_px=0.0, seed=0):
    r = np.random.default_rng(seed)
    cal = Cal3DS2.make(SR4000.fx, SR4000.fy, SR4000.cx, SR4000.cy,
                       SR4000.k1, SR4000.k2)
    pts = np.stack([r.uniform(-1, 1, n_pts), r.uniform(-0.8, 0.8, n_pts),
                    r.uniform(1.5, 3.5, n_pts)], axis=1)
    T_ij = np_lie.se3_exp(np.array([0.03, -0.05, 0.04, 0.12, -0.06, 0.08]))
    # frame j sees the points through T_ij: p_j = T_ij^-1 p_i
    Rj, tj = np_lie.inverse(T_ij)
    pts_j = (Rj @ pts.T).T + tj
    uv_i = np.asarray(project_point(cal, jnp.asarray(pts)))
    uv_j = np.asarray(project_point(cal, jnp.asarray(pts_j)))
    if noise_px:
        uv_i += r.normal(size=uv_i.shape) * noise_px
        uv_j += r.normal(size=uv_j.shape) * noise_px
    return pts, uv_i, uv_j, SR4000, T_ij


class TestTwoFrameBA:
    def test_recovers_relative_pose(self):
        pts, uv_i, uv_j, cal, T_gt = make_two_frame_scene()
        T0 = np_lie.retract(T_gt, np.full(6, 0.02))  # perturbed init
        (R, t), info, err = two_frame_ba(pts, uv_i, uv_j, cal, T0)
        np.testing.assert_allclose(R, T_gt[0], atol=1e-5)
        np.testing.assert_allclose(t, T_gt[1], atol=1e-4)
        # information must be symmetric positive definite
        assert np.linalg.eigvalsh(info).min() > 0
        assert err < 1e-8

    def test_information_grows_with_matches(self):
        pts, uv_i, uv_j, cal, T_gt = make_two_frame_scene(n_pts=60)
        _, info_many, _ = two_frame_ba(pts, uv_i, uv_j, cal, T_gt)
        _, info_few, _ = two_frame_ba(pts[:15], uv_i[:15], uv_j[:15], cal,
                                      T_gt)
        assert np.trace(info_many) > np.trace(info_few)


class TestTrackBook:
    def test_merge_semantics(self):
        tb = TrackBook()
        ev = tb.merge(0, 1, [(0, 0), (1, 1)])
        assert [e[0] for e in ev] == ["new", "new"]
        ev = tb.merge(1, 2, [(0, 5), (1, 6)])
        assert [e[0] for e in ev] == ["extend_j", "extend_j"]
        assert tb.feature_qid[2][5] == 0
        ev = tb.merge(0, 2, [(0, 5)])
        assert ev[0] == ("seen", 0)


class TestSchur:
    def _make_ba_graph(self, n_poses=4, n_pts=30, seed=1):
        r = np.random.default_rng(seed)
        cal = SR4000
        gt_poses = []
        for k in range(n_poses):
            xi = np.concatenate([r.normal(size=3) * 0.05,
                                 [0.3 * k, 0.0, 0.0]])
            gt_poses.append(np_lie.se3_exp(xi))
        pts = np.stack([r.uniform(-1.5, 1.5, n_pts),
                        r.uniform(-1, 1, n_pts),
                        r.uniform(2, 4, n_pts)], axis=1)
        calj = Cal3DS2.make(cal.fx, cal.fy, cal.cx, cal.cy, cal.k1, cal.k2)

        b = GraphBuilder()
        for k, (R, t) in enumerate(gt_poses):
            if k == 0:
                b.add_pose((R, t))
            else:
                b.add_pose(np_lie.retract((R, t), r.normal(size=6) * 0.02))
        b.add_prior_pose(0, gt_poses[0], sigmas=np.full(6, 1e-7))
        for q in range(n_pts):
            b.add_point(pts[q] + r.normal(size=3) * 0.02)
            b.add_prior_point(q, pts[q], sigma=0.1)
        for k, (R, t) in enumerate(gt_poses):
            Rt_inv = np_lie.inverse((R, t))
            local = (Rt_inv[0] @ pts.T).T + Rt_inv[1]
            uv = np.asarray(project_point(calj, jnp.asarray(local)))
            for q in range(n_pts):
                if local[q, 2] > 0.1:
                    b.add_projection_factor(k, q, uv[q], cal, sigma=1.0)
        return b.build(bucket=16), gt_poses, pts

    def test_schur_matches_dense_lm(self):
        (graph, values), gt_poses, pts = self._make_ba_graph()
        vals_schur, err_schur = ba_gn_optimize(graph, values, iterations=10)
        res = lm_optimize(graph, values)
        assert err_schur < 1e-8
        np.testing.assert_allclose(float(err_schur), float(res.error),
                                   atol=1e-8)
        for k, (R, t) in enumerate(gt_poses):
            np.testing.assert_allclose(np.asarray(vals_schur.pose_t[k]), t,
                                       atol=1e-5)
        for q in range(len(pts)):
            np.testing.assert_allclose(np.asarray(vals_schur.point[q]),
                                       pts[q], atol=1e-4)


class TestBaStress:
    def test_ba_graph_schur_converges(self):
        """Scaled-down 10k-landmark stress config (BASELINE.json):
        Schur-eliminated GN must collapse chi2 by >1e4x."""
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, (gt_poses, gt_pts) = make_ba_graph(
            n_poses=12, n_points=400, obs_per_point=4, seed=3, pixel_noise=0.0,
            dtype=jnp.float64, bucket=64)
        e0 = float(total_error(graph, values))
        vals, err = ba_gn_optimize(graph, values, iterations=8,
                                   damping=1e-4)
        assert float(err) < 1e-4 * e0
        # pose trajectory recovered
        Rs, ts = gt_poses
        for k in range(12):
            np.testing.assert_allclose(np.asarray(vals.pose_t[k]), ts[k],
                                       atol=5e-3)


class TestSqrtSchur:
    """Square-root (QR) landmark elimination: f32-stable Schur."""

    def test_sqrt_matches_normal_equations_schur_f64(self):
        """Same damped linear system, different factorization: one step of
        the QR form must match schur_gn_step to solver precision (x64)."""
        from graph_slam_tpu.graph.ba_solve import (
            build_point_obs, schur_gn_step, sqrt_schur_gn_step)
        from graph_slam_tpu.graph.variables import layout_of
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, _ = make_ba_graph(
            n_poses=6, n_points=80, obs_per_point=4, seed=1,
            pixel_noise=0.5, dtype=jnp.float64, bucket=16)
        lay = layout_of(values)
        tabs = build_point_obs(graph, lay.point_cap)
        damping = jnp.asarray(1e-3, jnp.float64)
        v_ne = schur_gn_step(graph, values, damping)
        v_sq = sqrt_schur_gn_step(graph, values,
                                  *[jnp.asarray(t) for t in tabs], damping,
                                  chunk=32)
        # tolerance is conditioning-limited, not method-limited: the
        # sigma=1e-6 pose prior puts ~1e12 entries in S, so two exact
        # factorizations of the same system legitimately differ ~1e-6
        np.testing.assert_allclose(np.asarray(v_sq.pose_t),
                                   np.asarray(v_ne.pose_t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_sq.point),
                                   np.asarray(v_ne.point), atol=1e-5)

    def test_sqrt_schur_converges_in_f32(self):
        """THE claim: the QR form is f32-stable where the normal-equations
        reduction cancels catastrophically. Pixel-whitened BA in pure f32
        must still collapse chi2 >1e3x and recover the trajectory."""
        from graph_slam_tpu.graph.ba_solve import ba_gn_optimize_sqrt
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, (gt_poses, _) = make_ba_graph(
            n_poses=10, n_points=300, obs_per_point=4, seed=5,
            pixel_noise=0.0, dtype=jnp.float32, bucket=32)
        e0 = float(total_error(graph, values))
        vals, err = ba_gn_optimize_sqrt(graph, values, iterations=8,
                                        damping=1e-4, chunk=128)
        assert float(err) < 1e-3 * e0, (e0, float(err))
        Rs, ts = gt_poses
        for k in range(10):
            np.testing.assert_allclose(np.asarray(vals.pose_t[k]), ts[k],
                                       atol=1e-2)

    def test_sqrt_schur_reduced_precision_jitter_converges(self):
        """assembly_precision != None switches the S-assembly matmuls to a
        reduced pass count AND adds a 5e-5 per-entry diagonal jitter (on
        TPU the jitter is what keeps the cond~1e13 reduced Cholesky PSD
        under bf16x3 assembly error — measured NaN without it,
        2026-08-20). On CPU the precision hint is a no-op but the jitter
        path is live: convergence and the recovered trajectory must match
        the exact path, pinning that the jitter is a perturbation, not a
        behavior change."""
        from graph_slam_tpu.graph.ba_solve import ba_gn_optimize_sqrt
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, (gt_poses, _) = make_ba_graph(
            n_poses=10, n_points=300, obs_per_point=4, seed=5,
            pixel_noise=0.0, dtype=jnp.float32, bucket=32)
        e0 = float(total_error(graph, values))
        vals, err = ba_gn_optimize_sqrt(graph, values, iterations=8,
                                        damping=1e-4, chunk=128,
                                        assembly_precision="high")
        assert float(err) < 1e-3 * e0, (e0, float(err))
        _, ts = gt_poses
        for k in range(10):
            np.testing.assert_allclose(np.asarray(vals.pose_t[k]), ts[k],
                                       atol=1e-2)

    def test_sqrt_schur_with_point_priors_and_imu_tables(self):
        """Mixed graph (the two-frame-BA shape, gtsam_graph.cpp:500-610):
        point priors ride the landmark QR stack; pose priors/between ride
        the non-point accumulation."""
        from graph_slam_tpu.graph.ba_solve import (ba_gn_optimize,
                                                   ba_gn_optimize_sqrt)

        (graph, values), gt_poses, pts = TestSchur._make_ba_graph(
            TestSchur())
        vals, err = ba_gn_optimize_sqrt(graph, values, iterations=10,
                                        damping=1e-6)
        assert float(err) < 1e-8
        vals_ne, err_ne = ba_gn_optimize(graph, values, iterations=10,
                                         damping=1e-6)
        np.testing.assert_allclose(float(err), float(err_ne), atol=1e-8)

    def test_sqrt_schur_multiple_priors_per_landmark(self):
        """Two prior_point factors on one landmark must BOTH ride the QR
        stack (the accumulating solvers count both; dropping one would
        silently change the objective)."""
        from graph_slam_tpu.graph.ba_solve import (
            build_point_obs, schur_gn_step, sqrt_schur_gn_step)
        from graph_slam_tpu.graph.variables import layout_of
        from graph_slam_tpu.datasets import make_ba_graph

        graph, values, _ = make_ba_graph(
            n_poses=4, n_points=30, obs_per_point=3, seed=2,
            pixel_noise=0.5, dtype=jnp.float64, bucket=8)
        # re-anchor landmark 3 with a second, offset prior
        pp = graph.prior_point
        extra_mean = np.asarray(values.point[3]) + 0.05
        slot = int(np.asarray(pp.active).sum())
        graph = graph._replace(prior_point=pp._replace(
            idx=pp.idx.at[slot].set(3),
            mean=pp.mean.at[slot].set(jnp.asarray(extra_mean)),
            sqrt_info=pp.sqrt_info.at[slot].set(jnp.eye(3) * 5.0),
            active=pp.active.at[slot].set(True)))

        lay = layout_of(values)
        tabs = build_point_obs(graph, lay.point_cap)
        assert tabs[2].shape[1] == 2       # P = 2 prior slots
        damping = jnp.asarray(1e-3, jnp.float64)
        v_ne = schur_gn_step(graph, values, damping)
        v_sq = sqrt_schur_gn_step(graph, values,
                                  *[jnp.asarray(t) for t in tabs], damping,
                                  chunk=16)
        np.testing.assert_allclose(np.asarray(v_sq.point),
                                   np.asarray(v_ne.point), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_sq.pose_t),
                                   np.asarray(v_ne.pose_t), atol=1e-6)


def test_clip_nonpoint_groups_by_variable_kind():
    """step_clip's trust region must clip each variable by its own tangent
    width — a flat (-1, 6) reshape misgroups 3-wide velocity/plane slots
    into cross-variable rows (round-4 review)."""
    import jax.numpy as jnp

    from graph_slam_tpu.graph.ba_solve import _clip_nonpoint
    from graph_slam_tpu.graph.variables import TangentLayout

    lay = TangentLayout(pose_cap=2, vel_cap=2, bias_cap=1, plane_cap=1,
                        point_cap=0)
    dp = np.zeros(lay.point_off)
    dp[lay.pose_off:lay.pose_off + 6] = 0.1          # pose 0: small
    dp[lay.vel_off + 3:lay.vel_off + 6] = 100.0      # vel 1: huge
    dp[lay.plane_off:lay.plane_off + 3] = 0.2        # plane 0: small
    out = np.asarray(_clip_nonpoint(jnp.asarray(dp), lay, 1.0))
    assert out.shape == dp.shape
    # small rows pass through untouched
    np.testing.assert_allclose(out[lay.pose_off:lay.pose_off + 6],
                               dp[lay.pose_off:lay.pose_off + 6], rtol=1e-6)
    np.testing.assert_allclose(out[lay.plane_off:lay.plane_off + 3],
                               dp[lay.plane_off:lay.plane_off + 3],
                               rtol=1e-6)
    # the huge velocity row is clipped to unit norm ON ITS OWN 3 SLOTS
    v = out[lay.vel_off + 3:lay.vel_off + 6]
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    # and vel 0 (all zero) stays zero
    assert np.abs(out[lay.vel_off:lay.vel_off + 3]).max() == 0.0
