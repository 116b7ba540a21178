"""IMU preintegration tests: analytic cases, bias Jacobians vs numeric
(re-integration), factor consistency, and a toy VIO graph.

Pattern follows the reference's IMU harnesses (test_imu_vn100.cpp,
test_imu_MEMS.cpp — SURVEY.md §4.3) but with assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graph_slam_tpu.core import se3, so3
from graph_slam_tpu.graph import GraphBuilder, lm_optimize, total_error
from graph_slam_tpu.imu import (
    init_preint,
    integrate_segment,
    predict_navstate,
    corrected_deltas,
    vn100_params,
)


def integrate(acc, gyr, dt, bias=np.zeros(6), params=None):
    params = params or vn100_params()
    st = init_preint(jnp.asarray(bias), params)
    n = len(acc)
    return integrate_segment(
        st, jnp.asarray(acc), jnp.asarray(gyr), jnp.full(n, dt), params
    )


class TestParallelPreintegration:
    """Log-depth associative-scan formulation == sequential scan, to
    roundoff, on every field (deltas, all 5 bias Jacobians, 15x15 cov),
    including masked padding rows (imu/parallel_preint.py)."""

    def test_matches_sequential_scan(self):
        # integrate_segment IS the parallel path now; the sequential scan
        # is kept under integrate_segment_scan as the oracle
        from graph_slam_tpu.imu import (
            integrate_segment_parallel,
            integrate_segment_scan,
        )

        r = np.random.default_rng(0)
        params = vn100_params()
        for n, n_live in [(16, 16), (64, 40), (512, 317), (1, 1), (8, 0)]:
            acc = r.normal(0, 2, (n, 3)) - np.asarray(params.gravity)
            gyr = r.normal(0, 0.5, (n, 3))
            dts = np.zeros(n)
            dts[:n_live] = 0.005
            s0 = init_preint(jnp.asarray(r.normal(0, 0.05, 6)), params)
            seq = integrate_segment_scan(
                s0, jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                params)
            par = integrate_segment_parallel(
                s0, jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                params)
            for f in seq._fields:
                a_, b_ = np.asarray(getattr(seq, f)), \
                    np.asarray(getattr(par, f))
                scale = max(1.0, np.abs(a_).max())
                np.testing.assert_allclose(
                    b_, a_, atol=1e-10 * scale,
                    err_msg=f"field {f} (n={n}, live={n_live})")


class TestPreintegration:
    def test_constant_accel(self):
        n, dt = 100, 0.005
        a = np.tile([0.3, -0.2, 9.81], (n, 1))
        w = np.zeros((n, 3))
        st = integrate(a, w, dt)
        T = n * dt
        np.testing.assert_allclose(st.dR, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(st.dv, np.array([0.3, -0.2, 9.81]) * T,
                                   atol=1e-10)
        # discrete sum: dp = sum(v_k dt + 0.5 a dt^2) = 0.5 a T^2 exactly
        np.testing.assert_allclose(st.dp, 0.5 * np.array([0.3, -0.2, 9.81]) * T**2,
                                   atol=1e-10)

    def test_pure_rotation(self):
        n, dt = 200, 0.005
        w = np.tile([0.1, 0.2, -0.3], (n, 1))
        a = np.zeros((n, 3))
        st = integrate(a, w, dt)
        expected = so3.expmap(jnp.asarray([0.1, 0.2, -0.3]) * n * dt)
        np.testing.assert_allclose(st.dR, expected, atol=1e-10)

    def test_masked_rows_are_skipped(self):
        params = vn100_params()
        a = np.tile([0.1, 0.0, 0.0], (10, 1))
        w = np.tile([0.0, 0.0, 0.2], (10, 1))
        dts = np.full(10, 0.005)
        st_full = integrate_segment(init_preint(jnp.zeros(6), params),
                                    jnp.asarray(a), jnp.asarray(w),
                                    jnp.asarray(dts), params)
        # pad with masked rows
        a2 = np.vstack([a, np.ones((5, 3)) * 99])
        w2 = np.vstack([w, np.ones((5, 3)) * 99])
        dt2 = np.concatenate([dts, np.zeros(5)])
        st_pad = integrate_segment(init_preint(jnp.zeros(6), params),
                                   jnp.asarray(a2), jnp.asarray(w2),
                                   jnp.asarray(dt2), params)
        np.testing.assert_allclose(st_pad.dR, st_full.dR, atol=1e-14)
        np.testing.assert_allclose(st_pad.dp, st_full.dp, atol=1e-14)
        np.testing.assert_allclose(st_pad.cov, st_full.cov, atol=1e-14)
        assert float(st_pad.dt) == float(st_full.dt)

    def test_bias_jacobians_first_order(self):
        """corrected_deltas(b + db) ~ re-integration with bias b + db."""
        r = np.random.default_rng(0)
        n, dt = 50, 0.005
        a = r.normal(size=(n, 3)) + [0, 0, 9.81]
        w = r.normal(size=(n, 3)) * 0.3
        b0 = np.zeros(6)
        db = np.array([0.02, -0.01, 0.015, 0.004, -0.006, 0.005])
        st0 = integrate(a, w, dt, b0)
        st1 = integrate(a, w, dt, b0 + db)
        dR_corr, dp_corr, dv_corr = corrected_deltas(st0, jnp.asarray(b0 + db))
        # first-order: error should be O(|db|^2)
        np.testing.assert_allclose(dp_corr, st1.dp, atol=2e-4)
        np.testing.assert_allclose(dv_corr, st1.dv, atol=2e-4)
        err_R = so3.logmap(jnp.swapaxes(st1.dR, -1, -2) @ dR_corr)
        assert float(jnp.linalg.norm(err_R)) < 2e-4

    def test_cov_psd_and_grows(self):
        r = np.random.default_rng(1)
        n, dt = 100, 0.005
        a = r.normal(size=(n, 3))
        w = r.normal(size=(n, 3)) * 0.2
        st = integrate(a, w, dt)
        C = np.asarray(st.cov)
        np.testing.assert_allclose(C, C.T, atol=1e-15)
        ev = np.linalg.eigvalsh(C)
        assert ev.min() > 0
        # more time, more uncertainty on the theta block
        st2 = integrate(np.vstack([a, a]), np.vstack([w, w]), dt)
        assert np.trace(np.asarray(st2.cov)[:3, :3]) > np.trace(C[:3, :3])

    def test_predict_consistency(self):
        """predict(navstate) followed by the factor residual must be ~0."""
        r = np.random.default_rng(2)
        n, dt = 80, 0.005
        params = vn100_params()
        a = r.normal(size=(n, 3)) + [0.0, 0.0, 9.81]
        w = r.normal(size=(n, 3)) * 0.5
        bias = np.array([0.01, -0.02, 0.03, 0.001, 0.002, -0.001])
        st = integrate(a, w, dt, bias, params)

        Xi = se3.Pose(so3.expmap(jnp.array([0.1, -0.2, 0.3])),
                      jnp.array([1.0, 2.0, 3.0]))
        vi = jnp.array([0.4, -0.1, 0.2])
        Xj, vj = predict_navstate(st, Xi, vi, jnp.asarray(bias),
                                  params.gravity)

        # residual computed like the ImuTable factor
        g = params.gravity
        T = st.dt
        dR, dp, dv = corrected_deltas(st, jnp.asarray(bias))
        r_R = so3.logmap(dR.T @ (Xi.R.T @ Xj.R))
        r_p = Xi.R.T @ (Xj.t - Xi.t - vi * T - 0.5 * g * T * T) - dp
        r_v = Xi.R.T @ (vj - vi - g * T) - dv
        np.testing.assert_allclose(r_R, 0, atol=1e-12)
        np.testing.assert_allclose(r_p, 0, atol=1e-12)
        np.testing.assert_allclose(r_v, 0, atol=1e-12)


class TestImuGraph:
    def test_toy_vio_recovers_states(self):
        """3-state VIO: priors on state 0, two IMU factors; optimize from a
        perturbed initial guess; states must converge to the IMU prediction
        chain (chi2 -> ~0 since measurements are consistent)."""
        r = np.random.default_rng(3)
        n, dt = 60, 0.005
        params = vn100_params()
        bias_true = np.zeros(6)

        segs = []
        for k in range(2):
            a = r.normal(size=(n, 3)) * 0.5 - np.asarray(params.gravity)
            w = r.normal(size=(n, 3)) * 0.3
            st = integrate(a, w, dt, bias_true, params)
            segs.append(st)

        # ground-truth chain from predictions
        X = [se3.Pose(jnp.eye(3), jnp.zeros(3))]
        V = [jnp.zeros(3)]
        for st in segs:
            Xj, vj = predict_navstate(st, X[-1], V[-1],
                                      jnp.asarray(bias_true), params.gravity)
            X.append(Xj)
            V.append(vj)

        b = GraphBuilder()
        for k in range(3):
            if k == 0:
                b.add_pose((np.asarray(X[k].R), np.asarray(X[k].t)))
                b.add_vel(np.asarray(V[k]))
            else:
                xi = r.normal(size=6) * 0.05
                P = se3.retract(X[k], jnp.asarray(xi))
                b.add_pose((np.asarray(P.R), np.asarray(P.t)))
                b.add_vel(np.asarray(V[k]) + r.normal(size=3) * 0.05)
            b.add_bias(bias_true)
        b.add_prior_pose(0, (np.asarray(X[0].R), np.asarray(X[0].t)),
                         sigmas=np.full(6, 1e-7))
        b.add_prior_vel(0, np.asarray(V[0]), sigma=1e-3)
        b.add_prior_bias(0, bias_true, sigma=1e-3)
        for k, st in enumerate(segs):
            b.add_imu_factor(k, k + 1, st, np.asarray(params.gravity))

        graph, values = b.build()
        e0 = float(total_error(graph, values))
        res = lm_optimize(graph, values)
        assert float(res.error) < 1e-6
        for k in range(3):
            np.testing.assert_allclose(res.values.pose_t[k], X[k].t, atol=1e-4)
            np.testing.assert_allclose(res.values.vel[k], V[k], atol=1e-3)
