"""Golden-fixture generator (run manually; outputs are committed).

Regenerate with:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/goldens/generate.py

Produces, next to this file:
- ``posegraph_vro.log``  — deterministic 40-node VRO replay fixture with a
  failed-edge sentinel and loop closures (the reference's canonical log
  format, gtsam_graph.cpp:1505-1590);
- ``posegraph_traj.log`` — the pinned trajectory ``run_pose_graph`` produces
  from it (writeTrajectory format);
- ``sphere200_noisy.g2o``— a noisy 200-pose sphere pose graph in standard
  g2o text format, with the pinned optimal chi2;
- ``chi2.json``          — pinned chi2 values for both fixtures.

These freeze the optimizer's conventions (noise whitening, LM schedule,
SE(3) retraction, frame handling): any change that shifts final chi2 by
more than 1e-6 relative or moves the trajectory breaks tests/test_goldens.py.

The pinned chi2 values come from the INDEPENDENT pure-NumPy LM
(``tests/np_optimizer.py`` — numeric Jacobians, its own schedule, no shared
code), not from the JAX optimizer being tested: the parity gate therefore
detects convention errors, not just drift. The JAX values are recorded
alongside and asserted against the NumPy optimum at 1e-6 relative here at
generation time (measured agreement: ~1e-10 on the VRO fixture, ~5e-15 on
sphere200).
"""

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def np_so3_exp(w):
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        return np.eye(3) + W
    return (np.eye(3) + np.sin(th) / th * W
            + (1 - np.cos(th)) / th ** 2 * (W @ W))


def make_vro_golden():
    from graph_slam_tpu.core import se3
    from graph_slam_tpu.io import write_trajectory, write_vro_log
    from graph_slam_tpu.io.vro_log import FAILED_INFO_SENTINEL, VROLog
    from graph_slam_tpu.pipelines import (
        run_pose_graph,
        trajectory_arrays,
    )
    from graph_slam_tpu.config import SlamParams

    r = np.random.default_rng(42)
    n = 40
    gt = [se3.identity()]
    for k in range(1, n):
        w = np.array([0.0, 0.0, 2 * np.pi / n])
        v = np.array([0.4, 0.0, 0.01 * np.sin(k)])
        T = se3.Pose(jnp.asarray(np_so3_exp(w)), jnp.asarray(v))
        gt.append(se3.compose(gt[-1], T))

    info = np.diag([4e3, 4e3, 4e3, 1e3, 1e3, 1e3])
    id_to, id_from, xis, infos = [], [], [], []
    for k in range(1, n):
        id_from.append(k - 1)
        id_to.append(k)
        if k == 17:   # failed edge -> identity edge in pure-VO mode
            xis.append(np.zeros(6))
            infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
        else:
            T = se3.between(gt[k - 1], gt[k])
            xi = np.asarray(se3.logmap(T)) + r.normal(size=6) * 0.005
            xis.append(xi)
            infos.append(info)
    for (i, j) in [(0, n - 1), (5, 25), (10, 30)]:
        T = se3.between(gt[i], gt[j])
        id_from.append(i)
        id_to.append(j)
        xis.append(np.asarray(se3.logmap(T)) + r.normal(size=6) * 0.005)
        infos.append(info)

    log = VROLog(np.asarray(id_to), np.asarray(id_from), np.stack(xis),
                 np.stack(infos))
    write_vro_log(os.path.join(HERE, "posegraph_vro.log"), log)

    res = run_pose_graph(log, SlamParams(), bucket=64)
    ids, t, q, seq = trajectory_arrays(res.values, res.seq_ids)
    write_trajectory(os.path.join(HERE, "posegraph_traj.log"), ids, t, q, seq)

    # pin from the independent NumPy LM; gate the JAX result against it
    import sys

    sys.path.insert(0, os.path.dirname(HERE))
    import np_optimizer as npo

    nf, nv = npo.graph_from_vro(log)
    np_e0 = npo.total_error(nf, nv)
    _, np_err = npo.lm_optimize(nf, nv, max_iters=80)
    assert abs(res.error0 - np_e0) <= 1e-9 * np_e0, (res.error0, np_e0)
    assert abs(res.error - np_err) <= 1e-6 * np_err, (res.error, np_err)
    return {"vro_error0": np_e0, "vro_error": np_err,
            "vro_error_jax": res.error}


def make_g2o_golden():
    from graph_slam_tpu.datasets import make_sphere_graph
    from graph_slam_tpu.graph import LMParams, lm_optimize
    from graph_slam_tpu.io import write_g2o
    from graph_slam_tpu.core import so3
    from graph_slam_tpu.pipelines import run_g2o_file

    graph, values, _ = make_sphere_graph(n_poses=200, edges_per_pose=3.0,
                                         meas_noise=0.02, init_noise=0.1,
                                         seed=7, dtype=jnp.float64,
                                         bucket=64)
    n = int(values.num_poses)
    t = np.asarray(values.pose_t[:n])
    q = np.asarray(so3.matrix_to_quat(values.pose_R[:n]))
    bt = graph.between
    act = np.asarray(bt.active)
    edges = []
    for k in np.nonzero(act)[0]:
        S = np.asarray(bt.sqrt_info[k])
        info = S.T @ S
        qij = np.asarray(so3.matrix_to_quat(bt.meas_R[k]))
        edges.append((int(bt.i[k]), int(bt.j[k]),
                      np.asarray(bt.meas_t[k]), qij, info))
    path = os.path.join(HERE, "sphere200_noisy.g2o")
    write_g2o(path, t, q, edges)

    # pin the optimum from the independent NumPy LM; the JAX entry point
    # the test uses must agree at 1e-6 relative
    res = run_g2o_file(path, LMParams(relative_error_tol=1e-12,
                                      absolute_error_tol=1e-12), bucket=64)
    import sys

    sys.path.insert(0, os.path.dirname(HERE))
    import np_optimizer as npo
    from graph_slam_tpu.io import read_g2o

    vertices, g2o_edges = read_g2o(path)
    nf, nv = npo.graph_from_g2o(vertices, g2o_edges)
    np_e0 = npo.total_error(nf, nv)
    _, np_err = npo.lm_optimize(nf, nv, max_iters=80)
    assert abs(res.error0 - np_e0) <= 1e-9 * np_e0, (res.error0, np_e0)
    assert abs(res.error - np_err) <= 1e-6 * np_err, (res.error, np_err)
    return {"g2o_error0": np_e0, "g2o_error": np_err,
            "g2o_error_jax": res.error}


def make_ba_golden():
    """Small bundle-adjustment fixture (Cal3DS2 projections with a
    non-identity body_P_sensor, pose prior, point priors), committed as
    ba_fixture.json; the optimum is pinned from the INDEPENDENT NumPy LM
    and both JAX optimizers (LM and the square-root Schur GN) are gated
    against it at generation time."""
    import sys

    sys.path.insert(0, os.path.dirname(HERE))
    import np_lie
    import np_optimizer as npo
    from graph_slam_tpu.config import SR4000
    from graph_slam_tpu.graph import (GraphBuilder, LMParams, lm_optimize,
                                      total_error)
    from graph_slam_tpu.graph.ba_solve import ba_gn_optimize_sqrt

    r = np.random.default_rng(23)
    n_poses, n_pts = 3, 25
    cal9 = (SR4000.fx, SR4000.fy, 0.0, SR4000.cx, SR4000.cy,
            SR4000.k1, SR4000.k2, 0.0, 0.0)
    bR = np_so3_exp(np.array([0.0, 0.05, 0.0]))
    bt = np.array([0.05, 0.0, 0.01])

    gt_poses = [(np_so3_exp(np.array([0.0, 0.1 * k, 0.0])),
                 np.array([0.3 * k, 0.0, 0.0])) for k in range(n_poses)]
    pts = np.stack([r.uniform(-1, 1, n_pts), r.uniform(-1, 1, n_pts),
                    r.uniform(2.5, 5.0, n_pts)], axis=1)

    def project(Rt, q):
        R, t = np_lie.compose(Rt, (bR, bt))
        return npo.cal3ds2_project(cal9, R.T @ (q - t))

    obs = [(k, q, (project(gt_poses[k], pts[q])
                   + r.normal(size=2) * 0.3).tolist())
           for k in range(n_poses) for q in range(n_pts)]
    init_poses = [gt_poses[0]] + [
        (np_lie.so3_exp(r.normal(size=3) * 0.02) @ R,
         t + r.normal(size=3) * 0.03) for R, t in gt_poses[1:]]
    init_pts = pts + r.normal(size=pts.shape) * 0.05

    fixture = {
        "cal": list(cal9),
        "body_R": bR.tolist(), "body_t": bt.tolist(),
        "prior_pose": [gt_poses[0][0].tolist(), gt_poses[0][1].tolist()],
        "init_poses": [[R.tolist(), t.tolist()] for R, t in init_poses],
        "init_points": init_pts.tolist(),
        "obs": obs,
        "point_prior_sigma": 0.5,
    }
    with open(os.path.join(HERE, "ba_fixture.json"), "w") as f:
        json.dump(fixture, f)

    # JAX graph
    b = GraphBuilder(dtype=jnp.float64)
    for Rt in init_poses:
        b.add_pose(Rt)
    b.add_prior_pose(0, gt_poses[0], sigmas=np.full(6, 1e-6))
    for q in range(n_pts):
        b.add_point(init_pts[q])
        b.add_prior_point(q, init_pts[q], sigma=0.5)
    for k, q, uv in obs:
        b.add_projection_factor(k, q, np.asarray(uv), cal9,
                                body_pose=(bR, bt), sigma=1.0)
    graph, values = b.build(bucket=8)
    e0_jax = float(total_error(graph, values))
    res = lm_optimize(graph, values, LMParams(relative_error_tol=1e-14,
                                              absolute_error_tol=1e-14))
    _, err_sqrt = ba_gn_optimize_sqrt(graph, values, iterations=25,
                                      damping=1e-6)

    # independent NumPy optimum (the pin)
    factors = [npo.prior_pose_factor(0, gt_poses[0], np.eye(6) * 1e6)]
    for q in range(n_pts):
        factors.append(npo.prior_point_factor(q, init_pts[q],
                                              np.eye(3) / 0.5))
    for k, q, uv in obs:
        factors.append(npo.projection_factor(k, q, np.asarray(uv), cal9,
                                             (bR, bt), np.eye(2)))
    nv = npo.NpValues(init_poses, points=list(init_pts))
    np_e0 = npo.total_error(factors, nv)
    _, np_err = npo.lm_optimize(factors, nv, max_iters=100)
    assert abs(e0_jax - np_e0) <= 1e-9 * np_e0, (e0_jax, np_e0)
    assert abs(float(res.error) - np_err) <= 1e-6 * np_err
    assert abs(float(err_sqrt) - np_err) <= 1e-6 * np_err
    return {"ba_error0": np_e0, "ba_error": np_err,
            "ba_error_jax": float(res.error),
            "ba_error_sqrt_schur": float(err_sqrt)}


def main():
    pins = {}
    pins.update(make_vro_golden())
    pins.update(make_g2o_golden())
    pins.update(make_ba_golden())
    with open(os.path.join(HERE, "chi2.json"), "w") as f:
        json.dump(pins, f, indent=2)
    print(json.dumps(pins, indent=2))


if __name__ == "__main__":
    main()
