"""Synthetic pose-graph generators for benchmarks and stress tests.

``make_sphere_graph`` produces a sphere2500-class problem (the large-scale
stress config named in BASELINE.json): a smooth spiral trajectory over a
sphere with odometry edges and short-range loop closures, ~4 edges/pose like
the classic g2o sphere2500 dataset (2500 poses / 9799 edges). Ground truth
is known, so benchmarks can verify convergence as well as speed.

Pure numpy (fast host-side construction), frozen through ``GraphBuilder``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph import GraphBuilder

__all__ = ["make_sphere_graph", "sphere_ground_truth"]


def _so3_exp(w):
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        return np.eye(3) + W
    return np.eye(3) + np.sin(th) / th * W + (1 - np.cos(th)) / th**2 * (W @ W)


def sphere_ground_truth(n_poses: int, radius: float = 10.0, turns: int = 25):
    """Spiral over a sphere: positions + smooth headings."""
    k = np.arange(n_poses)
    phi = np.arccos(1 - 2 * (k + 0.5) / n_poses)      # polar angle 0..pi
    lam = np.pi * turns * phi                          # azimuth spiral
    pos = radius * np.stack(
        [np.sin(phi) * np.cos(lam), np.sin(phi) * np.sin(lam), np.cos(phi)],
        axis=1,
    )
    Rs = []
    R = np.eye(3)
    for i in range(n_poses):
        if i + 1 < n_poses:
            fwd = pos[i + 1] - pos[i]
        else:
            fwd = pos[i] - pos[i - 1]
        fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
        up = pos[i] / (np.linalg.norm(pos[i]) + 1e-12)
        left = np.cross(up, fwd)
        left /= np.linalg.norm(left) + 1e-12
        fwd2 = np.cross(left, up)
        Rs.append(np.stack([fwd2, left, up], axis=1))
    return np.stack(Rs), pos


def make_sphere_graph(n_poses: int = 2500, edges_per_pose: float = 4.0,
                      meas_noise: float = 0.02, init_noise: float = 0.1,
                      seed: int = 0, dtype=jnp.float32, bucket: int = 256):
    """Build (graph, values, gt) for the sphere stress benchmark."""
    r = np.random.default_rng(seed)
    Rs, ts = sphere_ground_truth(n_poses)

    def between(i, j):
        Rij = Rs[i].T @ Rs[j]
        tij = Rs[i].T @ (ts[j] - ts[i])
        return Rij, tij

    b = GraphBuilder(dtype=dtype)
    for i in range(n_poses):
        if i == 0 or init_noise == 0:
            b.add_pose((Rs[i], ts[i]))
        else:
            dR = _so3_exp(r.normal(size=3) * init_noise * 0.3)
            b.add_pose((Rs[i] @ dR, ts[i] + r.normal(size=3) * init_noise))
    b.add_prior_pose(0, (Rs[0], ts[0]), sigmas=np.full(6, 1e-6))

    info = np.diag([100.0, 100.0, 100.0, 25.0, 25.0, 25.0])

    def noisy(Rij, tij):
        dR = _so3_exp(r.normal(size=3) * meas_noise * 0.3)
        return Rij @ dR, tij + r.normal(size=3) * meas_noise

    for i in range(n_poses - 1):
        b.add_between(i, i + 1, noisy(*between(i, i + 1)), information=info)

    n_extra = int((edges_per_pose - 1.0) * n_poses)
    # short-range loop closures: nodes nearby in space (same sphere band)
    cand_i = r.integers(0, n_poses - 1, size=3 * n_extra)
    cand_j = cand_i + r.integers(2, 50, size=3 * n_extra)
    keep = cand_j < n_poses
    cand_i, cand_j = cand_i[keep][:n_extra], cand_j[keep][:n_extra]
    for i, j in zip(cand_i, cand_j):
        b.add_between(int(i), int(j), noisy(*between(int(i), int(j))),
                      information=info)

    graph, values = b.build(bucket=bucket)
    return graph, values, (Rs, ts)


def make_ba_graph(n_poses: int = 100, n_points: int = 10000,
                  obs_per_point: int = 4, pixel_noise: float = 0.5,
                  init_noise: float = 0.05, seed: int = 0,
                  dtype=jnp.float32, bucket: int = 256,
                  cal=None):
    """10k-landmark bundle-adjustment stress problem (BASELINE.json config).

    Cameras on an arc looking at a point cloud; each landmark observed from
    ``obs_per_point`` nearby cameras through a Cal3DS2 projection.
    Returns (graph, values, (gt_poses_Rt, gt_points)).
    """
    from ..config import SR4000

    cal = cal or SR4000
    r = np.random.default_rng(seed)

    def project_np(local):
        # numpy Cal3DS2 projection (vectorized construction-time helper)
        z = np.maximum(local[:, 2], 1e-6)
        x = local[:, 0] / z
        y = local[:, 1] / z
        r2 = x * x + y * y
        g = 1.0 + cal.k1 * r2 + cal.k2 * r2 * r2
        dx = 2 * cal.p1 * x * y + cal.p2 * (r2 + 2 * x * x)
        dy = 2 * cal.p2 * x * y + cal.p1 * (r2 + 2 * y * y)
        px = g * x + dx
        py = g * y + dy
        return np.stack([cal.fx * px + cal.cx, cal.fy * py + cal.cy], axis=1)

    # camera arc, all looking roughly at the cloud center
    Rs, ts = [], []
    for k in range(n_poses):
        ang = 0.5 * np.sin(2 * np.pi * k / n_poses)
        Rk = _so3_exp(np.array([0.0, ang, 0.0]))
        tk = np.array([2.0 * k / n_poses, 0.1 * np.sin(4 * np.pi * k / n_poses), 0.0])
        Rs.append(Rk)
        ts.append(tk)
    pts = np.stack([r.uniform(-2, 4, n_points), r.uniform(-2, 2, n_points),
                    r.uniform(3.0, 8.0, n_points)], axis=1)

    b = GraphBuilder(dtype=dtype)
    for k in range(n_poses):
        if k == 0 or init_noise == 0:
            b.add_pose((Rs[k], ts[k]))
        else:
            dR = _so3_exp(r.normal(size=3) * init_noise * 0.3)
            b.add_pose((Rs[k] @ dR, ts[k] + r.normal(size=3) * init_noise))
    b.add_prior_pose(0, (Rs[0], ts[0]), sigmas=np.full(6, 1e-6))

    for q in range(n_points):
        b.add_point(pts[q] + r.normal(size=3) * init_noise)
        b.add_prior_point(q, pts[q], sigma=0.1)

    # observations: each point seen from obs_per_point cameras around a
    # deterministic anchor; projections computed vectorized per offset
    anchors = r.integers(0, n_poses, size=n_points)
    Rs_a = np.stack(Rs)
    ts_a = np.stack(ts)
    for o in range(obs_per_point):
        cams = (anchors + o * 3) % n_poses
        local = np.einsum("qji,qj->qi", Rs_a[cams], pts - ts_a[cams])
        vis = local[:, 2] >= 0.3
        uv = project_np(local) + r.normal(size=(n_points, 2)) * pixel_noise
        for q in np.nonzero(vis)[0]:
            b.add_projection_factor(int(cams[q]), int(q), uv[q], cal,
                                    sigma=1.0)

    graph, values = b.build(bucket=bucket)
    return graph, values, ((Rs, ts), pts)


# ---------------------------------------------------------------------------
# plane-aided VIO scenario (the flagship benchmark workload)


def _render_plane_frame(K, R_cam, t_cam, scene, noise=0.0, seed=0):
    """Ray-cast depth+intensity of a set of world planes from a camera pose.

    ``scene`` is [(plane4_world, intensity_value), ...] with plane form
    ``n . x + d = 0``; the camera pose is world-from-camera (R, t).
    """
    r = np.random.default_rng(seed)
    h, w = K.height, K.width
    us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    rays = np.stack([(us - K.cx) / K.fx, (vs - K.cy) / K.fy,
                     np.ones_like(us)], axis=-1)          # (H, W, 3)
    depth = np.full((h, w), np.inf)
    inten = np.zeros((h, w), np.float32)
    for plane_w, value in scene:
        n, d = np.asarray(plane_w[:3]), float(plane_w[3])
        # plane in the camera frame: n_c = R^T n, d_c = d + n . t
        n_c = R_cam.T @ n
        d_c = d + n @ t_cam
        denom = rays @ n_c
        safe = np.where(np.abs(denom) > 1e-9, denom, 1.0)
        z = np.where(np.abs(denom) > 1e-9, -d_c / safe, np.inf)
        hit = (z > 0.2) & (z < depth)
        depth = np.where(hit, z, depth)
        inten = np.where(hit, value, inten)
    depth = np.where(np.isfinite(depth), depth, 0.0)
    if noise:
        depth = depth + r.normal(size=depth.shape) * noise * (depth > 0)
    return inten.astype(np.float32), depth.astype(np.float32)


def make_vio_plane_scenario(n_frames: int = 200, per: int = 20,
                            fail_every: int = 20, seed: int = 0,
                            motion: float = 0.08, noise: float = 0.002,
                            render: bool = True, return_gt: bool = False):
    """Plane-aided VIO benchmark workload: IMU stream + VRO log with
    periodic tracking failures + rendered SR4000 frames of a two-plane
    room (wall z=4, floor y=0.8 — the rescue propagates/extracts these).

    The ground-truth chain integrates the synthetic IMU windows in ONE
    jitted scan (per-frame eager preintegration would cost a dispatch per
    frame on remote-attached backends); the VO log carries exact relative
    poses except the failed records (info sentinel 1e4, the reference's
    encoding, gtsam_graph.cpp:1600).

    Returns ``(log, times, stream, imu_params, frames, K)`` where
    ``frames`` is a ``seq -> (intensity, depth)`` dict (None when
    ``render=False``). With ``return_gt=True`` the exact per-frame
    ground-truth poses ``(Rs (N,3,3), ts (N,3))`` are appended — the
    workload's ATE reference (BASELINE.md accuracy target).
    """
    import jax

    from ..config import SR4000
    from ..core import se3
    from ..imu import (ImuStream, init_preint, integrate_segment,
                       predict_navstate, vn100_params)
    from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog

    from ..core import so3

    K = SR4000
    params = vn100_params()
    dt = 1.0 / 200.0
    n_meas = n_frames * per + 10
    r = np.random.default_rng(seed)
    gyr = r.normal(size=(n_meas, 3)) * (motion * 0.25)
    drive = r.normal(size=(n_meas, 3)) * motion
    for k in range(1, n_meas):
        gyr[k] = 0.9 * gyr[k - 1] + 0.1 * gyr[k]
        drive[k] = 0.9 * drive[k - 1] + 0.1 * drive[k]

    # ALL numeric generation runs in f64 whatever the caller's x64
    # flag: a 540k-step f32 attitude/velocity chain DIVERGES (the
    # 27k-frame ground truth measured a 19.6 km runaway path in f32
    # vs 39.6 m in f64, 2026-08-19) -- the scenario must be exact,
    # only the replay under test runs in the benchmark dtype
    with jax.enable_x64():
        # gravity-CONSISTENT accelerometer: rotate gravity into the current
        # body frame and drive a mean-reverting world velocity, so the
        # trajectory stays room-scale and the specific force matches the
        # integrated attitude (a fixed body-frame -g with a rotating body
        # leaves unbounded uncompensated acceleration)
        @jax.jit
        def gen_acc(gyr_all, drive_all):
            g_w = jnp.asarray(params.gravity)

            def step(carry, x):
                R, v = carry
                g_, w_ = x
                Rn = R @ so3.expmap(g_ * dt)
                v_new = 0.999 * v + w_ * dt
                a_w = (v_new - v) / dt
                return (Rn, v_new), Rn.T @ (a_w - g_w)

            (_, _), accs = jax.lax.scan(step, (jnp.eye(3), jnp.zeros(3)),
                                        (gyr_all, drive_all))
            return accs

        acc = np.asarray(gen_acc(jnp.asarray(gyr), jnp.asarray(drive)))
        stream = ImuStream(t=np.arange(n_meas) * dt, acc=acc, gyr=gyr, dt=dt)

        @jax.jit
        def chain(acc_w, gyr_w):
            def step(carry, x):
                R, t, v = carry
                st = integrate_segment(init_preint(jnp.zeros(6), params),
                                       x[0], x[1], jnp.full(per, dt), params)
                Xj, vj = predict_navstate(st, se3.Pose(R, t), v,
                                          jnp.zeros(6), params.gravity)
                return (Xj.R, Xj.t, vj), (Xj.R, Xj.t)
            _, (Rs, ts) = jax.lax.scan(
                step, (jnp.eye(3), jnp.zeros(3), jnp.zeros(3)), (acc_w, gyr_w))
            return Rs, ts

        acc_w = jnp.asarray(acc[:(n_frames - 1) * per]
                            .reshape(n_frames - 1, per, 3))
        gyr_w = jnp.asarray(gyr[:(n_frames - 1) * per]
                            .reshape(n_frames - 1, per, 3))
        Rs_j, ts_j = chain(acc_w, gyr_w)
        Rs = np.concatenate([np.eye(3)[None], np.asarray(Rs_j)])
        ts = np.concatenate([np.zeros(3)[None], np.asarray(ts_j)])

    scene = [(np.array([0.0, 0.0, 1.0, -4.0]), 150.0),
             (np.array([0.0, 1.0, 0.0, -0.8]), 80.0)]
    frames = None
    if render == "lazy":
        # render on demand with a small cache: the rescue engine touches
        # only the failure frames and their predecessors, so a 27k-frame
        # run renders ~2 frames per rescue instead of 27k upfront
        cache: dict = {}

        def frames(f):
            if not (0 <= f < n_frames):
                return None
            if f not in cache:
                if len(cache) > 128:
                    cache.clear()
                cache[f] = _render_plane_frame(K, Rs[f], ts[f], scene,
                                               noise=noise, seed=seed + f)
            return cache[f]
    elif render:
        frames = {f: _render_plane_frame(K, Rs[f], ts[f], scene,
                                         noise=noise, seed=seed + f)
                  for f in range(n_frames)}

    info = np.diag([8e3] * 3 + [2500.0] * 3)
    id_to, id_from, xis, infos = [], [], [], []
    for f in range(1, n_frames):
        id_from.append(f - 1)
        id_to.append(f)
        if fail_every and f % fail_every == 0:
            xis.append(np.zeros(6))
            infos.append(np.eye(6) * FAILED_INFO_SENTINEL)
        else:
            xis.append(None)   # batch-filled below in one device call
            infos.append(info)
    # relative-pose logs via the library's se3 (batched, one dispatch;
    # f64 like the rest of the generation — these edges are the EXACT
    # measurements the accuracy numbers are judged against)
    valid = [k for k in range(len(id_to)) if xis[k] is None]
    if valid:
        from ..core import se3 as _se3

        with jax.enable_x64():
            @jax.jit
            def rel_logs(Ra, ta, Rb, tb):
                return jax.vmap(lambda RA, tA, RB, tB: _se3.logmap(
                    _se3.between(_se3.Pose(RA, tA), _se3.Pose(RB, tB))))(
                    Ra, ta, Rb, tb)

            ia = np.asarray([id_from[k] for k in valid])
            ib = np.asarray([id_to[k] for k in valid])
            lv = np.asarray(rel_logs(
                jnp.asarray(Rs[ia]), jnp.asarray(ts[ia]),
                jnp.asarray(Rs[ib]), jnp.asarray(ts[ib])))
        for q, k in enumerate(valid):
            xis[k] = lv[q]
    log = VROLog(np.asarray(id_to), np.asarray(id_from), np.stack(xis),
                 np.stack(infos))
    times = {f: f * per * dt for f in range(n_frames)}
    if return_gt:
        return log, times, stream, params, frames, K, (Rs, ts)
    return log, times, stream, params, frames, K
