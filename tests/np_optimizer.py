"""Independent pure-NumPy Levenberg-Marquardt over the framework's factor
types (VERDICT r2 "Next round" #3).

This implementation shares ONLY the math with ``graph_slam_tpu`` — GTSAM's
residual/whitening conventions (error = 0.5 ||S r||^2, S^T S = information),
SE(3) right retraction, the OrientedPlane3 chart, the Forster IMU residual —
and NONE of the code: plain Python factor lists, numeric central-difference
block Jacobians, dense ``np.linalg`` normal equations, its own LM schedule.
gtsam itself is not installable in this image, so agreement between two
implementations that share no code is the strongest chi2-parity proxy
available: a convention error in the JAX machinery (whitening, assembly,
retraction, robust weights) would move its optimum away from this one.

Used by ``tests/goldens/generate.py`` to pin the golden chi2 values and by
``tests/test_np_parity.py`` to cross-check live.
"""

import numpy as np

import np_lie


# ---------------------------------------------------------------------------
# OrientedPlane3 chart (GTSAM Unit3 basis + additive distance), NumPy


def plane_basis(n):
    ax, ay, az = abs(n[0]), abs(n[1]), abs(n[2])
    axis = np.array([1.0, 0, 0]) if (az >= ax and az >= ay) \
        else np.array([0, 0, 1.0])
    b1 = np.cross(n, axis)
    b1 = b1 / np.linalg.norm(b1)
    b2 = np.cross(n, b1)
    return np.stack([b1, b2], axis=-1)          # (3, 2)


def plane_retract(plane, xi):
    n, d = plane[:3], plane[3]
    v = xi[:2]
    th = np.linalg.norm(v)
    B = plane_basis(n)
    if th < 1e-12:
        n_new = n + B @ v
    else:
        n_new = np.cos(th) * n + np.sin(th) / th * (B @ v)
    n_new = n_new / np.linalg.norm(n_new)
    return np.concatenate([n_new, [d + xi[2]]])


def plane_local(a, b):
    na, nb = a[:3], b[:3]
    B = plane_basis(na)
    c = np.clip(na @ nb, -1.0, 1.0)
    th = np.arccos(c)
    perp = nb - c * na
    pn = np.linalg.norm(perp)
    w = (th / pn) * perp if pn > 1e-12 else perp
    return np.concatenate([B.T @ w, [b[3] - a[3]]])


def plane_transform(plane, R, t):
    n, d = plane[:3], plane[3]
    return np.concatenate([R.T @ n, [d + n @ t]])


# ---------------------------------------------------------------------------
# Variables + factors


class NpValues:
    """poses: list of (R, t); vels (N,3); biases (N,6); planes (L,4);
    points (Q,3)."""

    def __init__(self, poses, vels=None, biases=None, planes=None,
                 points=None):
        self.poses = [(np.array(R, float), np.array(t, float))
                      for R, t in poses]
        self.vels = [np.array(v, float) for v in (vels or [])]
        self.biases = [np.array(b, float) for b in (biases or [])]
        self.planes = [np.array(p, float) for p in (planes or [])]
        self.points = [np.array(q, float) for q in (points or [])]

    def copy(self):
        return NpValues([(R.copy(), t.copy()) for R, t in self.poses],
                        [v.copy() for v in self.vels],
                        [b.copy() for b in self.biases],
                        [p.copy() for p in self.planes],
                        [q.copy() for q in self.points])

    def dims(self):
        """Column layout: [poses*6 | vels*3 | biases*6 | planes*3 |
        points*3]."""
        np_, nv, nb, nl, nq = (len(self.poses), len(self.vels),
                               len(self.biases), len(self.planes),
                               len(self.points))
        return 6 * np_ + 3 * nv + 6 * nb + 3 * nl + 3 * nq

    def col(self, kind, idx):
        if kind == "pose":
            return 6 * idx, 6
        base = 6 * len(self.poses)
        if kind == "vel":
            return base + 3 * idx, 3
        base += 3 * len(self.vels)
        if kind == "bias":
            return base + 6 * idx, 6
        base += 6 * len(self.biases)
        if kind == "plane":
            return base + 3 * idx, 3
        base += 3 * len(self.planes)
        return base + 3 * idx, 3                 # point

    def retract_all(self, delta):
        out = self.copy()
        for i, (R, t) in enumerate(out.poses):
            c, _ = self.col("pose", i)
            out.poses[i] = np_lie.retract((R, t), delta[c:c + 6])
        for i in range(len(out.vels)):
            c, _ = self.col("vel", i)
            out.vels[i] = out.vels[i] + delta[c:c + 3]
        for i in range(len(out.biases)):
            c, _ = self.col("bias", i)
            out.biases[i] = out.biases[i] + delta[c:c + 6]
        for i in range(len(out.planes)):
            c, _ = self.col("plane", i)
            out.planes[i] = plane_retract(out.planes[i], delta[c:c + 3])
        for i in range(len(out.points)):
            c, _ = self.col("point", i)
            out.points[i] = out.points[i] + delta[c:c + 3]
        return out


class NpFactor:
    """kind, variable refs [(vkind, idx), ...], residual fn, sqrt_info."""

    def __init__(self, vars_, res_fn, sqrt_info):
        self.vars = vars_
        self.res_fn = res_fn
        self.S = np.array(sqrt_info, float)

    def whitened(self, values):
        return self.S @ self.res_fn(values)


def prior_pose_factor(i, mean_Rt, sqrt_info):
    mean = (np.array(mean_Rt[0], float), np.array(mean_Rt[1], float))

    def res(v):
        return np_lie.se3_log(*np_lie.between(mean, v.poses[i]))

    return NpFactor([("pose", i)], res, sqrt_info)


def between_factor(i, j, meas_Rt, sqrt_info):
    meas = (np.array(meas_Rt[0], float), np.array(meas_Rt[1], float))

    def res(v):
        rel = np_lie.between(v.poses[i], v.poses[j])
        return np_lie.se3_log(*np_lie.between(meas, rel))

    return NpFactor([("pose", i), ("pose", j)], res, sqrt_info)


def prior_vec_factor(kind, i, mean, sqrt_info):
    mean = np.array(mean, float)

    def res(v):
        arr = v.vels[i] if kind == "vel" else v.biases[i]
        return arr - mean

    return NpFactor([(kind, i)], res, sqrt_info)


def plane_factor(pose_i, plane_l, meas, sqrt_info):
    meas = np.array(meas, float)

    def res(v):
        R, t = v.poses[pose_i]
        pred = plane_transform(v.planes[plane_l], R, t)
        return plane_local(meas, pred)

    return NpFactor([("pose", pose_i), ("plane", plane_l)], res, sqrt_info)


def cal3ds2_project(cal, p_cam):
    """GTSAM Cal3DS2 projection (vision/cal3ds2.py semantics):
    cal = (fx, fy, s, u0, v0, k1, k2, p1, p2)."""
    fx, fy, sk, u0, v0, k1, k2, p1, p2 = [float(c) for c in cal]
    z = max(float(p_cam[2]), 1e-6)
    x, y = p_cam[0] / z, p_cam[1] / z
    r2 = x * x + y * y
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    px, py = g * x + dx, g * y + dy
    return np.array([fx * px + sk * py + u0, fy * py + v0])


def projection_factor(pose_i, point_q, uv, cal, body_Rt, sqrt_info):
    """GenericProjectionFactor with body_P_sensor
    (gtsam_graph.cpp:370-448 usage): project((X * body)^-1 q) - uv."""
    uv = np.array(uv, float)
    bR = np.array(body_Rt[0], float)
    bt = np.array(body_Rt[1], float)

    def res(v):
        R, t = np_lie.compose(v.poses[pose_i], (bR, bt))
        p_cam = R.T @ (v.points[point_q] - t)
        return cal3ds2_project(cal, p_cam) - uv

    return NpFactor([("pose", pose_i), ("point", point_q)], res, sqrt_info)


def prior_point_factor(q, mean, sqrt_info):
    mean = np.array(mean, float)

    def res(v):
        return v.points[q] - mean

    return NpFactor([("point", q)], res, sqrt_info)


def imu_factor(i, j, dR, dp, dv, H_R_bg, H_p_ba, H_p_bg, H_v_ba, H_v_bg,
               bias_hat, dt, gravity, sqrt_info):
    """Forster CombinedImuFactor residual [r_R, r_p, r_v, r_ba, r_bg]."""
    dR, dp, dv = np.array(dR, float), np.array(dp, float), np.array(dv, float)

    def res(v):
        Ri, ti = v.poses[i]
        Rj, tj = v.poses[j]
        vi, vj = v.vels[i], v.vels[j]
        bi, bj = v.biases[i], v.biases[j]
        db = bi - bias_hat
        dba, dbg = db[:3], db[3:]
        dR_c = dR @ np_lie.so3_exp(H_R_bg @ dbg)
        dv_c = dv + H_v_ba @ dba + H_v_bg @ dbg
        dp_c = dp + H_p_ba @ dba + H_p_bg @ dbg
        g, T = np.asarray(gravity, float), float(dt)
        r_R = np_lie.so3_log(dR_c.T @ (Ri.T @ Rj))
        r_p = Ri.T @ (tj - ti - vi * T - 0.5 * g * T * T) - dp_c
        r_v = Ri.T @ (vj - vi - g * T) - dv_c
        return np.concatenate([r_R, r_p, r_v, bj - bi])

    return NpFactor([("pose", i), ("vel", i), ("bias", i),
                     ("pose", j), ("vel", j), ("bias", j)], res, sqrt_info)


# ---------------------------------------------------------------------------
# Optimizer


def total_error(factors, values):
    return 0.5 * sum(float(f.whitened(values) @ f.whitened(values))
                     for f in factors)


def _var_width(kind):
    return {"pose": 6, "vel": 3, "bias": 6, "plane": 3, "point": 3}[kind]


def _factor_jacobian(f, values, h=1e-7):
    """Central-difference Jacobian of the whitened residual wrt each
    variable's LOCAL tangent (the same charts retract_all uses)."""
    blocks = []
    for (kind, idx) in f.vars:
        w = _var_width(kind)
        cols = []
        for k in range(w):
            for sgn in (+1.0, -1.0):
                v2 = values.copy()
                d = np.zeros(w)
                d[k] = sgn * h
                if kind == "pose":
                    v2.poses[idx] = np_lie.retract(v2.poses[idx], d)
                elif kind == "vel":
                    v2.vels[idx] = v2.vels[idx] + d
                elif kind == "bias":
                    v2.biases[idx] = v2.biases[idx] + d
                elif kind == "plane":
                    v2.planes[idx] = plane_retract(v2.planes[idx], d)
                else:
                    v2.points[idx] = v2.points[idx] + d
                if sgn > 0:
                    rp = f.whitened(v2)
                else:
                    rm = f.whitened(v2)
            cols.append((rp - rm) / (2 * h))
        blocks.append(np.stack(cols, axis=-1))   # (e, w)
    return blocks


def lm_optimize(factors, values, max_iters=100, lam0=1e-5,
                lam_factor=10.0, rel_tol=1e-12, abs_tol=1e-12):
    """Dense damped LM with an accept/reject schedule of its own."""
    D = values.dims()
    lam = lam0
    err = total_error(factors, values)
    for _ in range(max_iters):
        H = np.zeros((D, D))
        g = np.zeros(D)
        for f in factors:
            r = f.whitened(values)
            blocks = _factor_jacobian(f, values)
            cols = [values.col(kind, idx) for (kind, idx) in f.vars]
            for (ca, wa), Ja in zip(cols, blocks):
                g[ca:ca + wa] += Ja.T @ r
                for (cb, wb), Jb in zip(cols, blocks):
                    H[ca:ca + wa, cb:cb + wb] += Ja.T @ Jb
        improved = False
        for _try in range(12):
            A = H + lam * np.eye(D)
            try:
                delta = np.linalg.solve(A, -g)
            except np.linalg.LinAlgError:
                lam *= lam_factor
                continue
            cand = values.retract_all(delta)
            cand_err = total_error(factors, cand)
            if cand_err < err:
                improved = True
                break
            lam *= lam_factor
        if not improved:
            break
        gain = err - cand_err
        values, err = cand, cand_err
        lam = max(lam / lam_factor, 1e-12)
        if gain < rel_tol * err + abs_tol:
            break
    return values, err


# ---------------------------------------------------------------------------
# Fixture graph builders (independent replays of the pipeline semantics)


def quat_to_R(q):
    """(w, x, y, z) -> rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def sqrt_info_of(info):
    return np.linalg.cholesky(np.asarray(info, float)).T


def graph_from_vro(log, sentinel=1e4):
    """Independent replay of ``build_pose_graph`` semantics: nodes in file
    order, identity fake-odo edges (info I*1e4) on sentinel rows, loop
    closures between existing nodes, sigma-1e-7 prior on node 0."""
    factors = []
    poses = []
    seq2slot = {}
    for k in range(len(log)):
        id_to, id_from = int(log.id_to[k]), int(log.id_from[k])
        info = np.asarray(log.info[k], float)
        failed = info[0, 0] == sentinel
        if not seq2slot:
            seq2slot[id_from] = 0
            poses.append((np.eye(3), np.zeros(3)))
            factors.append(prior_pose_factor(
                0, (np.eye(3), np.zeros(3)), np.eye(6) * 1e7))
        if id_from not in seq2slot:
            continue
        i = seq2slot[id_from]
        if failed:
            Rt = (np.eye(3), np.zeros(3))
            S = sqrt_info_of(np.eye(6) * sentinel)
        else:
            R, t = np_lie.se3_exp(np.asarray(log.xi[k], float))
            Rt = (R, t)
            S = sqrt_info_of(info)
        if id_to not in seq2slot:
            j = len(poses)
            seq2slot[id_to] = j
            poses.append(np_lie.compose(poses[i], Rt))
            factors.append(between_factor(i, j, Rt, S))
        else:
            if failed:
                continue
            factors.append(between_factor(i, seq2slot[id_to], Rt, S))
    return factors, NpValues(poses)


def graph_from_g2o(vertices, edges):
    """Independent replay of ``build_graph_from_g2o``: sorted vertex ids,
    sigma-1e-6 gauge prior on the first vertex."""
    ids = sorted(vertices)
    id2slot = {v: k for k, v in enumerate(ids)}
    poses = []
    for v in ids:
        t, q = vertices[v]
        poses.append((quat_to_R(q), np.asarray(t, float)))
    factors = [prior_pose_factor(0, poses[0], np.eye(6) * 1e6)]
    for (i, j, t, q, info) in edges:
        factors.append(between_factor(
            id2slot[i], id2slot[j], (quat_to_R(q), np.asarray(t, float)),
            sqrt_info_of(info)))
    return factors, NpValues(poses)
