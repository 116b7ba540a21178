"""Host-side graph construction: append factors, freeze to padded arenas.

Plays the role of the reference's imperative graph manager ``CGraphGT``
(``/root/reference/gtsam/gtsam_graph.h:46-150``): callers add nodes and
factors one by one; ``build()`` freezes everything into the static-shape
``FactorGraph`` + ``VariableArena`` pytrees the jitted optimizers consume.
Capacities round up to buckets so a growing graph only recompiles when it
crosses a bucket boundary.

Pure numpy on the host — device arrays are created once at ``build()``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .factors import (
    BetweenPoseTable,
    FactorGraph,
    ImuTable,
    PlaneTable,
    PriorPointTable,
    PriorPoseTable,
    PriorVec3Table,
    PriorVec6Table,
    ProjectionTable,
)
from .variables import VariableArena

__all__ = ["GraphBuilder", "round_up"]


def round_up(n: int, bucket: int = 64) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def _upload(x, dtype=None):
    """Host-cast then upload: ``jnp.asarray(np_f64_array, f32)`` is an
    eager convert_element_type PROGRAM — one remote compile + dispatch
    per distinct shape over the axon TPU tunnel (the 53 converts of a
    100k-landmark BA build measured 646 s; host-side casting makes each
    a pure transfer). Also avoids the x64-truncation warnings on CPU."""
    if dtype is not None:
        x = np.asarray(x, np.dtype(jnp.dtype(dtype).name))
    else:
        x = np.asarray(x)
    return jnp.asarray(x)


def _sqrt_info(dim, sqrt_info=None, sigmas=None, information=None,
               covariance=None, sigma=None):
    if sqrt_info is not None:
        return np.asarray(sqrt_info, np.float64)
    if sigmas is not None:
        return np.diag(1.0 / np.asarray(sigmas, np.float64))
    if sigma is not None:
        return np.eye(dim) / float(sigma)
    if information is not None:
        info = np.asarray(information, np.float64)
        return np.linalg.cholesky(info).T
    if covariance is not None:
        cov = np.asarray(covariance, np.float64)
        return np.linalg.cholesky(np.linalg.inv(cov)).T
    raise ValueError("one of sqrt_info/sigmas/sigma/information/covariance required")


def _as_Rt(pose):
    """Accept (R, t) tuple, 4x4 matrix, or an se3.Pose."""
    if hasattr(pose, "R") and hasattr(pose, "t"):
        return np.asarray(pose.R, np.float64), np.asarray(pose.t, np.float64)
    if isinstance(pose, (tuple, list)) and len(pose) == 2:
        return np.asarray(pose[0], np.float64), np.asarray(pose[1], np.float64)
    pose = np.asarray(pose, np.float64)
    if pose.shape == (4, 4):
        return pose[:3, :3], pose[:3, 3]
    raise ValueError(f"cannot interpret pose with shape {pose.shape}")


class _Rows:
    def __init__(self):
        self.rows = []

    def add(self, **kw):
        self.rows.append(kw)

    def col(self, name, default=None):
        return [r.get(name, default) for r in self.rows]

    def __len__(self):
        return len(self.rows)


class GraphBuilder:
    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self._poses: list[tuple[np.ndarray, np.ndarray]] = []
        self._vels: list[np.ndarray] = []
        self._biases: list[np.ndarray] = []
        self._planes: list[np.ndarray] = []
        self._points: list[np.ndarray] = []
        self._prior_pose = _Rows()
        self._between = _Rows()
        self._prior_vel = _Rows()
        self._prior_bias = _Rows()
        self._plane_factors = _Rows()
        self._imu_factors = _Rows()
        self._projection = _Rows()
        self._prior_point = _Rows()

    # -- variables -----------------------------------------------------
    def add_pose(self, pose) -> int:
        R, t = _as_Rt(pose)
        self._poses.append((R, t))
        return len(self._poses) - 1

    def set_pose(self, idx: int, pose):
        R, t = _as_Rt(pose)
        self._poses[idx] = (R, t)

    def add_vel(self, v) -> int:
        self._vels.append(np.asarray(v, np.float64))
        return len(self._vels) - 1

    def add_bias(self, b) -> int:
        self._biases.append(np.asarray(b, np.float64))
        return len(self._biases) - 1

    def add_plane(self, plane4) -> int:
        p = np.asarray(plane4, np.float64)
        n = np.linalg.norm(p[:3])
        self._planes.append(p / n)
        return len(self._planes) - 1

    def add_point(self, p) -> int:
        self._points.append(np.asarray(p, np.float64))
        return len(self._points) - 1

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    def pose(self, idx: int):
        return self._poses[idx]

    # -- factors --------------------------------------------------------
    def add_prior_pose(self, idx: int, pose, robust=None, **noise):
        R, t = _as_Rt(pose)
        self._prior_pose.add(idx=idx, R=R, t=t, S=_sqrt_info(6, **noise),
                             robust=robust)

    def add_between(self, i: int, j: int, pose, robust=None, **noise):
        R, t = _as_Rt(pose)
        self._between.add(i=i, j=j, R=R, t=t, S=_sqrt_info(6, **noise),
                          robust=robust)

    def add_prior_vel(self, idx: int, mean, robust=None, **noise):
        self._prior_vel.add(idx=idx, mean=np.asarray(mean, np.float64),
                            S=_sqrt_info(3, **noise), robust=robust)

    def add_prior_bias(self, idx: int, mean, robust=None, **noise):
        self._prior_bias.add(idx=idx, mean=np.asarray(mean, np.float64),
                             S=_sqrt_info(6, **noise), robust=robust)

    def add_plane_factor(self, pose_idx: int, plane_idx: int, meas4,
                         robust=None, **noise):
        m = np.asarray(meas4, np.float64)
        m = m / np.linalg.norm(m[:3])
        self._plane_factors.add(pose_idx=pose_idx, plane_idx=plane_idx,
                                meas=m, S=_sqrt_info(3, **noise), robust=robust)

    def add_imu_factor(self, i: int, j: int, preint, gravity, robust=None,
                       cov=None):
        """CombinedImuFactor row from a PreintState (see imu.preintegration).

        ``gravity``: (3,) world gravity vector (from ImuParams).
        ``cov`` overrides the preintegrated covariance if given; whitening is
        the inverse Cholesky factor of the 15x15 covariance.
        """
        C = np.asarray(cov if cov is not None else preint.cov, np.float64)
        C = 0.5 * (C + C.T)
        L = np.linalg.cholesky(C)
        S = np.linalg.inv(L)
        self._imu_factors.add(
            i=i, j=j,
            dR=np.asarray(preint.dR, np.float64),
            dp=np.asarray(preint.dp, np.float64),
            dv=np.asarray(preint.dv, np.float64),
            H_R_bg=np.asarray(preint.H_R_bg, np.float64),
            H_p_ba=np.asarray(preint.H_p_ba, np.float64),
            H_p_bg=np.asarray(preint.H_p_bg, np.float64),
            H_v_ba=np.asarray(preint.H_v_ba, np.float64),
            H_v_bg=np.asarray(preint.H_v_bg, np.float64),
            bias_hat=np.asarray(preint.bias_hat, np.float64),
            dt=float(preint.dt),
            gravity=np.asarray(gravity, np.float64),
            S=S, robust=robust,
        )

    def add_projection_factor(self, pose_idx: int, point_idx: int, uv,
                              cal, body_pose=None, sigma=1.0, robust=None):
        """GenericProjectionFactor row; ``cal`` is a Cal3DS2-like object or a
        9-tuple (fx, fy, s, u0, v0, k1, k2, p1, p2)."""
        if hasattr(cal, "fx"):
            c = np.array([float(cal.fx), float(cal.fy),
                          float(getattr(cal, "s", 0.0)),
                          float(getattr(cal, "u0", getattr(cal, "cx", 0.0))),
                          float(getattr(cal, "v0", getattr(cal, "cy", 0.0))),
                          float(cal.k1), float(cal.k2),
                          float(cal.p1), float(cal.p2)])
        else:
            c = np.asarray(cal, np.float64)
            if c.shape[0] < 9:
                c = np.concatenate([c, np.zeros(9 - c.shape[0])])
        if body_pose is None:
            bR, bt = np.eye(3), np.zeros(3)
        else:
            bR, bt = _as_Rt(body_pose)
        self._projection.add(pose_idx=pose_idx, point_idx=point_idx,
                             uv=np.asarray(uv, np.float64), cal=c,
                             bR=bR, bt=bt, S=np.eye(2) / float(sigma),
                             robust=robust)

    def add_prior_point(self, idx: int, mean, robust=None, **noise):
        self._prior_point.add(idx=idx, mean=np.asarray(mean, np.float64),
                              S=_sqrt_info(3, **noise), robust=robust)

    # -- freeze ----------------------------------------------------------
    def _pad_table(self, rows: _Rows, cap: int, build_row_arrays):
        n = len(rows)
        robust = rows.col("robust")
        kind = np.zeros(cap, np.int32)
        k = np.ones(cap, np.float64)
        for r, rb in enumerate(robust):
            if rb is not None:
                kind[r] = 1
                k[r] = float(rb)
        active = np.zeros(cap, bool)
        active[:n] = True
        return build_row_arrays(n), kind, k, active

    def build(self, pose_cap=None, vel_cap=None, bias_cap=None,
              plane_cap=None, point_cap=None, factor_caps=None,
              bucket: int = 64):
        dt = self.dtype
        fc = factor_caps or {}

        def cap_for(n, given):
            if given is not None:
                return max(given, max(n, 1))
            return round_up(max(n, 1), bucket)

        Px = cap_for(len(self._poses), pose_cap)
        Pv = cap_for(len(self._vels), vel_cap) if self._vels else (vel_cap or 0)
        Pb = cap_for(len(self._biases), bias_cap) if self._biases else (bias_cap or 0)
        Pl = cap_for(len(self._planes), plane_cap) if self._planes else (plane_cap or 0)
        Pq = cap_for(len(self._points), point_cap) if self._points else (point_cap or 0)

        # values
        pose_R = np.tile(np.eye(3), (Px, 1, 1))
        pose_t = np.zeros((Px, 3))
        for i, (R, t) in enumerate(self._poses):
            pose_R[i], pose_t[i] = R, t
        vel = np.zeros((Pv, 3))
        for i, v in enumerate(self._vels):
            vel[i] = v
        bias = np.zeros((Pb, 6))
        for i, b in enumerate(self._biases):
            bias[i] = b
        plane = np.zeros((Pl, 4))
        plane[:, 2] = 1.0
        for i, p in enumerate(self._planes):
            plane[i] = p
        point = np.zeros((Pq, 3))
        for i, p in enumerate(self._points):
            point[i] = p

        values = VariableArena(
            pose_R=_upload(pose_R, dt), pose_t=_upload(pose_t, dt),
            vel=_upload(vel, dt), bias=_upload(bias, dt),
            plane=_upload(plane, dt), point=_upload(point, dt),
            num_poses=_upload(len(self._poses), jnp.int32),
            num_vels=_upload(len(self._vels), jnp.int32),
            num_biases=_upload(len(self._biases), jnp.int32),
            num_planes=_upload(len(self._planes), jnp.int32),
            num_points=_upload(len(self._points), jnp.int32),
        )

        # factor tables
        def freeze(rows: _Rows, cap_key, edim, fill):
            n = len(rows)
            if n == 0 and cap_key not in fc:
                cap = 0
            else:
                cap = fc.get(cap_key) or round_up(n, bucket)
            cap = max(cap, n)
            kind = np.zeros(cap, np.int32)
            kval = np.ones(cap, np.float64)
            for r, rb in enumerate(rows.col("robust")):
                if rb is not None:
                    kind[r], kval[r] = 1, float(rb)
            active = np.zeros(cap, bool)
            active[:n] = True
            S = np.zeros((cap, edim, edim))
            for r, Sr in enumerate(rows.col("S")):
                S[r] = Sr
            return cap, kind, kval, active, S, fill(cap)

        cap, kind, kval, active, S, (idxs, Rs, ts) = freeze(
            self._prior_pose, "prior_pose", 6,
            lambda c: (
                np.array(self._prior_pose.col("idx") + [0] * (c - len(self._prior_pose)), np.int32),
                np.concatenate([np.array(self._prior_pose.col("R")).reshape(-1, 3, 3),
                                np.tile(np.eye(3), (c - len(self._prior_pose), 1, 1))])
                if len(self._prior_pose) else np.tile(np.eye(3), (c, 1, 1)),
                np.concatenate([np.array(self._prior_pose.col("t")).reshape(-1, 3),
                                np.zeros((c - len(self._prior_pose), 3))])
                if len(self._prior_pose) else np.zeros((c, 3)),
            ))
        prior_pose = PriorPoseTable(
            idx=_upload(idxs), mean_R=_upload(Rs, dt),
            mean_t=_upload(ts, dt), sqrt_info=_upload(S, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        cap, kind, kval, active, S, (iis, jjs, Rs, ts) = freeze(
            self._between, "between", 6,
            lambda c: (
                np.array(self._between.col("i") + [0] * (c - len(self._between)), np.int32),
                np.array(self._between.col("j") + [0] * (c - len(self._between)), np.int32),
                np.concatenate([np.array(self._between.col("R")).reshape(-1, 3, 3),
                                np.tile(np.eye(3), (c - len(self._between), 1, 1))])
                if len(self._between) else np.tile(np.eye(3), (c, 1, 1)),
                np.concatenate([np.array(self._between.col("t")).reshape(-1, 3),
                                np.zeros((c - len(self._between), 3))])
                if len(self._between) else np.zeros((c, 3)),
            ))
        between = BetweenPoseTable(
            i=_upload(iis), j=_upload(jjs), meas_R=_upload(Rs, dt),
            meas_t=_upload(ts, dt), sqrt_info=_upload(S, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        cap, kind, kval, active, S, (idxs, means) = freeze(
            self._prior_vel, "prior_vel", 3,
            lambda c: (
                np.array(self._prior_vel.col("idx") + [0] * (c - len(self._prior_vel)), np.int32),
                np.concatenate([np.array(self._prior_vel.col("mean")).reshape(-1, 3),
                                np.zeros((c - len(self._prior_vel), 3))])
                if len(self._prior_vel) else np.zeros((c, 3)),
            ))
        prior_vel = PriorVec3Table(
            idx=_upload(idxs), mean=_upload(means, dt),
            sqrt_info=_upload(S, dt), robust_kind=_upload(kind),
            robust_k=_upload(kval, dt), active=_upload(active),
        )

        cap, kind, kval, active, S, (idxs, means) = freeze(
            self._prior_bias, "prior_bias", 6,
            lambda c: (
                np.array(self._prior_bias.col("idx") + [0] * (c - len(self._prior_bias)), np.int32),
                np.concatenate([np.array(self._prior_bias.col("mean")).reshape(-1, 6),
                                np.zeros((c - len(self._prior_bias), 6))])
                if len(self._prior_bias) else np.zeros((c, 6)),
            ))
        prior_bias = PriorVec6Table(
            idx=_upload(idxs), mean=_upload(means, dt),
            sqrt_info=_upload(S, dt), robust_kind=_upload(kind),
            robust_k=_upload(kval, dt), active=_upload(active),
        )

        cap, kind, kval, active, S, (pidx, lidx, meas) = freeze(
            self._plane_factors, "plane", 3,
            lambda c: (
                np.array(self._plane_factors.col("pose_idx") + [0] * (c - len(self._plane_factors)), np.int32),
                np.array(self._plane_factors.col("plane_idx") + [0] * (c - len(self._plane_factors)), np.int32),
                np.concatenate([np.array(self._plane_factors.col("meas")).reshape(-1, 4),
                                np.tile(np.array([0.0, 0.0, 1.0, 0.0]), (c - len(self._plane_factors), 1))])
                if len(self._plane_factors) else np.tile(np.array([0.0, 0.0, 1.0, 0.0]), (c, 1)),
            ))
        plane_tab = PlaneTable(
            pose_idx=_upload(pidx), plane_idx=_upload(lidx),
            meas=_upload(meas, dt), sqrt_info=_upload(S, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        # IMU table
        nimu = len(self._imu_factors)
        if nimu == 0 and "imu" not in fc:
            icap = 0
        else:
            icap = fc.get("imu") or round_up(nimu, bucket)
        icap = max(icap, nimu)

        def mat_col(name, shape, fill):
            out = np.tile(fill, (icap, *[1] * fill.ndim))
            for r, v in enumerate(self._imu_factors.col(name)):
                out[r] = v
            return out

        kind = np.zeros(icap, np.int32)
        kval = np.ones(icap, np.float64)
        active = np.zeros(icap, bool)
        active[:nimu] = True
        Simu = np.zeros((icap, 15, 15))
        for r, Sr in enumerate(self._imu_factors.col("S")):
            Simu[r] = Sr
        imu_tab = ImuTable(
            i=_upload(np.array(self._imu_factors.col("i") + [0] * (icap - nimu), np.int32)),
            j=_upload(np.array(self._imu_factors.col("j") + [0] * (icap - nimu), np.int32)),
            dR=_upload(mat_col("dR", (3, 3), np.eye(3)), dt),
            dp=_upload(mat_col("dp", (3,), np.zeros(3)), dt),
            dv=_upload(mat_col("dv", (3,), np.zeros(3)), dt),
            H_R_bg=_upload(mat_col("H_R_bg", (3, 3), np.zeros((3, 3))), dt),
            H_p_ba=_upload(mat_col("H_p_ba", (3, 3), np.zeros((3, 3))), dt),
            H_p_bg=_upload(mat_col("H_p_bg", (3, 3), np.zeros((3, 3))), dt),
            H_v_ba=_upload(mat_col("H_v_ba", (3, 3), np.zeros((3, 3))), dt),
            H_v_bg=_upload(mat_col("H_v_bg", (3, 3), np.zeros((3, 3))), dt),
            bias_hat=_upload(mat_col("bias_hat", (6,), np.zeros(6)), dt),
            dt=_upload(np.array([float(x) for x in self._imu_factors.col("dt")] + [1.0] * (icap - nimu)), dt),
            gravity=_upload(mat_col("gravity", (3,), np.zeros(3)), dt),
            sqrt_info=_upload(Simu, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        # projection table
        nproj = len(self._projection)
        if nproj == 0 and "projection" not in fc:
            pcap = 0
        else:
            pcap = max(fc.get("projection") or round_up(nproj, bucket), nproj)
        kind = np.zeros(pcap, np.int32)
        kval = np.ones(pcap, np.float64)
        active = np.zeros(pcap, bool)
        active[:nproj] = True
        for r, rb in enumerate(self._projection.col("robust")):
            if rb is not None:
                kind[r], kval[r] = 1, float(rb)
        Sproj = np.zeros((pcap, 2, 2))
        uv = np.zeros((pcap, 2))
        cal = np.zeros((pcap, 9)); cal[:, 0] = cal[:, 1] = 1.0
        bR = np.tile(np.eye(3), (pcap, 1, 1)); bt = np.zeros((pcap, 3))
        for r in range(nproj):
            row = self._projection.rows[r]
            Sproj[r] = row["S"]; uv[r] = row["uv"]; cal[r] = row["cal"]
            bR[r] = row["bR"]; bt[r] = row["bt"]
        proj_tab = ProjectionTable(
            pose_idx=_upload(np.array(self._projection.col("pose_idx") + [0] * (pcap - nproj), np.int32)),
            point_idx=_upload(np.array(self._projection.col("point_idx") + [0] * (pcap - nproj), np.int32)),
            uv=_upload(uv, dt), cal=_upload(cal, dt),
            body_R=_upload(bR, dt), body_t=_upload(bt, dt),
            sqrt_info=_upload(Sproj, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        # point-prior table
        npp = len(self._prior_point)
        if npp == 0 and "prior_point" not in fc:
            qcap = 0
        else:
            qcap = max(fc.get("prior_point") or round_up(npp, bucket), npp)
        kind = np.zeros(qcap, np.int32)
        kval = np.ones(qcap, np.float64)
        active = np.zeros(qcap, bool)
        active[:npp] = True
        for r, rb in enumerate(self._prior_point.col("robust")):
            if rb is not None:
                kind[r], kval[r] = 1, float(rb)
        Spp = np.zeros((qcap, 3, 3))
        means = np.zeros((qcap, 3))
        for r in range(npp):
            Spp[r] = self._prior_point.rows[r]["S"]
            means[r] = self._prior_point.rows[r]["mean"]
        pp_tab = PriorPointTable(
            idx=_upload(np.array(self._prior_point.col("idx") + [0] * (qcap - npp), np.int32)),
            mean=_upload(means, dt), sqrt_info=_upload(Spp, dt),
            robust_kind=_upload(kind), robust_k=_upload(kval, dt),
            active=_upload(active),
        )

        graph = FactorGraph(
            prior_pose=prior_pose, between=between, prior_vel=prior_vel,
            prior_bias=prior_bias, plane=plane_tab, imu=imu_tab,
            projection=proj_tab, prior_point=pp_tab,
        )
        return graph, values
