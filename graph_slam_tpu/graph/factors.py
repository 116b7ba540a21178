"""Typed factor tables: struct-of-arrays, padded, masked, vmapped.

Replaces GTSAM's ``NonlinearFactorGraph`` of heap-allocated factor objects
(reference: ``/root/reference/gtsam/gtsam_graph.cpp`` builds PriorFactor /
BetweenFactor / CombinedImuFactor / OrientedPlane3Factor /
GenericProjectionFactor) with one dense table per factor type. Every row
carries its variable indices, measurement, square-root information, robust
parameters and an ``active`` mask; linearization is a ``vmap`` of
``jacfwd`` over rows, so relinearizing the whole graph is a single fused
XLA computation with static shapes.

Error convention matches GTSAM: factor error = 0.5 * ||whitened||^2 (or the
Huber loss of the whitened norm), summed by ``total_error`` — the quantity
the reference prints via ``CGraphGT::error`` (gtsam_graph.cpp:173-176).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3, so3
from ..noise.models import ROBUST_HUBER, huber_weight
from ..planes import oriented_plane
from .variables import VariableArena, layout_of

__all__ = [
    "PriorPoseTable",
    "BetweenPoseTable",
    "PriorVec3Table",
    "PriorVec6Table",
    "PlaneTable",
    "ImuTable",
    "ProjectionTable",
    "PriorPointTable",
    "FactorGraph",
    "total_error",
    "linearize_blocks",
    "empty_graph",
]


# ---------------------------------------------------------------------------
# Tables


class PriorPoseTable(NamedTuple):
    """PriorFactor<Pose3> rows (reference first-node prior, gtsam_graph.cpp:332-345)."""

    idx: jnp.ndarray       # (F,) int32 pose slot
    mean_R: jnp.ndarray    # (F, 3, 3)
    mean_t: jnp.ndarray    # (F, 3)
    sqrt_info: jnp.ndarray # (F, 6, 6)
    robust_kind: jnp.ndarray  # (F,) int32
    robust_k: jnp.ndarray     # (F,)
    active: jnp.ndarray       # (F,) bool


class BetweenPoseTable(NamedTuple):
    """BetweenFactor<Pose3> rows (VO edges, gtsam_graph.cpp:630-695)."""

    i: jnp.ndarray
    j: jnp.ndarray
    meas_R: jnp.ndarray
    meas_t: jnp.ndarray
    sqrt_info: jnp.ndarray  # (F, 6, 6)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class PriorVec3Table(NamedTuple):
    """PriorFactor<Vector3> rows — velocity priors (gtsam_graph.cpp:364)."""

    idx: jnp.ndarray
    mean: jnp.ndarray       # (F, 3)
    sqrt_info: jnp.ndarray  # (F, 3, 3)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class PriorVec6Table(NamedTuple):
    """PriorFactor<imuBias::ConstantBias> rows (gtsam_graph.cpp:365)."""

    idx: jnp.ndarray
    mean: jnp.ndarray       # (F, 6)
    sqrt_info: jnp.ndarray  # (F, 6, 6)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class PlaneTable(NamedTuple):
    """OrientedPlane3Factor rows (plane landmarks, gtsam_graph.cpp:1265-1289).

    ``meas`` is the plane observed in the *body frame* of pose ``pose_idx``;
    the predicted observation transforms the world-frame landmark plane into
    that frame and takes chart coordinates at the measurement.
    """

    pose_idx: jnp.ndarray
    plane_idx: jnp.ndarray
    meas: jnp.ndarray       # (F, 4) — (n, d) in body frame
    sqrt_info: jnp.ndarray  # (F, 3, 3)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class ImuTable(NamedTuple):
    """CombinedImuFactor rows (X,V,B at i -> X,V,B at j).

    Carries the preintegrated deltas, first-order bias Jacobians, the bias
    estimate used during integration, elapsed time and gravity; whitened by
    the 15x15 sqrt information of the propagated combined covariance.
    Residual ordering [r_R, r_p, r_v, r_ba, r_bg] matches
    ``imu.preintegration`` covariance ordering. Reference usage:
    ``test_vro_imu_graph.cpp:191-196`` (factor over X,V,B of consecutive
    keyframes with estimator->preintegration feedback at ``:344-350``).
    """

    i: jnp.ndarray           # (F,) int32 — shared index for X/V/B at i
    j: jnp.ndarray           # (F,) int32
    dR: jnp.ndarray          # (F,3,3)
    dp: jnp.ndarray          # (F,3)
    dv: jnp.ndarray          # (F,3)
    H_R_bg: jnp.ndarray      # (F,3,3)
    H_p_ba: jnp.ndarray
    H_p_bg: jnp.ndarray
    H_v_ba: jnp.ndarray
    H_v_bg: jnp.ndarray
    bias_hat: jnp.ndarray    # (F,6)
    dt: jnp.ndarray          # (F,)
    gravity: jnp.ndarray     # (F,3)
    sqrt_info: jnp.ndarray   # (F,15,15)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class ProjectionTable(NamedTuple):
    """GenericProjectionFactor<Pose3, Point3, Cal3DS2> rows.

    Reference: BA insertion with body_P_sensor = T_u2c and pixel sigma 1
    (gtsam_graph.cpp:370-448, 500-610). ``cal`` packs
    (fx, fy, s, u0, v0, k1, k2, p1, p2) per row; ``body_R``/``body_t`` is
    the body->sensor extrinsic.
    """

    pose_idx: jnp.ndarray   # (F,) int32
    point_idx: jnp.ndarray  # (F,) int32
    uv: jnp.ndarray         # (F, 2) measured pixel
    cal: jnp.ndarray        # (F, 9)
    body_R: jnp.ndarray     # (F, 3, 3)
    body_t: jnp.ndarray     # (F, 3)
    sqrt_info: jnp.ndarray  # (F, 2, 2)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class PriorPointTable(NamedTuple):
    """PriorFactor<Point3> rows (BA point anchors, sigma=0.014,
    gtsam_graph.cpp:484-489,538-543)."""

    idx: jnp.ndarray
    mean: jnp.ndarray       # (F, 3)
    sqrt_info: jnp.ndarray  # (F, 3, 3)
    robust_kind: jnp.ndarray
    robust_k: jnp.ndarray
    active: jnp.ndarray


class FactorGraph(NamedTuple):
    prior_pose: PriorPoseTable
    between: BetweenPoseTable
    prior_vel: PriorVec3Table
    prior_bias: PriorVec6Table
    plane: PlaneTable
    imu: ImuTable
    projection: ProjectionTable
    prior_point: PriorPointTable


# ---------------------------------------------------------------------------
# Residuals (unwhitened), one row at a time; vmapped by the linearizer.


def _prior_pose_res(values: VariableArena, row, delta):
    X = se3.retract(
        se3.Pose(values.pose_R[row.idx], values.pose_t[row.idx]), delta[:6]
    )
    return se3.local(se3.Pose(row.mean_R, row.mean_t), X)


def _between_res(values: VariableArena, row, delta):
    Xi = se3.retract(se3.Pose(values.pose_R[row.i], values.pose_t[row.i]), delta[:6])
    Xj = se3.retract(se3.Pose(values.pose_R[row.j], values.pose_t[row.j]), delta[6:])
    return se3.local(se3.Pose(row.meas_R, row.meas_t), se3.between(Xi, Xj))


def _prior_vec3_res(values: VariableArena, row, delta):
    return values.vel[row.idx] + delta - row.mean


def _prior_vec6_res(values: VariableArena, row, delta):
    return values.bias[row.idx] + delta - row.mean


def _plane_res(values: VariableArena, row, delta):
    X = se3.retract(
        se3.Pose(values.pose_R[row.pose_idx], values.pose_t[row.pose_idx]),
        delta[:6],
    )
    Lw = oriented_plane.retract(values.plane[row.plane_idx], delta[6:])
    predicted = oriented_plane.transform(Lw, X.R, X.t)
    return oriented_plane.error_vector(row.meas, predicted)


def _imu_res(values: VariableArena, row, delta):
    """CombinedImuFactor residual [r_R, r_p, r_v, r_ba, r_bg] (Forster).

    Bias-corrected deltas via first-order Jacobians around ``bias_hat``.
    """
    Xi = se3.retract(se3.Pose(values.pose_R[row.i], values.pose_t[row.i]),
                     delta[0:6])
    vi = values.vel[row.i] + delta[6:9]
    bi = values.bias[row.i] + delta[9:15]
    Xj = se3.retract(se3.Pose(values.pose_R[row.j], values.pose_t[row.j]),
                     delta[15:21])
    vj = values.vel[row.j] + delta[21:24]
    bj = values.bias[row.j] + delta[24:30]

    db = bi - row.bias_hat
    dba, dbg = db[:3], db[3:]
    dR = row.dR @ so3.expmap(row.H_R_bg @ dbg)
    dv = row.dv + row.H_v_ba @ dba + row.H_v_bg @ dbg
    dp = row.dp + row.H_p_ba @ dba + row.H_p_bg @ dbg

    g = row.gravity
    T = row.dt
    RiT = Xi.R.T
    r_R = so3.logmap(dR.T @ (RiT @ Xj.R))
    r_p = RiT @ (Xj.t - Xi.t - vi * T - 0.5 * g * T * T) - dp
    r_v = RiT @ (vj - vi - g * T) - dv
    r_b = bj - bi
    return jnp.concatenate([r_R, r_p, r_v, r_b])


def _projection_res(values: VariableArena, row, delta):
    """Pixel reprojection error: project(T_sensor^-1 q) - uv.

    T_sensor = X * body_P_sensor (GTSAM GenericProjectionFactor with
    body_P_sensor semantics).
    """
    from ..vision.cal3ds2 import Cal3DS2, project_point

    X = se3.retract(
        se3.Pose(values.pose_R[row.pose_idx], values.pose_t[row.pose_idx]),
        delta[:6],
    )
    q = values.point[row.point_idx] + delta[6:]
    T_ws = se3.compose(X, se3.Pose(row.body_R, row.body_t))
    p_cam = se3.transform_to(T_ws, q)
    K = Cal3DS2(*[row.cal[k] for k in range(9)])
    return project_point(K, p_cam) - row.uv


def _prior_point_res(values: VariableArena, row, delta):
    return values.point[row.idx] + delta - row.mean


# ---------------------------------------------------------------------------
# Generic per-type machinery


def _robust_scale(r, kind, k):
    """sqrt(weight) for the whitened residual norm, GTSAM robust semantics."""
    d = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(kind == ROBUST_HUBER, huber_weight(d, k), 1.0)
    return jnp.sqrt(w)


def _row_loss(r, kind, k):
    """Factor error: 0.5 d^2 (Gaussian) or Huber loss of whitened norm d."""
    d2 = jnp.sum(r * r, axis=-1)
    d = jnp.sqrt(jnp.where(d2 > 0, d2, 0.0))
    quad = 0.5 * d2
    hub = jnp.where(d <= k, quad, k * (d - 0.5 * k))
    return jnp.where(kind == ROBUST_HUBER, hub, quad)


def _type_error(res_fn, delta_dim):
    def err(values, table):
        def one(row):
            e = res_fn(values, row, jnp.zeros(delta_dim, values.pose_t.dtype))
            r = row.sqrt_info @ e
            return _row_loss(r, row.robust_kind, row.robust_k)

        losses = jax.vmap(one)(table)
        return jnp.sum(jnp.where(table.active, losses, 0.0))

    return err


def _type_linearize(res_fn, delta_dim):
    def lin(values, table):
        def one(row):
            def whitened(delta):
                return row.sqrt_info @ res_fn(values, row, delta)

            r = whitened(jnp.zeros(delta_dim, values.pose_t.dtype))
            J = jax.jacfwd(whitened)(jnp.zeros(delta_dim, values.pose_t.dtype))
            s = _robust_scale(r, row.robust_kind, row.robust_k)
            return r * s, J * s

        r, J = jax.vmap(one)(table)
        mask = table.active.astype(r.dtype)
        return r * mask[:, None], J * mask[:, None, None]

    return lin


_imu_error = _type_error(_imu_res, 30)
_imu_lin = _type_linearize(_imu_res, 30)
_projection_error = _type_error(_projection_res, 9)
_projection_lin = _type_linearize(_projection_res, 9)
_prior_point_error = _type_error(_prior_point_res, 3)
_prior_point_lin = _type_linearize(_prior_point_res, 3)

_prior_pose_error = _type_error(_prior_pose_res, 6)
_between_error = _type_error(_between_res, 12)
_prior_vec3_error = _type_error(_prior_vec3_res, 3)
_prior_vec6_error = _type_error(_prior_vec6_res, 6)
_plane_error = _type_error(_plane_res, 9)

def _prior_pose_lin(values: VariableArena, table):
    """Closed-form linearization of PriorFactor<Pose3>.

    e = Log(m^-1 X); under the expmap retract, de/d(delta) = Jr^-1(e)
    exactly. Cross-checked against jacfwd in tests/test_jacobians.py.
    """
    X = se3.Pose(values.pose_R[table.idx], values.pose_t[table.idx])
    m = se3.Pose(table.mean_R, table.mean_t)
    e = se3.local(m, X)
    J = table.sqrt_info @ se3.right_jacobian_inverse(e)
    r = jnp.einsum("fij,fj->fi", table.sqrt_info, e)
    s = _robust_scale(r, table.robust_kind, table.robust_k)
    mask = table.active.astype(r.dtype) * s
    return r * mask[:, None], J * mask[:, None, None]


def _between_lin(values: VariableArena, table):
    """Closed-form linearization of BetweenFactor<Pose3>.

    h = Xi^-1 Xj, e = Log(m^-1 h). Exactly, under expmap retracts:
      de/d(delta_j) =  Jr^-1(e)
      de/d(delta_i) = -Jr^-1(e) Ad(h^-1)
    (compose-with-Exp identities only; no small-angle assumptions).
    """
    Xi = se3.Pose(values.pose_R[table.i], values.pose_t[table.i])
    Xj = se3.Pose(values.pose_R[table.j], values.pose_t[table.j])
    h = se3.between(Xi, Xj)
    e = se3.local(se3.Pose(table.meas_R, table.meas_t), h)
    Jri = se3.right_jacobian_inverse(e)
    Jj = Jri
    Ji = -Jri @ se3.adjoint(se3.inverse(h))
    S = table.sqrt_info
    r = jnp.einsum("fij,fj->fi", S, e)
    J = jnp.concatenate([S @ Ji, S @ Jj], axis=-1)  # (F, 6, 12)
    s = _robust_scale(r, table.robust_kind, table.robust_k)
    mask = table.active.astype(r.dtype) * s
    return r * mask[:, None], J * mask[:, None, None]
_prior_vec3_lin = _type_linearize(_prior_vec3_res, 3)
_prior_vec6_lin = _type_linearize(_prior_vec6_res, 6)
_plane_lin = _type_linearize(_plane_res, 9)


@jax.jit
def total_error(graph: FactorGraph, values: VariableArena):
    """GTSAM ``NonlinearFactorGraph::error``: sum of factor losses.

    Capacity-0 tables are skipped at trace time — an unused factor type
    costs nothing to compile or run.
    """
    e = jnp.zeros((), values.pose_t.dtype)
    if graph.prior_pose.idx.shape[0]:
        e += _prior_pose_error(values, graph.prior_pose)
    if graph.between.i.shape[0]:
        e += _between_error(values, graph.between)
    if graph.prior_vel.idx.shape[0]:
        e += _prior_vec3_error(values, graph.prior_vel)
    if graph.prior_bias.idx.shape[0]:
        e += _prior_vec6_error(values, graph.prior_bias)
    if graph.plane.pose_idx.shape[0]:
        e += _plane_error(values, graph.plane)
    if graph.imu.i.shape[0]:
        e += _imu_error(values, graph.imu)
    if graph.projection.pose_idx.shape[0]:
        e += _projection_error(values, graph.projection)
    if graph.prior_point.idx.shape[0]:
        e += _prior_point_error(values, graph.prior_point)
    return e


def linearize_blocks(graph: FactorGraph, values: VariableArena):
    """Whitened, robust-weighted, masked (r, J, cols) per factor type.

    Returns a list of blocks ``(r: (F, e), J: (F, e, td), cols: (F, td))``
    with ``cols`` indexing the global tangent layout.
    """
    lay = layout_of(values)
    blocks = []

    if graph.prior_pose.idx.shape[0]:
        r, J = _prior_pose_lin(values, graph.prior_pose)
        blocks.append((r, J, lay.pose_cols(graph.prior_pose.idx)))

    if graph.between.i.shape[0]:
        r, J = _between_lin(values, graph.between)
        cols = jnp.concatenate(
            [lay.pose_cols(graph.between.i), lay.pose_cols(graph.between.j)],
            axis=-1,
        )
        blocks.append((r, J, cols))

    if graph.prior_vel.idx.shape[0]:
        r, J = _prior_vec3_lin(values, graph.prior_vel)
        blocks.append((r, J, lay.vel_cols(graph.prior_vel.idx)))

    if graph.prior_bias.idx.shape[0]:
        r, J = _prior_vec6_lin(values, graph.prior_bias)
        blocks.append((r, J, lay.bias_cols(graph.prior_bias.idx)))

    if graph.plane.pose_idx.shape[0]:
        r, J = _plane_lin(values, graph.plane)
        cols = jnp.concatenate(
            [
                lay.pose_cols(graph.plane.pose_idx),
                lay.plane_cols(graph.plane.plane_idx),
            ],
            axis=-1,
        )
        blocks.append((r, J, cols))

    if graph.imu.i.shape[0]:
        r, J = _imu_lin(values, graph.imu)
        cols = jnp.concatenate(
            [
                lay.pose_cols(graph.imu.i), lay.vel_cols(graph.imu.i),
                lay.bias_cols(graph.imu.i),
                lay.pose_cols(graph.imu.j), lay.vel_cols(graph.imu.j),
                lay.bias_cols(graph.imu.j),
            ],
            axis=-1,
        )
        blocks.append((r, J, cols))

    if graph.projection.pose_idx.shape[0]:
        r, J = _projection_lin(values, graph.projection)
        cols = jnp.concatenate(
            [
                lay.pose_cols(graph.projection.pose_idx),
                lay.point_cols(graph.projection.point_idx),
            ],
            axis=-1,
        )
        blocks.append((r, J, cols))

    if graph.prior_point.idx.shape[0]:
        r, J = _prior_point_lin(values, graph.prior_point)
        blocks.append((r, J, lay.point_cols(graph.prior_point.idx)))

    return blocks


# ---------------------------------------------------------------------------
# Empty-table constructors


def empty_prior_pose(cap, dtype=jnp.float64) -> PriorPoseTable:
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (cap, 3, 3))
    return PriorPoseTable(
        idx=jnp.zeros((cap,), jnp.int32),
        mean_R=eyeR,
        mean_t=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 6, 6), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_between(cap, dtype=jnp.float64) -> BetweenPoseTable:
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (cap, 3, 3))
    return BetweenPoseTable(
        i=jnp.zeros((cap,), jnp.int32),
        j=jnp.zeros((cap,), jnp.int32),
        meas_R=eyeR,
        meas_t=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 6, 6), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_prior_vec3(cap, dtype=jnp.float64) -> PriorVec3Table:
    return PriorVec3Table(
        idx=jnp.zeros((cap,), jnp.int32),
        mean=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 3, 3), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_prior_vec6(cap, dtype=jnp.float64) -> PriorVec6Table:
    return PriorVec6Table(
        idx=jnp.zeros((cap,), jnp.int32),
        mean=jnp.zeros((cap, 6), dtype),
        sqrt_info=jnp.zeros((cap, 6, 6), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_plane_table(cap, dtype=jnp.float64) -> PlaneTable:
    meas = jnp.zeros((cap, 4), dtype)
    if cap:
        meas = meas.at[:, 2].set(1.0)
    return PlaneTable(
        pose_idx=jnp.zeros((cap,), jnp.int32),
        plane_idx=jnp.zeros((cap,), jnp.int32),
        meas=meas,
        sqrt_info=jnp.zeros((cap, 3, 3), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_imu_table(cap, dtype=jnp.float64) -> ImuTable:
    eyeR = jnp.tile(jnp.eye(3, dtype=dtype), (cap, 1, 1))

    # distinct buffers per field: the online engine donates the whole table
    # to its row writer, and XLA rejects aliased donated arguments
    def z33():
        return jnp.zeros((cap, 3, 3), dtype)

    return ImuTable(
        i=jnp.zeros((cap,), jnp.int32), j=jnp.zeros((cap,), jnp.int32),
        dR=eyeR, dp=jnp.zeros((cap, 3), dtype), dv=jnp.zeros((cap, 3), dtype),
        H_R_bg=z33(), H_p_ba=z33(), H_p_bg=z33(), H_v_ba=z33(), H_v_bg=z33(),
        bias_hat=jnp.zeros((cap, 6), dtype),
        dt=jnp.ones((cap,), dtype),
        gravity=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 15, 15), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_projection_table(cap, dtype=jnp.float64) -> ProjectionTable:
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (cap, 3, 3))
    cal = jnp.zeros((cap, 9), dtype)
    if cap:
        cal = cal.at[:, 0].set(1.0).at[:, 1].set(1.0)
    return ProjectionTable(
        pose_idx=jnp.zeros((cap,), jnp.int32),
        point_idx=jnp.zeros((cap,), jnp.int32),
        uv=jnp.zeros((cap, 2), dtype),
        cal=cal,
        body_R=eyeR,
        body_t=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 2, 2), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_prior_point(cap, dtype=jnp.float64) -> PriorPointTable:
    return PriorPointTable(
        idx=jnp.zeros((cap,), jnp.int32),
        mean=jnp.zeros((cap, 3), dtype),
        sqrt_info=jnp.zeros((cap, 3, 3), dtype),
        robust_kind=jnp.zeros((cap,), jnp.int32),
        robust_k=jnp.ones((cap,), dtype),
        active=jnp.zeros((cap,), bool),
    )


def empty_graph(
    prior_pose_cap=0,
    between_cap=0,
    prior_vel_cap=0,
    prior_bias_cap=0,
    plane_cap=0,
    imu_cap=0,
    projection_cap=0,
    prior_point_cap=0,
    dtype=jnp.float64,
) -> FactorGraph:
    return FactorGraph(
        prior_pose=empty_prior_pose(prior_pose_cap, dtype),
        between=empty_between(between_cap, dtype),
        prior_vel=empty_prior_vec3(prior_vel_cap, dtype),
        prior_bias=empty_prior_vec6(prior_bias_cap, dtype),
        plane=empty_plane_table(plane_cap, dtype),
        imu=empty_imu_table(imu_cap, dtype),
        projection=empty_projection_table(projection_cap, dtype),
        prior_point=empty_prior_point(prior_point_cap, dtype),
    )
