"""Online graph engine: preallocated arenas + jitted row appenders.

TPU-native replacement for the reference's grow-as-you-go graph
(``CGraphGT::addNode`` online pipeline, gtsam_graph.cpp:1670-1766, and the
ISAM2 incremental path ``optimizeGraphIncremental`` ``:1768-1776``): instead
of heap-allocating factors, the arena is preallocated at capacity and every
"add" is a jitted in-place row write (``.at[slot].set``) plus a counter
bump. Nothing ever changes shape, so the optimizer never recompiles while
the trajectory grows; adding a keyframe costs one fused device kernel.

``IncrementalOptimizer`` is the ISAM2-equivalent: warm-started damped GN
steps on the full (masked) graph at a configurable cadence. It matches
ISAM2's *estimate quality* (SURVEY.md §7.7) rather than the Bayes-tree
algorithm, which is hostile to static dataflow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from .factors import FactorGraph, total_error
from .variables import VariableArena
from .lm import LMParams, lm_optimize, gn_optimize

__all__ = ["OnlineCounts", "OnlineGraph", "IncrementalOptimizer"]


class OnlineCounts(NamedTuple):
    prior_pose: jnp.ndarray
    between: jnp.ndarray
    prior_vel: jnp.ndarray
    prior_bias: jnp.ndarray
    plane: jnp.ndarray
    imu: jnp.ndarray


def _zero_counts() -> OnlineCounts:
    z = jnp.zeros((), jnp.int32)
    return OnlineCounts(z, z, z, z, z, z)


# ---------------------------------------------------------------------------
# jitted appenders (functional: return updated pytrees)


@jax.jit
def _append_between(graph: FactorGraph, slot, i, j, R, t, sqrt_info):
    tb = graph.between
    tb = tb._replace(
        i=tb.i.at[slot].set(i), j=tb.j.at[slot].set(j),
        meas_R=tb.meas_R.at[slot].set(R), meas_t=tb.meas_t.at[slot].set(t),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(between=tb)


@jax.jit
def _append_prior_pose(graph: FactorGraph, slot, idx, R, t, sqrt_info):
    tb = graph.prior_pose
    tb = tb._replace(
        idx=tb.idx.at[slot].set(idx),
        mean_R=tb.mean_R.at[slot].set(R), mean_t=tb.mean_t.at[slot].set(t),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(prior_pose=tb)


@jax.jit
def _append_prior_vel(graph: FactorGraph, slot, idx, mean, sqrt_info):
    tb = graph.prior_vel
    tb = tb._replace(
        idx=tb.idx.at[slot].set(idx), mean=tb.mean.at[slot].set(mean),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(prior_vel=tb)


@jax.jit
def _append_prior_bias(graph: FactorGraph, slot, idx, mean, sqrt_info):
    tb = graph.prior_bias
    tb = tb._replace(
        idx=tb.idx.at[slot].set(idx), mean=tb.mean.at[slot].set(mean),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(prior_bias=tb)


@jax.jit
def _append_plane_factor(graph: FactorGraph, slot, pose_idx, plane_idx, meas,
                         sqrt_info):
    tb = graph.plane
    tb = tb._replace(
        pose_idx=tb.pose_idx.at[slot].set(pose_idx),
        plane_idx=tb.plane_idx.at[slot].set(plane_idx),
        meas=tb.meas.at[slot].set(meas),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(plane=tb)


@jax.jit
def _append_imu(graph: FactorGraph, slot, i, j, dR, dp, dv, H_R_bg, H_p_ba,
                H_p_bg, H_v_ba, H_v_bg, bias_hat, dt, gravity, cov):
    """Whitening (inverse Cholesky of the 15x15 covariance) runs on device."""
    C = 0.5 * (cov + cov.T)
    L = jnp.linalg.cholesky(C)
    S = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(15, dtype=cov.dtype), lower=True
    )
    tb = graph.imu
    tb = tb._replace(
        i=tb.i.at[slot].set(i), j=tb.j.at[slot].set(j),
        dR=tb.dR.at[slot].set(dR), dp=tb.dp.at[slot].set(dp),
        dv=tb.dv.at[slot].set(dv),
        H_R_bg=tb.H_R_bg.at[slot].set(H_R_bg),
        H_p_ba=tb.H_p_ba.at[slot].set(H_p_ba),
        H_p_bg=tb.H_p_bg.at[slot].set(H_p_bg),
        H_v_ba=tb.H_v_ba.at[slot].set(H_v_ba),
        H_v_bg=tb.H_v_bg.at[slot].set(H_v_bg),
        bias_hat=tb.bias_hat.at[slot].set(bias_hat),
        dt=tb.dt.at[slot].set(dt),
        gravity=tb.gravity.at[slot].set(gravity),
        sqrt_info=tb.sqrt_info.at[slot].set(S),
        active=tb.active.at[slot].set(True),
    )
    return graph._replace(imu=tb)


@jax.jit
def _set_pose(values: VariableArena, idx, R, t, bump):
    return values._replace(
        pose_R=values.pose_R.at[idx].set(R),
        pose_t=values.pose_t.at[idx].set(t),
        num_poses=jnp.maximum(values.num_poses, idx.astype(jnp.int32) + bump),
    )


@jax.jit
def _set_vel(values: VariableArena, idx, v, bump):
    return values._replace(
        vel=values.vel.at[idx].set(v),
        num_vels=jnp.maximum(values.num_vels, idx.astype(jnp.int32) + bump),
    )


@jax.jit
def _set_bias(values: VariableArena, idx, b, bump):
    return values._replace(
        bias=values.bias.at[idx].set(b),
        num_biases=jnp.maximum(values.num_biases, idx.astype(jnp.int32) + bump),
    )


@jax.jit
def _set_plane(values: VariableArena, idx, p, bump):
    return values._replace(
        plane=values.plane.at[idx].set(p),
        num_planes=jnp.maximum(values.num_planes, idx.astype(jnp.int32) + bump),
    )


class OnlineGraph:
    """Mutable facade over the functional arenas with host-side slot counters.

    All methods are thin wrappers over jitted row writers; the graph/values
    pytrees keep constant shapes for their whole lifetime.
    """

    def __init__(self, graph: FactorGraph, values: VariableArena):
        self.graph = graph
        self.values = values
        self._n = {
            "prior_pose": 0, "between": 0, "prior_vel": 0,
            "prior_bias": 0, "plane": 0, "imu": 0,
        }
        self.num_poses = int(values.num_poses)
        self.num_vels = int(values.num_vels)
        self.num_biases = int(values.num_biases)
        self.num_planes = int(values.num_planes)

    # -- variables ------------------------------------------------------
    def set_pose(self, idx: int, pose: se3.Pose, new: bool = True):
        self.values = _set_pose(self.values, jnp.asarray(idx), pose.R, pose.t,
                                jnp.asarray(1 if new else 0, jnp.int32))
        if new:
            self.num_poses = max(self.num_poses, idx + 1)

    def set_vel(self, idx: int, v, new: bool = True):
        self.values = _set_vel(self.values, jnp.asarray(idx), jnp.asarray(v),
                               jnp.asarray(1 if new else 0, jnp.int32))
        if new:
            self.num_vels = max(self.num_vels, idx + 1)

    def set_bias(self, idx: int, b, new: bool = True):
        self.values = _set_bias(self.values, jnp.asarray(idx), jnp.asarray(b),
                                jnp.asarray(1 if new else 0, jnp.int32))
        if new:
            self.num_biases = max(self.num_biases, idx + 1)

    def set_plane(self, idx: int, p, new: bool = True):
        self.values = _set_plane(self.values, jnp.asarray(idx), jnp.asarray(p),
                                 jnp.asarray(1 if new else 0, jnp.int32))
        if new:
            self.num_planes = max(self.num_planes, idx + 1)

    # -- factors ----------------------------------------------------------
    def _slot(self, key: str, cap: int) -> int:
        s = self._n[key]
        if s >= cap:
            raise RuntimeError(
                f"factor arena '{key}' full ({cap}); rebuild with larger capacity"
            )
        self._n[key] = s + 1
        return s

    def add_prior_pose(self, idx, pose: se3.Pose, sqrt_info):
        s = self._slot("prior_pose", self.graph.prior_pose.idx.shape[0])
        self.graph = _append_prior_pose(
            self.graph, jnp.asarray(s), jnp.asarray(idx), pose.R, pose.t,
            jnp.asarray(sqrt_info))

    def add_between(self, i, j, meas: se3.Pose, sqrt_info):
        s = self._slot("between", self.graph.between.i.shape[0])
        self.graph = _append_between(
            self.graph, jnp.asarray(s), jnp.asarray(i), jnp.asarray(j),
            meas.R, meas.t, jnp.asarray(sqrt_info))

    def add_prior_vel(self, idx, mean, sqrt_info):
        s = self._slot("prior_vel", self.graph.prior_vel.idx.shape[0])
        self.graph = _append_prior_vel(
            self.graph, jnp.asarray(s), jnp.asarray(idx), jnp.asarray(mean),
            jnp.asarray(sqrt_info))

    def add_prior_bias(self, idx, mean, sqrt_info):
        s = self._slot("prior_bias", self.graph.prior_bias.idx.shape[0])
        self.graph = _append_prior_bias(
            self.graph, jnp.asarray(s), jnp.asarray(idx), jnp.asarray(mean),
            jnp.asarray(sqrt_info))

    def add_plane_factor(self, pose_idx, plane_idx, meas, sqrt_info):
        s = self._slot("plane", self.graph.plane.pose_idx.shape[0])
        self.graph = _append_plane_factor(
            self.graph, jnp.asarray(s), jnp.asarray(pose_idx),
            jnp.asarray(plane_idx), jnp.asarray(meas), jnp.asarray(sqrt_info))

    def add_imu_factor(self, i, j, preint, gravity):
        s = self._slot("imu", self.graph.imu.i.shape[0])
        self.graph = _append_imu(
            self.graph, jnp.asarray(s), jnp.asarray(i), jnp.asarray(j),
            preint.dR, preint.dp, preint.dv, preint.H_R_bg, preint.H_p_ba,
            preint.H_p_bg, preint.H_v_ba, preint.H_v_bg, preint.bias_hat,
            preint.dt, jnp.asarray(gravity), preint.cov)

    # -- queries ----------------------------------------------------------
    def pose(self, idx: int) -> se3.Pose:
        return se3.Pose(self.values.pose_R[idx], self.values.pose_t[idx])

    def error(self) -> float:
        return float(total_error(self.graph, self.values))


class IncrementalOptimizer:
    """ISAM2-equivalent incremental estimation.

    Every ``update()`` runs ``iters_per_update`` damped GN steps warm-started
    from the previous estimate (the analog of relinearize-threshold-0.1 /
    skip-1 ISAM2 updates, gtsam_graph.cpp:93-99); a full LM solve can be
    requested at any time (the reference's periodic batch optimize).
    """

    def __init__(self, iters_per_update: int = 1, damping: float = 1e-6,
                 solver: str = "dense"):
        self.iters = iters_per_update
        self.damping = damping
        self.solver = solver

    def update(self, og: OnlineGraph):
        res = gn_optimize(og.graph, og.values, iterations=self.iters,
                          solver=self.solver, damping=self.damping)
        og.values = res.values
        return res

    def full_batch(self, og: OnlineGraph, params: LMParams = LMParams()):
        res = lm_optimize(og.graph, og.values, params)
        og.values = res.values
        return res
