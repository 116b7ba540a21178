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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from .factors import FactorGraph, linearize_blocks, total_error
from .variables import (VariableArena, layout_of, retract_all,
                        used_slot_mask)
from .lm import LMParams, LMResult, lm_optimize, gn_optimize

__all__ = ["OnlineGraph", "IncrementalOptimizer",
           "window_graph", "windowed_gn", "between_row", "imu_row"]

# factor-table field order used for window starts/caps
_TABLES = ("prior_pose", "between", "prior_vel", "prior_bias", "plane",
           "imu", "projection", "prior_point")


# ---------------------------------------------------------------------------
# jitted appenders (functional: return the updated TABLE, which is donated
# so XLA writes the row in place; donating only the touched table avoids
# zero-size-buffer aliasing across the rest of the pytree)


def between_row(tb, slot, i, j, R, t, sqrt_info, robust_kind, robust_k,
                active=True):
    """Pure row write (shared by the jitted appender and fused steps)."""
    return tb._replace(
        i=tb.i.at[slot].set(i), j=tb.j.at[slot].set(j),
        meas_R=tb.meas_R.at[slot].set(R), meas_t=tb.meas_t.at[slot].set(t),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        robust_kind=tb.robust_kind.at[slot].set(robust_kind),
        robust_k=tb.robust_k.at[slot].set(robust_k),
        active=tb.active.at[slot].set(active),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_between(tb, slot, i, j, R, t, sqrt_info, robust_kind, robust_k):
    return between_row(tb, slot, i, j, R, t, sqrt_info, robust_kind,
                       robust_k)


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_prior_pose(tb, slot, idx, R, t, sqrt_info):
    return tb._replace(
        idx=tb.idx.at[slot].set(idx),
        mean_R=tb.mean_R.at[slot].set(R), mean_t=tb.mean_t.at[slot].set(t),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_prior_vec(tb, slot, idx, mean, sqrt_info):
    """Shared by the vel (3d) and bias (6d) prior tables."""
    return tb._replace(
        idx=tb.idx.at[slot].set(idx), mean=tb.mean.at[slot].set(mean),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_plane_factor(tb, slot, pose_idx, plane_idx, meas, sqrt_info):
    return tb._replace(
        pose_idx=tb.pose_idx.at[slot].set(pose_idx),
        plane_idx=tb.plane_idx.at[slot].set(plane_idx),
        meas=tb.meas.at[slot].set(meas),
        sqrt_info=tb.sqrt_info.at[slot].set(sqrt_info),
        active=tb.active.at[slot].set(True),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_plane_factors(tb, slots, pose_idx, plane_idx, meas, sqrt_info):
    """K rows in one program (the rescue step writes a whole detection's
    factors at once; per-row appends cost one dispatch each)."""
    return tb._replace(
        pose_idx=tb.pose_idx.at[slots].set(pose_idx),
        plane_idx=tb.plane_idx.at[slots].set(plane_idx),
        meas=tb.meas.at[slots].set(meas),
        sqrt_info=tb.sqrt_info.at[slots].set(sqrt_info),
        active=tb.active.at[slots].set(True),
    )


def imu_row(tb, slot, i, j, dR, dp, dv, H_R_bg, H_p_ba,
            H_p_bg, H_v_ba, H_v_bg, bias_hat, dt, gravity, cov,
            active=True):
    """Pure IMU row write incl. on-device whitening (inverse Cholesky of
    the 15x15 covariance); shared by the appender and fused steps."""
    C = 0.5 * (cov + cov.T)
    L = jnp.linalg.cholesky(C)
    S = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(15, dtype=cov.dtype), lower=True
    )
    return tb._replace(
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
        active=tb.active.at[slot].set(active),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_imu(tb, slot, i, j, dR, dp, dv, H_R_bg, H_p_ba,
                H_p_bg, H_v_ba, H_v_bg, bias_hat, dt, gravity, cov):
    return imu_row(tb, slot, i, j, dR, dp, dv, H_R_bg, H_p_ba,
                   H_p_bg, H_v_ba, H_v_bg, bias_hat, dt, gravity, cov)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _set_pose(pose_R, pose_t, num, idx, R, t, bump):
    return (pose_R.at[idx].set(R), pose_t.at[idx].set(t),
            jnp.maximum(num, idx.astype(jnp.int32) + bump))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _set_vec(arr, num, idx, v, bump):
    """Shared by vel/bias/plane value rows (any trailing width)."""
    return (arr.at[idx].set(v),
            jnp.maximum(num, idx.astype(jnp.int32) + bump))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _set_vec_batch(arr, num, idx, v, bump):
    """Batched _set_vec: many value rows in one device write."""
    return (arr.at[idx].set(v),
            jnp.maximum(num, jnp.max(idx).astype(jnp.int32) + bump))


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
        dt = self.values.pose_t.dtype
        R, t, num = _set_pose(
            self.values.pose_R, self.values.pose_t, self.values.num_poses,
            jnp.asarray(idx), jnp.asarray(pose.R, dt), jnp.asarray(pose.t, dt),
            jnp.asarray(1 if new else 0, jnp.int32))
        self.values = self.values._replace(pose_R=R, pose_t=t, num_poses=num)
        if new:
            self.num_poses = max(self.num_poses, idx + 1)

    def _set_vec_field(self, field: str, count_field: str, idx, v, new):
        dt = self.values.pose_t.dtype
        arr, num = _set_vec(getattr(self.values, field),
                            getattr(self.values, count_field),
                            jnp.asarray(idx), jnp.asarray(v, dt),
                            jnp.asarray(1 if new else 0, jnp.int32))
        self.values = self.values._replace(**{field: arr, count_field: num})

    def set_vel(self, idx: int, v, new: bool = True):
        self._set_vec_field("vel", "num_vels", idx, v, new)
        if new:
            self.num_vels = max(self.num_vels, idx + 1)

    def set_bias(self, idx: int, b, new: bool = True):
        self._set_vec_field("bias", "num_biases", idx, b, new)
        if new:
            self.num_biases = max(self.num_biases, idx + 1)

    def set_plane(self, idx: int, p, new: bool = True):
        # keep the OrientedPlane3 invariant ||n|| == 1 exactly: an almost-
        # unit measurement normal puts an irreducible floor on the sphere
        # chart residual (cos theta can never reach 1), which LM cannot
        # optimize away (GraphBuilder normalizes identically)
        cap = self.values.plane.shape[0]
        if idx >= cap:
            # JAX drops out-of-bounds scatters silently and the factor
            # row's clamp-gather would then corrupt landmark cap-1 — fail
            # loudly like the factor-table _slot guard instead
            raise RuntimeError(
                f"plane variable arena full ({cap}); grow(plane_var_cap=...)"
                " or raise VioConfig.plane_var_cap")
        p = np.asarray(p, np.float64)
        p = p / np.linalg.norm(p[:3])
        self._set_vec_field("plane", "num_planes", idx, p, new)
        if new:
            self.num_planes = max(self.num_planes, idx + 1)

    def set_planes(self, idxs, ps, new: bool = True):
        """Batched ``set_plane``: many landmark rows in ONE device write
        (the rescue host step stages its new landmarks and flushes them
        here — one dispatch instead of one per landmark)."""
        idxs = np.asarray(idxs, np.int64)
        if len(idxs) == 0:
            return
        cap = self.values.plane.shape[0]
        if int(idxs.max()) >= cap:
            raise RuntimeError(
                f"plane variable arena full ({cap}); grow(plane_var_cap=...)"
                " or raise VioConfig.plane_var_cap")
        ps = np.asarray(ps, np.float64)
        ps = ps / np.linalg.norm(ps[:, :3], axis=1, keepdims=True)
        dt = self.values.pose_t.dtype
        arr, num = _set_vec_batch(
            self.values.plane, self.values.num_planes, jnp.asarray(idxs),
            jnp.asarray(ps, dt), jnp.asarray(1 if new else 0, jnp.int32))
        self.values = self.values._replace(plane=arr, num_planes=num)
        if new:
            self.num_planes = max(self.num_planes, int(idxs.max()) + 1)

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
        dt = self.values.pose_t.dtype
        tb = _append_prior_pose(
            self.graph.prior_pose, jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(pose.R, dt), jnp.asarray(pose.t, dt),
            jnp.asarray(sqrt_info, dt))
        self.graph = self.graph._replace(prior_pose=tb)

    def add_between(self, i, j, meas: se3.Pose, sqrt_info, robust=None):
        s = self._slot("between", self.graph.between.i.shape[0])
        dt = self.graph.between.robust_k.dtype
        tb = _append_between(
            self.graph.between, jnp.asarray(s), jnp.asarray(i),
            jnp.asarray(j), jnp.asarray(meas.R, dt), jnp.asarray(meas.t, dt),
            jnp.asarray(sqrt_info, dt),
            jnp.asarray(0 if robust is None else 1, jnp.int32),
            jnp.asarray(1.0 if robust is None else float(robust), dt))
        self.graph = self.graph._replace(between=tb)

    def add_prior_vel(self, idx, mean, sqrt_info):
        s = self._slot("prior_vel", self.graph.prior_vel.idx.shape[0])
        dt = self.values.pose_t.dtype
        tb = _append_prior_vec(
            self.graph.prior_vel, jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(mean, dt), jnp.asarray(sqrt_info, dt))
        self.graph = self.graph._replace(prior_vel=tb)

    def add_prior_bias(self, idx, mean, sqrt_info):
        s = self._slot("prior_bias", self.graph.prior_bias.idx.shape[0])
        dt = self.values.pose_t.dtype
        tb = _append_prior_vec(
            self.graph.prior_bias, jnp.asarray(s), jnp.asarray(idx),
            jnp.asarray(mean, dt), jnp.asarray(sqrt_info, dt))
        self.graph = self.graph._replace(prior_bias=tb)

    def add_plane_factor(self, pose_idx, plane_idx, meas, sqrt_info):
        s = self._slot("plane", self.graph.plane.pose_idx.shape[0])
        dt = self.values.pose_t.dtype
        m = np.asarray(meas, np.float64)
        m = m / np.linalg.norm(m[:3])   # exact unit normal (see set_plane)
        tb = _append_plane_factor(
            self.graph.plane, jnp.asarray(s), jnp.asarray(pose_idx),
            jnp.asarray(plane_idx), jnp.asarray(m, dt),
            jnp.asarray(sqrt_info, dt))
        self.graph = self.graph._replace(plane=tb)

    def add_plane_factors(self, pose_idx, plane_idx, meas, sqrt_info):
        """Append K plane-factor rows in one jitted write."""
        k = len(pose_idx)
        if k == 0:
            return
        cap = self.graph.plane.pose_idx.shape[0]
        s0 = self._n["plane"]
        if s0 + k > cap:
            raise RuntimeError(
                f"factor arena 'plane' full ({cap}); rebuild with larger "
                "capacity")
        self._n["plane"] = s0 + k
        dt = self.values.pose_t.dtype
        m = np.asarray(meas, np.float64)
        m = m / np.linalg.norm(m[:, :3], axis=1, keepdims=True)
        tb = _append_plane_factors(
            self.graph.plane, jnp.arange(s0, s0 + k),
            jnp.asarray(np.asarray(pose_idx, np.int32)),
            jnp.asarray(np.asarray(plane_idx, np.int32)),
            jnp.asarray(m, dt), jnp.asarray(np.asarray(sqrt_info), dt))
        self.graph = self.graph._replace(plane=tb)

    def add_imu_factor(self, i, j, preint, gravity):
        s = self._slot("imu", self.graph.imu.i.shape[0])
        dt = self.values.pose_t.dtype
        tb = _append_imu(
            self.graph.imu, jnp.asarray(s), jnp.asarray(i), jnp.asarray(j),
            jnp.asarray(preint.dR, dt), jnp.asarray(preint.dp, dt),
            jnp.asarray(preint.dv, dt), jnp.asarray(preint.H_R_bg, dt),
            jnp.asarray(preint.H_p_ba, dt), jnp.asarray(preint.H_p_bg, dt),
            jnp.asarray(preint.H_v_ba, dt), jnp.asarray(preint.H_v_bg, dt),
            jnp.asarray(preint.bias_hat, dt), jnp.asarray(preint.dt, dt),
            jnp.asarray(gravity, dt), jnp.asarray(preint.cov, dt))
        self.graph = self.graph._replace(imu=tb)

    # -- queries ----------------------------------------------------------
    def pose(self, idx: int) -> se3.Pose:
        return se3.Pose(self.values.pose_R[idx], self.values.pose_t[idx])

    def error(self) -> float:
        return float(total_error(self.graph, self.values))

    # -- checkpoint / resume ------------------------------------------------
    def save_state(self, path: str) -> None:
        """Checkpoint the full engine state (arenas + factor tables +
        slot counters) to one ``.npz``.

        The reference's checkpointing is coarse file logs (VRO records,
        trajectories — SURVEY §5 'no mid-optimization checkpointing');
        the online engine checkpoints mid-run and resumes bit-exactly.
        """
        flat = {}
        for name in _TABLES:
            tb = getattr(self.graph, name)
            for field, leaf in zip(tb._fields, tb):
                flat[f"g.{name}.{field}"] = np.asarray(leaf)
        for field, leaf in zip(self.values._fields, self.values):
            flat[f"v.{field}"] = np.asarray(leaf)
        flat["n.slots"] = np.asarray(
            [self._n[k] for k in sorted(self._n)], np.int64)
        flat["n.keys"] = np.asarray(sorted(self._n))
        np.savez_compressed(path, **flat)

    @classmethod
    def load_state(cls, path: str) -> "OnlineGraph":
        from .factors import FactorGraph
        from .variables import VariableArena

        z = np.load(path, allow_pickle=False)
        tables = {}
        for name in _TABLES:
            tb_cls = type(getattr(
                __import__("graph_slam_tpu.graph.factors",
                           fromlist=["empty_graph"]).empty_graph(), name))
            fields = tb_cls._fields
            tables[name] = tb_cls(*[jnp.asarray(z[f"g.{name}.{f}"])
                                    for f in fields])
        graph = FactorGraph(**tables)
        values = VariableArena(*[jnp.asarray(z[f"v.{f}"])
                                 for f in VariableArena._fields])
        og = cls(graph, values)
        for k, n in zip(z["n.keys"], z["n.slots"]):
            og._n[str(k)] = int(n)
        return og

    # -- growth -----------------------------------------------------------
    def grow(self, pose_cap=None, vel_cap=None, bias_cap=None,
             plane_var_cap=None, point_cap=None, factor_caps=None):
        """Re-home the arenas at larger capacities (bucket-crossing growth).

        Fresh empty arenas are built at the new capacities (so padded rows
        keep their benign defaults — identity rotations, unit sqrt-info)
        and the live prefix is copied in. This is the only operation that
        changes shapes, i.e. the only recompile point while a trajectory
        grows — the online analog of the builder's capacity buckets.
        """
        from .factors import empty_graph
        from .variables import empty_arena, layout_of

        lay = layout_of(self.values)
        dtype = self.values.pose_t.dtype
        new_vals = empty_arena(
            pose_cap=pose_cap or lay.pose_cap,
            vel_cap=vel_cap or lay.vel_cap,
            bias_cap=bias_cap or lay.bias_cap,
            plane_cap=plane_var_cap or lay.plane_cap,
            point_cap=point_cap or lay.point_cap,
            dtype=dtype)

        def copy_into(new, old):
            if new.ndim == 0:
                return old
            n = min(new.shape[0], old.shape[0])
            return new.at[:n].set(old[:n])

        self.values = jax.tree.map(copy_into, new_vals, self.values)

        fc = dict(factor_caps or {})
        caps = {name: max(
            fc.get(name, 0),
            jax.tree.leaves(getattr(self.graph, name))[0].shape[0])
            for name in _TABLES}
        new_graph = empty_graph(
            prior_pose_cap=caps["prior_pose"], between_cap=caps["between"],
            prior_vel_cap=caps["prior_vel"], prior_bias_cap=caps["prior_bias"],
            plane_cap=caps["plane"], imu_cap=caps["imu"],
            projection_cap=caps["projection"],
            prior_point_cap=caps["prior_point"], dtype=dtype)
        self.graph = jax.tree.map(copy_into, new_graph, self.graph)


@functools.partial(jax.jit, static_argnames=("caps",))
def window_graph(graph: FactorGraph, starts, caps) -> FactorGraph:
    """Suffix-window view of a factor graph with static shapes.

    Factors are appended in time order, so the factors touching the most
    recent poses are a *suffix* of each table. ``starts`` is an (8,) int32
    array of per-table slice starts (``_TABLES`` order), ``caps`` a static
    tuple of window capacities. Each table is ``dynamic_slice``d to its
    window capacity — a traced start never changes the compiled shape, so
    the windowed optimizer compiles exactly once per configuration.
    """
    out = {}
    for k, name in enumerate(_TABLES):
        tb = getattr(graph, name)
        cap = jax.tree.leaves(tb)[0].shape[0]
        size = min(caps[k], cap)
        s = jnp.clip(starts[k], 0, cap - size)
        out[name] = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, s, size, 0), tb)
    return FactorGraph(**out)


@jax.jit
def _free_mask(values: VariableArena, free_from):
    """Tangent-dim update mask: variable index >= free_from[kind] is free.

    ``free_from`` is an (5,) int32 array (pose, vel, bias, plane, point);
    frozen variables act as constants in the windowed GN (fixed-lag
    boundary — no marginalization, matching the reference's bounded
    lookback semantics rather than a full Bayes-tree smoother).
    """
    lay = layout_of(values)

    def block(cap, lo, width):
        return jnp.repeat(jnp.arange(cap) >= lo, width)

    return jnp.concatenate([
        block(lay.pose_cap, free_from[0], 6),
        block(lay.vel_cap, free_from[1], 3),
        block(lay.bias_cap, free_from[2], 6),
        block(lay.plane_cap, free_from[3], 3),
        block(lay.point_cap, free_from[4], 3),
    ])


@functools.partial(jax.jit, static_argnames=("wcaps", "iterations"))
def windowed_gn(win: FactorGraph, values: VariableArena, free_from,
                wcaps, damping, iterations: int = 1):
    """Compact fixed-lag GN: solve only the free window's tangent dims.

    The masked full-arena formulation (``gn_optimize(update_mask=...)``)
    freezes old variables correctly but still assembles and factorizes a
    system of the *arena's* dimension — O(capacity^3) per update with the
    dense solver, the opposite of bounded cost. Here the whitened Jacobian
    rows are scattered through a column remap into a compact stacked
    matrix of width ``Dw = 15*W + 3*plane_cap + 3*point_cap`` (static) and
    the damped least squares is QR-solved in SQUARE-ROOT form: absolute
    tangent columns inside the window map to compact columns,
    frozen/out-of-window columns map to one trash column that is sliced
    off before the solve — dropping a column is exactly "treat that
    variable as a constant".
    Per-update cost therefore depends only on the window and landmark
    capacities, flat for arbitrarily long trajectories (the 27k-frame-class
    runs, gtsam_imuVN100_go.launch:13).

    ``wcaps = (Wp, Wv, Wb)`` static pose/vel/bias window capacities;
    ``free_from`` the (5,) first-free variable index per kind (planes and
    points are always fully free — landmark arenas are small and capped).
    """
    lay = layout_of(values)
    dtype = values.pose_t.dtype
    Wp = min(wcaps[0], lay.pose_cap)
    Wv = min(wcaps[1], lay.vel_cap)
    Wb = min(wcaps[2], lay.bias_cap)
    Dw = 6 * Wp + 3 * Wv + 6 * Wb + 3 * lay.plane_cap + 3 * lay.point_cap
    trash = Dw

    def kind_cmap(cap, width, lo, Wk, base):
        idx = jnp.arange(cap)
        rel = idx - lo
        ok = (rel >= 0) & (rel < Wk)
        start = base + rel * width
        cols = jnp.where(ok[:, None],
                         start[:, None] + jnp.arange(width)[None, :], trash)
        return cols.reshape(-1)

    cmap = jnp.concatenate([
        kind_cmap(lay.pose_cap, 6, free_from[0], Wp, 0),
        kind_cmap(lay.vel_cap, 3, free_from[1], Wv, 6 * Wp),
        kind_cmap(lay.bias_cap, 6, free_from[2], Wb, 6 * Wp + 3 * Wv),
        kind_cmap(lay.plane_cap, 3, 0, lay.plane_cap,
                  6 * Wp + 3 * Wv + 6 * Wb),
        kind_cmap(lay.point_cap, 3, 0, lay.point_cap,
                  6 * Wp + 3 * Wv + 6 * Wb + 3 * lay.plane_cap),
    ])

    def body(vals, _):
        # compact used mask (live variables only; re-derived per step so
        # value counts are read from the current arena)
        uw = jnp.zeros(Dw + 1, dtype).at[cmap].max(used_slot_mask(vals))
        uw = uw[:Dw]
        blocks = linearize_blocks(win, vals)
        # SQUARE-ROOT solve: stack the whitened Jacobian rows and QR-solve
        # the damped least squares directly. Forming J^T J squares the
        # condition number — whitened IMU blocks push it past 1e9, where
        # the f32 Cholesky produces NaN pivots (observed on both CPU and
        # TPU backends); cond(J) ~ sqrt of that is comfortably inside f32.
        A_blocks, b_blocks = [], []
        for r, J, cols in blocks:
            F, e, td = J.shape
            c = cmap[cols]                               # (F, td)

            def place(Jf, cf):
                return jnp.zeros((e, Dw + 1), dtype).at[:, cf].add(Jf)

            A_blocks.append(jax.vmap(place)(J, c).reshape(F * e, Dw + 1))
            b_blocks.append(r.reshape(F * e))
        # damping + unused-dim anchoring as extra rows:
        # (J^T J + diag(lam + (1 - uw))) delta = -J^T r
        lam = jnp.asarray(damping, dtype)
        diag_w = jnp.sqrt(lam + (1.0 - uw))
        A = jnp.concatenate(
            [jnp.concatenate(A_blocks, axis=0)[:, :Dw] * uw[None, :],
             jnp.diag(diag_w)], axis=0)
        b = jnp.concatenate(b_blocks + [jnp.zeros(Dw, dtype)])
        Q, R = jnp.linalg.qr(A, mode="reduced")
        delta_w = jax.scipy.linalg.solve_triangular(
            R, -(Q.T @ b), lower=False)
        delta = jnp.concatenate([delta_w,
                                 jnp.zeros(1, dtype)])[cmap]
        return retract_all(vals, delta), None

    values, _ = jax.lax.scan(body, values, None, length=iterations)
    return values, total_error(win, values)


class IncrementalOptimizer:
    """ISAM2-equivalent incremental estimation.

    Every ``update()`` runs ``iters_per_update`` damped GN steps warm-started
    from the previous estimate (the analog of relinearize-threshold-0.1 /
    skip-1 ISAM2 updates, gtsam_graph.cpp:93-99); a full LM solve can be
    requested at any time (the reference's periodic batch optimize).

    Two modes:
    - ``window=None`` (full): relinearize the whole (masked) arena each
      update. Shapes are static, so per-update cost is O(capacity) —
      constant over the run, matching ISAM2's estimate quality exactly.
    - ``window=W`` (fixed-lag): optimize only the last ``W``
      poses/vels/biases over the suffix window of each factor table
      (``window_graph``), older variables frozen as constants, solved as a
      compact dense system of the *window's* dimension (``windowed_gn``;
      the ``solver``/``pcg_iters`` options apply to the full mode only).
      Per-update cost is O(window), independent of both trajectory length
      *and* arena capacity — the bounded-cost mode for 27k-frame-class
      runs (gtsam_imuVN100_go.launch:13).
    """

    def __init__(self, iters_per_update: int = 1, damping: float = 1e-6,
                 solver: str = "dense", pcg_iters: int = 100,
                 window: Optional[int] = None,
                 window_factor_caps: Optional[dict] = None):
        if window is not None and window <= 0:
            raise ValueError("window must be positive or None")
        self.iters = iters_per_update
        self.damping = damping
        self.solver = solver
        self.pcg_iters = pcg_iters
        self.window = window
        self._wcaps = window_factor_caps

    def _window_caps(self, og: OnlineGraph):
        """Static per-table window sizes (defaults scale with the window)."""
        W = self.window
        d = {
            "prior_pose": og.graph.prior_pose.idx.shape[0],
            "between": 8 * W,
            "prior_vel": og.graph.prior_vel.idx.shape[0],
            "prior_bias": og.graph.prior_bias.idx.shape[0],
            "plane": 4 * W,
            "imu": W,
            "projection": 16 * W,
            "prior_point": og.graph.prior_point.idx.shape[0],
        }
        if self._wcaps:
            d.update(self._wcaps)
        return tuple(d[name] for name in _TABLES)

    def update(self, og: OnlineGraph):
        if self.window is None:
            res = gn_optimize(og.graph, og.values, iterations=self.iters,
                              solver=self.solver, damping=self.damping,
                              pcg_iters=self.pcg_iters)
            og.values = res.values
            return res

        caps = self._window_caps(og)
        counts = [og._n[k] if k in og._n else 0 for k in _TABLES]
        starts = jnp.asarray(
            [max(0, c - min(s, jax.tree.leaves(getattr(og.graph, n))[0]
                            .shape[0]))
             for c, s, n in zip(counts, caps, _TABLES)], jnp.int32)
        win = window_graph(og.graph, starts, caps)
        free_from = jnp.asarray(
            [max(0, og.num_poses - self.window),
             max(0, og.num_vels - self.window),
             max(0, og.num_biases - self.window), 0, 0], jnp.int32)
        vals, err = windowed_gn(
            win, og.values, free_from,
            wcaps=(self.window, self.window, self.window),
            damping=self.damping, iterations=self.iters)
        og.values = vals
        return LMResult(vals, err, jnp.asarray(self.iters, jnp.int32),
                        jnp.asarray(self.damping, vals.pose_t.dtype),
                        jnp.ones((), bool))

    def full_batch(self, og: OnlineGraph, params: LMParams = LMParams()):
        res = lm_optimize(og.graph, og.values, params)
        og.values = res.values
        return res
