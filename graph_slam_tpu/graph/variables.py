"""Variable arena: struct-of-arrays Values with static padded shapes.

Replaces GTSAM's ``Values`` key->object map (used throughout
``/root/reference/gtsam/gtsam_graph.cpp``) with one dense array per variable
kind plus counts. The global tangent vector is laid out by *capacity* (static
shape), so a growing graph re-uses the same compiled optimizer as long as it
fits the padded arena:

    [ poses (6 each) | vels (3) | biases (6) | planes (3) | points (3) ]

Symbol-scheme correspondence (reference ``gtsam_graph.cpp:50-54``):
X(i) -> pose slot i, V(i) -> vel slot i, B(i) -> bias slot i,
L(j) -> plane slot j, Q(k) -> point slot k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import se3
from ..planes import oriented_plane

__all__ = ["VariableArena", "TangentLayout", "layout_of", "retract_all",
           "empty_arena"]


class VariableArena(NamedTuple):
    pose_R: jnp.ndarray  # (Px, 3, 3)
    pose_t: jnp.ndarray  # (Px, 3)
    vel: jnp.ndarray     # (Pv, 3)
    bias: jnp.ndarray    # (Pb, 6) — (acc, gyro), GTSAM imuBias order
    plane: jnp.ndarray   # (Pl, 4) — (n, d), unit normal
    point: jnp.ndarray   # (Pq, 3)
    num_poses: jnp.ndarray   # scalar int32 — live counts (<= capacity)
    num_vels: jnp.ndarray
    num_biases: jnp.ndarray
    num_planes: jnp.ndarray
    num_points: jnp.ndarray

    @property
    def poses(self) -> se3.Pose:
        return se3.Pose(self.pose_R, self.pose_t)


class TangentLayout(NamedTuple):
    """Static global-tangent layout computed from arena capacities."""

    pose_cap: int
    vel_cap: int
    bias_cap: int
    plane_cap: int
    point_cap: int

    @property
    def pose_off(self) -> int:
        return 0

    @property
    def vel_off(self) -> int:
        return 6 * self.pose_cap

    @property
    def bias_off(self) -> int:
        return self.vel_off + 3 * self.vel_cap

    @property
    def plane_off(self) -> int:
        return self.bias_off + 6 * self.bias_cap

    @property
    def point_off(self) -> int:
        return self.plane_off + 3 * self.plane_cap

    @property
    def dim(self) -> int:
        return self.point_off + 3 * self.point_cap

    def pose_cols(self, idx):
        """(F,) pose indices -> (F, 6) global tangent columns."""
        return self.pose_off + 6 * idx[..., None] + jnp.arange(6)

    def vel_cols(self, idx):
        return self.vel_off + 3 * idx[..., None] + jnp.arange(3)

    def bias_cols(self, idx):
        return self.bias_off + 6 * idx[..., None] + jnp.arange(6)

    def plane_cols(self, idx):
        return self.plane_off + 3 * idx[..., None] + jnp.arange(3)

    def point_cols(self, idx):
        return self.point_off + 3 * idx[..., None] + jnp.arange(3)


def layout_of(values: VariableArena) -> TangentLayout:
    """Layout from array shapes — static under jit."""
    return TangentLayout(
        pose_cap=values.pose_R.shape[0],
        vel_cap=values.vel.shape[0],
        bias_cap=values.bias.shape[0],
        plane_cap=values.plane.shape[0],
        point_cap=values.point.shape[0],
    )


def used_slot_mask(values: VariableArena):
    """(dim,) 1.0 where the tangent slot belongs to a live variable."""
    lay = layout_of(values)

    def block(cap, n, width):
        live = jnp.arange(cap) < n
        return jnp.repeat(live, width)

    return jnp.concatenate(
        [
            block(lay.pose_cap, values.num_poses, 6),
            block(lay.vel_cap, values.num_vels, 3),
            block(lay.bias_cap, values.num_biases, 6),
            block(lay.plane_cap, values.num_planes, 3),
            block(lay.point_cap, values.num_points, 3),
        ]
    ).astype(values.pose_t.dtype)


def retract_all(values: VariableArena, delta) -> VariableArena:
    """Apply a global tangent step: the GTSAM ``Values::retract`` analog.

    Poses via SE(3) expmap retraction, planes via the sphere chart, the rest
    additive. Padded slots receive zero delta by construction (their columns
    never appear in any factor), so they pass through unchanged — except
    poses, where expmap(0) exactly preserves R, t.
    """
    lay = layout_of(values)
    d = delta
    dp = d[lay.pose_off : lay.pose_off + 6 * lay.pose_cap].reshape(lay.pose_cap, 6)
    dv = d[lay.vel_off : lay.vel_off + 3 * lay.vel_cap].reshape(lay.vel_cap, 3)
    db = d[lay.bias_off : lay.bias_off + 6 * lay.bias_cap].reshape(lay.bias_cap, 6)
    dl = d[lay.plane_off : lay.plane_off + 3 * lay.plane_cap].reshape(lay.plane_cap, 3)
    dq = d[lay.point_off : lay.point_off + 3 * lay.point_cap].reshape(lay.point_cap, 3)

    new_pose = se3.retract(se3.Pose(values.pose_R, values.pose_t), dp)
    new_plane = oriented_plane.retract(values.plane, dl)
    return values._replace(
        pose_R=new_pose.R,
        pose_t=new_pose.t,
        vel=values.vel + dv,
        bias=values.bias + db,
        plane=new_plane,
        point=values.point + dq,
    )


def empty_arena(
    pose_cap: int,
    vel_cap: int = 0,
    bias_cap: int = 0,
    plane_cap: int = 0,
    point_cap: int = 0,
    dtype=jnp.float64,
) -> VariableArena:
    eye = jnp.tile(jnp.eye(3, dtype=dtype), (pose_cap, 1, 1))
    plane0 = jnp.zeros((plane_cap, 4), dtype=dtype)
    if plane_cap:
        plane0 = plane0.at[:, 2].set(1.0)  # valid unit normal placeholder

    # every field gets its OWN buffer: the online engine donates the whole
    # arena to its jitted row writers, and XLA rejects executions where two
    # donated arguments alias one buffer
    def zero():
        return jnp.zeros((), jnp.int32)

    return VariableArena(
        pose_R=eye,
        pose_t=jnp.zeros((pose_cap, 3), dtype=dtype),
        vel=jnp.zeros((vel_cap, 3), dtype=dtype),
        bias=jnp.zeros((bias_cap, 6), dtype=dtype),
        plane=plane0,
        point=jnp.zeros((point_cap, 3), dtype=dtype),
        num_poses=zero(),
        num_vels=zero(),
        num_biases=zero(),
        num_planes=zero(),
        num_points=zero(),
    )
