"""Offline SE(3) pose-graph SLAM from a VRO log — ``test_gt_graph`` twin.

Reference pipeline (``/root/reference/gtsam/test_gt_graph.cpp:38-130`` online,
replayed offline via ``readVRORecord``/``addNodeOffline``/``addEdgeOffline``,
``gtsam_graph.cpp:1505-1668``):

1. first node -> near-exact pose prior (sigma 1e-7, gtsam_graph.cpp:339-341);
2. every odometry record creates the next node; the VO transform is taken
   from camera to IMU frame by conjugation with ``T_u2c`` and its information
   by the adjoint (gtsam_graph.cpp:640, 675-676); initial estimate composes
   from the predecessor (``:655-668``);
3. a *failed* record (info sentinel 10000, which doubles as the fake-odometry
   identity-edge information ``fakeOdoNode`` uses, ``:697-722``) becomes an
   identity edge in pure-VO mode;
4. records whose both endpoints already exist are loop closures;
5. Levenberg-Marquardt batch optimization; trajectory + PLY output in the
   world frame ``T_w2o``.

Seq-id -> dense-graph-id mapping reproduces ``correctMatchingID``
(gtsam_graph.cpp:1626-1649).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import SlamParams
from ..core import se3, so3
from ..graph import (GraphBuilder, LMParams, chordal_initialize, gn_optimize,
                     gnc_optimize, lm_optimize, lm_optimize_g2o, pcm_mask,
                     total_error)
from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog

__all__ = ["PoseGraphResult", "build_pose_graph", "run_pose_graph",
           "build_graph_from_g2o", "run_g2o_file", "trajectory_arrays"]


@dataclasses.dataclass
class PoseGraphResult:
    values: object            # VariableArena after optimization
    graph: object             # FactorGraph
    error0: float
    error: float
    seq_ids: np.ndarray       # (N,) sequence id per graph id
    iterations: int


def _conjugate_edge(xi, info, u2c: Optional[se3.Pose]):
    """Camera-frame edge -> body frame: T' = U T U^-1, info' = Ad_U info Ad_U^T."""
    T = se3.expmap(jnp.asarray(xi))
    if u2c is None:
        return T, np.asarray(info)
    Tb = se3.compose(se3.compose(u2c, T), se3.inverse(u2c))
    Ad = np.asarray(se3.adjoint(u2c))
    return Tb, Ad @ np.asarray(info) @ Ad.T


def build_pose_graph(log: VROLog, params: SlamParams = SlamParams(),
                     u2c: Optional[se3.Pose] = None, only_vo: bool = True,
                     bucket: int = 256, backend: str = "gtsam"):
    """VRO log -> (FactorGraph, VariableArena, seq_ids).

    Nodes are created in file order (the replay order of the reference
    mains); edges between existing nodes are loop closures.

    ``backend`` selects the fake-odometry identity-edge weighting: the
    gtsam driver uses info ``I*1e4`` (fakeOdoNode, gtsam_graph.cpp:697-722),
    the g2o driver ``I*1e-3`` (g2o_graph.cpp:151).
    """
    b = GraphBuilder()
    seq2graph: dict[int, int] = {}
    seq_ids: list[int] = []
    robust_k = params.robust_k if params.robust == "huber" else None
    if backend not in ("gtsam", "g2o"):
        raise ValueError(f"unknown backend {backend!r}")
    fake_odo_w = FAILED_INFO_SENTINEL if backend == "gtsam" else 1e-3

    def ensure_first(seq):
        if not seq2graph:
            gid = b.add_pose((np.eye(3), np.zeros(3)))
            seq2graph[seq] = gid
            seq_ids.append(seq)
            b.add_prior_pose(gid, (np.eye(3), np.zeros(3)),
                             sigmas=np.full(6, 1e-7))

    for k in range(len(log)):
        id_to = int(log.id_to[k])
        id_from = int(log.id_from[k])
        info = log.info[k]
        failed = info[0, 0] == FAILED_INFO_SENTINEL
        ensure_first(id_from)
        if id_from not in seq2graph:
            # reference replay assumes ordered logs; skip dangling edges
            continue
        gi = seq2graph[id_from]
        if failed:
            # fakeOdoNode semantics (gtsam_graph.cpp:697-722): identity
            # transform, information I*1e4 (gtsam) / I*1e-3 (g2o,
            # g2o_graph.cpp:151) — regardless of what the failed record row
            # carries beyond the info(0,0) sentinel. fakeOdoNode routes
            # through addToGTSAM, which conjugates the information by the
            # adjoint UNCONDITIONALLY (gtsam_graph.cpp:672-692), so the
            # u2c-frame weighting applies to fake edges too.
            T = se3.Pose(jnp.eye(3), jnp.zeros(3))
            info_b = np.eye(6) * fake_odo_w
            if u2c is not None:
                Ad = np.asarray(se3.adjoint(u2c))
                info_b = Ad @ info_b @ Ad.T
        else:
            T, info_b = _conjugate_edge(log.xi[k], info, u2c)

        if id_to not in seq2graph:
            # odometry edge creating a new node
            Ri, ti = b.pose(gi)
            prev = se3.Pose(jnp.asarray(Ri), jnp.asarray(ti))
            est = se3.compose(prev, T)
            gj = b.add_pose((np.asarray(est.R), np.asarray(est.t)))
            seq2graph[id_to] = gj
            seq_ids.append(id_to)
            if failed and not only_vo:
                continue  # pose comes from IMU in the VIO pipeline
            b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                          information=info_b, robust=robust_k)
        else:
            if failed:
                continue
            gj = seq2graph[id_to]
            b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                          information=info_b, robust=robust_k)

    graph, values = b.build(bucket=bucket)
    return graph, values, np.asarray(seq_ids)


def run_pose_graph(log: VROLog, params: SlamParams = SlamParams(),
                   u2c: Optional[se3.Pose] = None,
                   lm_params: LMParams = LMParams(),
                   bucket: int = 256,
                   backend: str = "gtsam",
                   init: str = "odometry",
                   loop_gate: str = "none") -> PoseGraphResult:
    graph, values, seq_ids = build_pose_graph(log, params, u2c, bucket=bucket,
                                              backend=backend)
    if loop_gate == "pcm":
        # pairwise-consistency gate BEFORE any initialization/optimization:
        # both chordal init and the convex GNC stage are corruptible by a
        # gross outlier that PCM removes outright (graph/pcm.py)
        bt = graph.between
        pres = pcm_mask(graph, values)
        graph = graph._replace(between=bt._replace(
            active=bt.active & jnp.asarray(pres.accepted)))
    elif loop_gate != "none":
        raise ValueError(f"unknown loop_gate {loop_gate!r} (none|pcm)")
    e0 = float(total_error(graph, values))
    if init == "chordal":
        values = chordal_initialize(graph, values)
    elif init != "odometry":
        raise ValueError(f"unknown init {init!r} (odometry|chordal)")
    if params.robust in ("gnc-tls", "gnc-gm"):
        # graduated non-convexity over the loop-closure edges; the
        # odometry chain (consecutive graph ids) stays trusted. Dense
        # solves are right up to a few thousand tangent dims; beyond
        # that the anneal runs on matrix-free PCG.
        bt = graph.between
        cand = (bt.j - bt.i) != 1
        big = values.pose_R.shape[0] * 6 > 4096
        gres = gnc_optimize(graph, values, candidates=cand,
                            kind=params.robust[4:],
                            solver="pcg" if big else "dense",
                            damping=1e-3 if big else 1e-6)
        return PoseGraphResult(
            values=gres.values, graph=graph, error0=e0,
            error=float(gres.error), seq_ids=seq_ids, iterations=20,
        )
    if params.optimizer == "gn":
        res = gn_optimize(graph, values, iterations=params.optimize_step)
    elif backend == "g2o":
        # the g2o driver's schedule: LM iterations in chunks of 2 with
        # per-chunk lambda re-init (g2o_graph.cpp:241-252). The caller's
        # iteration budget is honored (the reference's 20 is the LMParams
        # default here only when the caller left max_iterations untouched);
        # the remaining LMParams fields have no g2o counterpart.
        total = (20 if lm_params.max_iterations
                 == LMParams.max_iterations else lm_params.max_iterations)
        res = lm_optimize_g2o(graph, values, total_iters=total,
                              chunks=max(1, -(-total // 2)))
    else:
        res = lm_optimize(graph, values, lm_params)
    return PoseGraphResult(
        values=res.values, graph=graph, error0=e0, error=float(res.error),
        seq_ids=seq_ids, iterations=int(res.iterations),
    )


def build_graph_from_g2o(vertices: dict, edges: list, bucket: int = 256):
    """(vertices, edges) from ``io.read_g2o`` -> (graph, values, ids).

    Lets the framework ingest standard g2o pose graphs (sphere2500 et al.)
    and optimize them with the same LM as the VRO path — the known-optimum
    parity harness entry point (gtsam's writeG2o round trip,
    gtsam_graph.cpp:1941-1945).
    """
    b = GraphBuilder()
    ids = sorted(vertices.keys())
    id2slot = {vid: k for k, vid in enumerate(ids)}
    for vid in ids:
        t, q = vertices[vid]
        b.add_pose((np.asarray(so3.quat_to_matrix(jnp.asarray(q))), t))
    # gauge fixing: prior on the first vertex (g2o solvers fix vertex 0,
    # g2o_graph.cpp:80-94)
    t0, q0 = vertices[ids[0]]
    b.add_prior_pose(0, (np.asarray(so3.quat_to_matrix(jnp.asarray(q0))),
                         t0), sigmas=np.full(6, 1e-6))
    for (i, j, tij, qij, info) in edges:
        b.add_between(id2slot[i], id2slot[j],
                      (np.asarray(so3.quat_to_matrix(jnp.asarray(qij))), tij),
                      information=info)
    graph, values = b.build(bucket=bucket)
    return graph, values, np.asarray(ids)


def run_g2o_file(path: str, lm_params: LMParams = LMParams(),
                 bucket: int = 256, init: str = "odometry",
                 loop_gate: str = "none") -> PoseGraphResult:
    """Read a .g2o pose graph, optimize, return the result.

    ``loop_gate="pcm"`` gates non-consecutive edges by pairwise
    consistency against the file's initial estimate before optimizing.
    """
    from ..io import read_g2o

    vertices, edges = read_g2o(path)
    graph, values, ids = build_graph_from_g2o(vertices, edges, bucket=bucket)
    if loop_gate == "pcm":
        bt = graph.between
        pres = pcm_mask(graph, values)
        graph = graph._replace(between=bt._replace(
            active=bt.active & jnp.asarray(pres.accepted)))
    elif loop_gate != "none":
        raise ValueError(f"unknown loop_gate {loop_gate!r} (none|pcm)")
    e0 = float(total_error(graph, values))
    if init == "chordal":
        values = chordal_initialize(graph, values)
    res = lm_optimize(graph, values, lm_params)
    return PoseGraphResult(values=res.values, graph=graph, error0=e0,
                           error=float(res.error), seq_ids=ids,
                           iterations=int(res.iterations))


def trajectory_arrays(values, seq_ids, w2o: Optional[se3.Pose] = None):
    """(ids, t, quat_wxyz, seq) in the world frame, writeTrajectory contract."""
    n = len(seq_ids)
    R = values.pose_R[:n]
    t = values.pose_t[:n]
    if w2o is not None:
        P = se3.compose(se3.Pose(jnp.broadcast_to(w2o.R, R.shape),
                                 jnp.broadcast_to(w2o.t, t.shape)),
                        se3.Pose(R, t))
        R, t = P.R, P.t
    q = so3.matrix_to_quat(R)
    return np.arange(n), np.asarray(t), np.asarray(q), np.asarray(seq_ids)
