"""Offline plane-aided visual-inertial odometry — the flagship pipeline.

Twin of ``test_vro_imu_graph`` (``/root/reference/gtsam/test_vro_imu_graph.cpp:78-382``,
call stack SURVEY.md §3.2):

  per VRO record, in file order:
    - new frame  -> IMU window preintegration (one lax.scan) + NavState
      prediction; VO BetweenFactor when the edge is valid (camera->IMU
      conjugation); CombinedImuFactor(X,V,B: i-1 -> i); pose estimate from
      VO composition when valid, else from the IMU prediction
      (addNodeOffline + addToGTSAM(NavState), gtsam_graph.cpp:613-695);
    - plane rescue when VO failed (``:205``): propagate the previous plane
      set through the predicted pose, associate against the landmark window,
      add OrientedPlane3 factors (plane_mode="rescue"); "always" adds plane
      factors on every frame (the ba_imu variant), "off" disables planes;
    - loop-closure edges replayed when both endpoints exist;
    - incremental optimization every frame (ISAM2-equivalent warm-started
      GN) or periodic batch LM;
    - estimator feedback: optimized bias/state re-seed the next
      preintegration window (``test_vro_imu_graph.cpp:344-350``).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

import functools

import jax

from ..config import CameraIntrinsics, SlamParams
from ..core import se3
from ..graph import GraphBuilder, LMParams, lm_optimize, total_error
from ..graph.builder import _sqrt_info, round_up
from ..graph.factors import empty_graph
from ..graph.lm import gn_optimize
from ..graph import online as online_mod
from ..graph.online import IncrementalOptimizer, OnlineGraph
from ..graph.variables import empty_arena
from ..imu import (
    ImuParams,
    ImuStream,
    find_index_at,
    init_preint,
    integrate_segment,
    predict_navstate,
)
from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog
from ..planes import (
    PlaneLandmarkBook,
    extract_plane_node,
    extract_plane_nodes_batch,
    inflate_if_uncertain,
    predict_plane_node_finish,
    predict_plane_node_start,
    repair_plane_cov,
    transform_plane_cov,
)
from .posegraph import _conjugate_edge

__all__ = ["VioConfig", "VioResult", "run_vio"]


@dataclasses.dataclass
class VioConfig:
    plane_mode: str = "rescue"        # "rescue" | "always" | "off"
    optimize_step: int = 10            # incremental optimize cadence (frames)
    incremental_iters: int = 2         # GN iters per incremental update
    max_imu_window: int = 512          # padded preintegration window
    final_batch: bool = True           # LM at the end (reference outputs)
    feedback: bool = True              # bias/state re-seeding
    bucket: int = 256
    # scan-engine chunking: records per compiled scan dispatch (one
    # compilation shared by all chunks; bounds device program run length)
    scan_chunk: int = 4096
    # incremental execution engine:
    # "online"  — preallocated OnlineGraph arenas + jitted row appenders; no
    #             host rebuilds, the optimizer never recompiles mid-run (the
    #             ISAM2-role execution model, gtsam_graph.cpp:1768-1776)
    # "scan"    — the replay as chunked compiled lax.scan programs:
    #             compact fixed-lag optimization + feedback on schedule;
    #             plane_mode="rescue" splits segments at host-known
    #             failures with one host step (fused kernel + batched
    #             plane stack) per rescue
    # "rebuild" — host-side GraphBuilder rebuild per optimize step (the
    #             round-1 behavior, kept for cross-checking)
    engine: str = "online"
    incremental_solver: str = "dense"  # "dense" | "pcg" (use pcg for >100 kf)
    incremental_pcg_iters: int = 100
    window: Optional[int] = None       # fixed-lag window (None = full arena)
    plane_var_cap: int = 32            # online-engine plane landmark capacity
    # chi2 IMU-vs-VRO rotation consistency gate: implemented but default-off,
    # matching the reference (retained disabled, test_vro_imu_graph.cpp:677-782,
    # threshold 40000 at :753, flag chi2_for_vro default false)
    chi2_vro_gate: bool = False
    chi2_threshold: float = 4e4
    # robust kernel on VO between-factors ("huber" enables gtsam-style
    # Huber(k=1.345) downweighting of corrupted loop closures)
    robust: Optional[str] = None
    robust_k: float = 1.345
    # frames-driven plane extraction (CPlaneNode::extractPlanes params)
    max_planes: int = 4
    min_plane_support: int = 300
    seed: int = 0
    # startup gravity/bias initialization (initFromImu,
    # gtsam_graph.cpp:281-318, called at main_rgbdslam_imu_offline.cpp:137-140
    # + static bias estimation imu_base.cpp:217-249): align the first pose's
    # rotation to the measured gravity direction and seed the bias from the
    # pre-sync static window, instead of identity pose / zero bias
    gravity_init: bool = False
    # static-window length for gravity/bias init; 0 = all pre-sync samples
    # (falling back to the first 200 when the log starts at the sync point)
    static_init_samples: int = 0
    # observability (SURVEY §5): jax.profiler trace dir + chi2-per-update log
    trace_dir: Optional[str] = None


@dataclasses.dataclass
class VioResult:
    values: object
    graph: object
    seq_ids: np.ndarray
    error0: float
    error: float
    n_imu_factors: int
    n_vo_edges: int
    n_plane_factors: int
    plane_book: Optional[PlaneLandmarkBook]
    chi2_log: object = None       # utils.profiling.Chi2Log
    timers: Optional[dict] = None  # PhaseTimer.summary()
    plane_stack: object = None    # _PlaneStack (white-box tests/telemetry)


class _PlaneWriterMixin:
    """The plane-landmark/plane-factor writer surface over a live
    OnlineGraph (``self.og``) with a host-side mirror (``self._planes``).
    ONE copy of the capacity-growth policy, shared by both engines'
    writers — the growth/normalization behavior must never diverge
    between the online and scan rescue paths."""

    def add_plane(self, p) -> int:
        lid = self.og.num_planes
        cap = self.og.values.plane.shape[0]
        if lid >= cap:
            # bucket-crossing growth (the OnlineSlam._ensure_capacity
            # pattern): a long plane-heavy run re-homes the arena instead
            # of dying on the set_plane capacity guard
            self.og.grow(plane_var_cap=max(8, 2 * cap))
        self.og.set_plane(lid, p)
        self._planes.append(np.asarray(p))
        return lid

    def add_planes_batch(self, ps) -> int:
        """Append many landmarks with ONE device write (rescue flush)."""
        return _append_planes_batch(self.og, self._planes, ps)

    def add_plane_factor(self, pose_idx, plane_idx, meas, **noise):
        cap = self.og.graph.plane.pose_idx.shape[0]
        if self.og._n["plane"] >= cap:
            self.og.grow(factor_caps={"plane": max(64, 2 * cap)})
        self.og.add_plane_factor(pose_idx, plane_idx, meas,
                                 _sqrt_info(3, **noise))

    def add_plane_factors_batch(self, pose_idx, plane_idx, meas,
                                sqrt_info):
        cap = self.og.graph.plane.pose_idx.shape[0]
        if self.og._n["plane"] + len(pose_idx) > cap:
            self.og.grow(factor_caps={
                "plane": max(64, 2 * cap, cap + len(pose_idx))})
        self.og.add_plane_factors(pose_idx, plane_idx, meas, sqrt_info)


class _OnlineVioGraph(_PlaneWriterMixin):
    """GraphBuilder-shaped facade over preallocated OnlineGraph arenas.

    Lets ``run_vio`` drive the zero-recompile online engine through the
    same call surface the host-rebuild path uses. Capacities are sized
    from the VRO log upfront (the offline replay knows its frame/edge
    budget, like the reference's readVRORecord-then-replay structure).
    """

    def __init__(self, n_frames: int, n_edges: int, bucket: int,
                 plane_var_cap: int, plane_factor_cap: int):
        P = round_up(n_frames, bucket)
        self.og = OnlineGraph(
            empty_graph(
                prior_pose_cap=4,
                between_cap=round_up(n_edges + 4, bucket),
                prior_vel_cap=4,
                prior_bias_cap=4,
                plane_cap=round_up(plane_factor_cap, bucket),
                imu_cap=P,
            ),
            empty_arena(pose_cap=P, vel_cap=P, bias_cap=P,
                        plane_cap=plane_var_cap),
        )
        self._planes: list = []   # mirrors GraphBuilder's landmark list

    # -- variables (append order mirrors GraphBuilder) -------------------
    def add_pose(self, Rt) -> int:
        gid = self.og.num_poses
        self.og.set_pose(gid, se3.Pose(jnp.asarray(Rt[0]),
                                       jnp.asarray(Rt[1])))
        return gid

    def add_vel(self, v) -> int:
        vid = self.og.num_vels
        self.og.set_vel(vid, v)
        return vid

    def add_bias(self, b) -> int:
        bid = self.og.num_biases
        self.og.set_bias(bid, b)
        return bid

    def set_pose(self, idx, Rt):
        self.og.set_pose(idx, se3.Pose(jnp.asarray(Rt[0]),
                                       jnp.asarray(Rt[1])), new=False)

    def pose(self, idx):
        p = self.og.pose(idx)
        return np.asarray(p.R), np.asarray(p.t)

    # -- factors ----------------------------------------------------------
    def add_prior_pose(self, idx, Rt, **noise):
        self.og.add_prior_pose(idx, se3.Pose(jnp.asarray(Rt[0]),
                                             jnp.asarray(Rt[1])),
                               _sqrt_info(6, **noise))

    def add_prior_vel(self, idx, mean, **noise):
        self.og.add_prior_vel(idx, mean, _sqrt_info(3, **noise))

    def add_prior_bias(self, idx, mean, **noise):
        self.og.add_prior_bias(idx, mean, _sqrt_info(6, **noise))

    def add_between(self, i, j, Rt, robust=None, **noise):
        self.og.add_between(i, j, se3.Pose(jnp.asarray(Rt[0]),
                                           jnp.asarray(Rt[1])),
                            _sqrt_info(6, **noise), robust=robust)

    def add_imu_factor(self, i, j, preint, gravity):
        self.og.add_imu_factor(i, j, preint, gravity)


def _NULL_TIMER(_phase):
    return contextlib.nullcontext()


def _append_planes_batch(og, planes_list, ps) -> int:
    """Append many plane landmarks to an OnlineGraph arena with ONE
    device write (the rescue flush), growing past capacity and mirroring
    the host-side list. Shared by both engines' plane writers."""
    ps = [np.asarray(p) for p in ps]
    if not ps:
        return og.num_planes
    lid0 = og.num_planes
    cap = og.values.plane.shape[0]
    if lid0 + len(ps) > cap:
        og.grow(plane_var_cap=max(8, 2 * cap, lid0 + len(ps)))
    og.set_planes(np.arange(lid0, lid0 + len(ps)), np.stack(ps))
    planes_list.extend(ps)
    return lid0


def _start_host_copies(*objs) -> None:
    """Kick off device->host transfers for every jax array reachable from
    ``objs`` WITHOUT blocking. On remote-attached backends each blocking
    ``np.asarray`` read is a separate tunnel round trip; starting all the
    copies up front lets them overlap so the read phase pays ~one."""
    for o in objs:
        if o is None:
            continue
        if hasattr(o, "copy_to_host_async"):
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        elif dataclasses.is_dataclass(o) and not isinstance(o, type):
            _start_host_copies(*(getattr(o, f.name)
                                 for f in dataclasses.fields(o)))
        elif isinstance(o, (tuple, list)):
            _start_host_copies(*o)


@jax.jit
def _transform_plane_covs_batch(planes, covs, pose):
    """All of a detection's camera->body projections in one dispatch."""
    return jax.vmap(lambda p, c: transform_plane_cov(p, c, pose))(planes,
                                                                  covs)


class _PlaneStack:
    """Host-side plane bookkeeping shared by the online and scan engines.

    Bundles the driver-side plane state machine of test_vro_imu_graph.cpp
    (firstPlaneNode :135-146, the rescue block :205-300, addPlaneFactor /
    planeNodeAssociation split :256-283) over any writer exposing the
    ``add_plane`` / ``add_plane_factor`` / ``_planes`` surface
    (GraphBuilder, _OnlineVioGraph, or the scan engine's arena writer).
    """

    def __init__(self, writer, cfg: VioConfig, params: SlamParams,
                 intrinsics, u2c, frames, provider):
        self.b = writer
        self.cfg = cfg
        self.K = intrinsics
        self.u2c = u2c                     # None = identity (skip conj)
        self.u2c_j = u2c if u2c is not None else se3.identity()
        self._u2c_inv = se3.inverse(self.u2c_j)   # cached, not per-obs
        self.frames = frames
        self.provider = provider
        self.book = PlaneLandmarkBook(lookback=params.lookback_nodes)
        self.plane_nodes: dict[int, object] = {}  # gid -> detection | None
        self.pending: dict[int, object] = {}      # pre-extracted, no factors
        self.pt = None            # optional PhaseTimer (rescue sub-phases)
        self.n_plane = 0
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._base_key = jax.random.PRNGKey(cfg.seed)

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _extract_key(self, seq):
        """Per-frame extraction key derived from the SEQUENCE id (not the
        call order), so batched pre-extraction and the sequential path
        produce identical detections — engine parity depends on it."""
        return jax.random.fold_in(self._base_key, int(seq))

    def insert_plane_obs(self, gid, pose_body: se3.Pose, plane_cam, cov3,
                         lid: int = -1, trace_extra: float = 0.0,
                         pre=None, buffer=None, plane_buffer=None) -> int:
        """Camera-frame plane observation -> landmark id + plane factor.

        ``lid >= 0`` skips geometric association (the id was carried by
        plane propagation); returns the landmark id or -1 when the
        observation is rejected by the trace gate (addPlaneFactor,
        gtsam_graph.cpp:1196-1233). ``pre`` optionally supplies the
        already-transformed (plane_body, cov_body) pair; a ``buffer``
        collects the accepted factor row instead of writing it (the
        batched per-detection flush).
        """
        cov3 = np.asarray(cov3)
        if pre is not None:
            pb, cb = pre
        else:
            # camera -> body frame with tangent-Jacobian cov projection
            pb, cb = transform_plane_cov(jnp.asarray(plane_cam),
                                         jnp.asarray(cov3),
                                         self._u2c_inv)
        # NaN observation guard (the reference drops NaN-information
        # edges, gtsam_graph.cpp:1699,1742): an f32 degenerate refit can
        # produce a non-finite plane/covariance — one poisoned row would
        # NaN the whole graph chi2
        if not (np.isfinite(np.asarray(pb)).all()
                and np.isfinite(np.asarray(cb)).all()):
            return -1
        trace_snv = float(np.trace(cov3[:2, :2])) + trace_extra
        carried = lid >= 0
        if not carried:
            lid, is_new = self.book.associate(gid, np.asarray(pb),
                                              pose_body)
        else:
            is_new = False
        cb, accept = inflate_if_uncertain(np.asarray(cb), trace_snv, is_new)
        if not accept:
            return -1
        if carried:
            # record the re-observation only once the gate accepts it
            self.book.observe(gid, lid)
        S = repair_plane_cov(cb)
        n_staged = len(plane_buffer) if plane_buffer is not None else 0
        if is_new and len(self.b._planes) + n_staged <= lid:
            if plane_buffer is not None:
                # stage the landmark write for the rescue's single
                # batched flush (new lids are allocated monotonically by
                # the book, so staging order == arena append order)
                plane_buffer.append((lid, np.asarray(self.book.world[lid])))
            else:
                self.b.add_plane(self.book.world[lid])
        if buffer is not None:
            buffer.append((gid, lid, np.asarray(pb),
                           _sqrt_info(3, covariance=S)))
        else:
            self.b.add_plane_factor(gid, lid, np.asarray(pb), covariance=S)
        self.n_plane += 1
        return lid

    def provider_obs(self, gid, pose_body: se3.Pose, seq) -> None:
        if self.provider is None:
            return
        for (plane_cam, cov3) in self.provider(seq):
            self.insert_plane_obs(gid, pose_body, plane_cam, cov3)

    def insert_detection(self, gid, pose_body: se3.Pose, det,
                         trace_extra: float = 0.0,
                         buffer=None, plane_buffer=None,
                         transformed=None) -> None:
        """Add factors for a PlaneNodeDetection, associating unassigned
        planes and writing the resolved landmark ids back (the driver's
        addPlaneFactor / planeNodeAssociation split,
        test_vro_imu_graph.cpp:256-283). The camera->body covariance
        projections of the whole detection run as ONE vmapped dispatch.

        ``buffer``/``plane_buffer`` defer the factor/landmark arena
        writes to a caller-owned flush (the rescue host step merges the
        pre-node and current-node writes into one dispatch each);
        ``transformed`` supplies an already-enqueued
        ``_transform_plane_covs_batch`` result."""
        if not len(det):
            return
        if transformed is None:
            transformed = _transform_plane_covs_batch(
                jnp.asarray(det.params), jnp.asarray(det.cov),
                self._u2c_inv)
        pbs, cbs = np.asarray(transformed[0]), np.asarray(transformed[1])
        rows: list = [] if buffer is None else buffer
        for p in range(len(det)):
            lid = int(det.landmark_ids[p])
            got = self.insert_plane_obs(gid, pose_body, det.params[p],
                                        det.cov[p], lid=lid,
                                        trace_extra=trace_extra,
                                        pre=(pbs[p], cbs[p]), buffer=rows,
                                        plane_buffer=plane_buffer)
            if got >= 0:
                det.landmark_ids[p] = got
        if buffer is None:
            self._flush_rows(rows)

    def _flush_planes(self, staged) -> None:
        """Write staged new-landmark rows — one batched arena write when
        the writer supports it (must run BEFORE the factor-row flush:
        the rows reference these landmark slots)."""
        if not staged:
            return
        lids = [lid for lid, _ in staged]
        if lids[0] != len(self.b._planes) or \
                lids != list(range(lids[0], lids[0] + len(lids))):
            # hard error (not assert: must survive python -O) — writing
            # past this corrupts factor-row -> landmark-slot addressing
            raise RuntimeError(
                "staged landmark order broke the arena append invariant")
        batch = getattr(self.b, "add_planes_batch", None)
        if batch is not None:
            batch([p for _, p in staged])
        else:
            for _, p in staged:
                self.b.add_plane(p)

    def _flush_rows(self, rows) -> None:
        """Write buffered factor rows — one batched append when the
        writer supports it, else per-row."""
        if not rows:
            return
        batch = getattr(self.b, "add_plane_factors_batch", None)
        if batch is not None:
            batch(np.asarray([r[0] for r in rows], np.int32),
                  np.asarray([r[1] for r in rows], np.int32),
                  np.stack([r[2] for r in rows]),
                  np.stack([r[3] for r in rows]))
        else:
            for (gid, lid, pb, S) in rows:
                self.b.add_plane_factor(gid, lid, pb, sqrt_info=S)

    def precompute_detections(self, gid2seq: dict) -> None:
        """Batch-extract fresh plane sets for nodes known upfront to be
        rescue sources (the scan engine's segment split): ONE vmapped
        extraction dispatch instead of one per rescue step. Factors are
        NOT inserted here — the node's estimated pose isn't known yet;
        ``rescue`` consumes the pending detection when it fires.
        """
        if self.frames is None:
            return
        items = []
        for gid, seq in sorted(gid2seq.items()):
            if gid in self.plane_nodes or gid in self.pending:
                continue
            fr = self.frames(seq)
            if fr is not None:
                items.append((gid, seq, fr[1]))
        if not items:
            return
        dets = extract_plane_nodes_batch(
            [self._extract_key(seq) for _, seq, _ in items],
            self.K, [d for _, _, d in items],
            max_planes=self.cfg.max_planes,
            min_support=self.cfg.min_plane_support)
        for (gid, _, _), det in zip(items, dets):
            if det is not None:
                self.pending[gid] = det

    def _extract(self, seq):
        fr = self.frames(seq)
        if fr is None:
            return None
        return extract_plane_node(
            self._extract_key(seq), self.K, fr[0], fr[1],
            max_planes=self.cfg.max_planes,
            min_support=self.cfg.min_plane_support)

    def first_node_planes(self, gid, pose_body: se3.Pose, seq) -> None:
        """firstPlaneNode: register node-0 planes as landmarks
        (gtsam_graph.cpp:1102-1115; driver test_vro_imu_graph.cpp:135-146).
        """
        if self.frames is None:
            return
        det = self._extract(seq)
        if det is not None:
            self.insert_detection(gid, pose_body, det)
            self.plane_nodes[gid] = det

    def rescue(self, gj, est: se3.Pose, seq_to, pre_gid, pre_pose: se3.Pose,
               pre_seq, S_pose) -> None:
        """Frames-driven plane rescue of a VO failure
        (test_vro_imu_graph.cpp:205-300): propagate the PREVIOUS FRAME's
        planes (pre_node_id = m_id-1, :213) through the IMU-predicted
        relative pose from that node's ESTIMATED pose (:239-240), carry
        landmark ids, extract fresh planes on the uncovered cloud.

        Async-pipelined for remote-attached backends: ``est``/
        ``pre_pose``/``S_pose`` may be DEVICE references straight out of
        the fused VIO kernel — the pre-node covariance transform and the
        whole prediction program (between + conjugation + propagation +
        coverage-gated extraction) are enqueued before the host blocks
        on any result, so the device computes while the host associates.
        """
        if self.frames is None:
            return
        pt = self.pt if self.pt is not None else _NULL_TIMER
        rows: list = []
        new_planes: list = []

        # -- resolve the pre-node detection (host bookkeeping only) ------
        pre_det = self.plane_nodes.get(pre_gid)
        # Always consume the pre-extracted entry: if the pre-node already
        # became a plane node (e.g. it was a prior rescue's current node),
        # its pending detection would otherwise leak frame-sized masks for
        # the rest of the run.
        pre_cached = self.pending.pop(pre_gid, None)
        pre_fresh = None          # detection whose factors are not in yet
        if pre_det is None:
            pre_fresh = pre_cached if pre_cached is not None \
                else self._extract(pre_seq)
            pre_det = pre_fresh
        fr = self.frames(seq_to)

        # -- enqueue phase (no host sync) --------------------------------
        with pt("rescue_enqueue"):
            pre_T = None
            if pre_fresh is not None and len(pre_fresh):
                pre_T = _transform_plane_covs_batch(
                    jnp.asarray(pre_fresh.params),
                    jnp.asarray(pre_fresh.cov), self._u2c_inv)
            handle = None
            if fr is not None and pre_det is not None and len(pre_det):
                handle = predict_plane_node_start(
                    self._next_key(), self.K, pre_det,
                    pre_pose.R, pre_pose.t, est.R, est.t, S_pose,
                    fr[0], fr[1], u2c=self.u2c,
                    max_new_planes=self.cfg.max_planes,
                    min_support=self.cfg.min_plane_support)

        # -- read phase --------------------------------------------------
        # overlap ALL device->host transfers before the first blocking
        # read (each serial np.asarray pays a tunnel round trip)
        _start_host_copies(S_pose, pre_T, handle, est, pre_pose)
        est_h = se3.Pose(np.asarray(est.R), np.asarray(est.t))
        pre_h = se3.Pose(np.asarray(pre_pose.R), np.asarray(pre_pose.t))
        trace_simu = float(np.trace(np.asarray(S_pose)[:3, :3]))
        if pre_fresh is not None:
            with pt("rescue_pre_insert"):
                self.insert_detection(pre_gid, pre_h, pre_fresh,
                                      trace_extra=trace_simu,
                                      buffer=rows, plane_buffer=new_planes,
                                      transformed=pre_T)
                self.plane_nodes[pre_gid] = pre_fresh
        cur_det, cur_T = None, None
        if fr is not None:
            if handle is not None:
                with pt("rescue_predict"):
                    cur_det, cur_T = predict_plane_node_finish(handle)
            elif pre_det is None or not len(pre_det):
                cur_det = self._extract(seq_to)
        if cur_det is not None:
            with pt("rescue_cur_insert"):
                self.insert_detection(gj, est_h, cur_det,
                                      trace_extra=trace_simu,
                                      buffer=rows, plane_buffer=new_planes,
                                      transformed=cur_T)
        self.plane_nodes[gj] = cur_det
        with pt("rescue_flush"):
            self._flush_planes(new_planes)
            self._flush_rows(rows)


def _vio_frame_kernel(graph, values, imu_params: ImuParams, acc, gyr, dts,
                      prev_R, prev_t, prev_vel, prev_bias,
                      meas_R, meas_t, sqrt_info_vo, robust_kind, robust_k,
                      failed, is_new, edge_valid, gi_vo, gi_imu, gj,
                      bt_slot, imu_slot, gravity, gate: bool, gate_thresh):
    """The per-record VIO device kernel SHARED by both fused engines.

    Preintegration scan, NavState prediction, the (optional) chi2
    IMU-vs-VRO rotation gate (test_vro_imu_graph.cpp:677-782), the
    VO/IMU-consistent pose selection, and all arena row writes — one
    traced unit, so the per-frame online fast path (``_fused_vio_step``)
    and the whole-replay scan engine (``_replay_scan``) execute literally
    the same operations and cannot drift apart.

    Index semantics match the reference driver: the VO between-factor
    connects the MATCHED pair ``(gi_vo, gj)`` and the VO initial estimate
    composes from the matched node's pose (addToGTSAM,
    gtsam_graph.cpp:655-668), while the CombinedImuFactor always connects
    CONSECUTIVE frames ``(gi_imu = gj-1, gj)`` — the preintegration window
    spans from the previous frame (test_vro_imu_graph.cpp:191-196). The
    two coincide on sequential logs but differ when tracking recovers
    against an older keyframe.

    ``is_new`` False (loop-closure records in the scan engine) turns the
    value writes into no-ops, parks the IMU row inactive, and leaves the
    feedback state untouched; the between row's ``active`` is
    ``~failed`` for new frames and ``edge_valid`` otherwise.

    Returns ``(graph, values, fb, est_R, est_t, pred_vel, st)`` where
    ``fb`` is the (R, t, vel, bias) feedback state after this record and
    ``st`` the window's PreintState (the scan engine ignores it; the
    rescue host step reads its covariance for the plane membership gate).
    """
    from ..core import so3 as _so3

    st = integrate_segment(
        init_preint(prev_bias, imu_params, dtype=prev_t.dtype),
        acc, gyr, dts, imu_params)
    prev_pose = se3.Pose(prev_R, prev_t)
    pred_pose, pred_vel = predict_navstate(st, prev_pose, prev_vel,
                                           prev_bias, gravity)
    if gate:
        R_imu = prev_R.T @ pred_pose.R
        e_R = _so3.logmap(meas_R.T @ R_imu)
        S_R = st.cov[:3, :3] + jnp.eye(3, dtype=prev_t.dtype) * 1e-12
        chi2 = e_R @ jnp.linalg.solve(S_R, e_R)
        failed = failed | (is_new & (chi2 > gate_thresh))

    base = se3.Pose(values.pose_R[gi_vo], values.pose_t[gi_vo])
    comp = se3.compose(base, se3.Pose(meas_R, meas_t))
    est_R = jnp.where(failed, pred_pose.R, comp.R)
    est_t = jnp.where(failed, pred_pose.t, comp.t)

    values = values._replace(
        pose_R=values.pose_R.at[gj].set(
            jnp.where(is_new, est_R, values.pose_R[gj])),
        pose_t=values.pose_t.at[gj].set(
            jnp.where(is_new, est_t, values.pose_t[gj])),
        vel=values.vel.at[gj].set(
            jnp.where(is_new, pred_vel, values.vel[gj])),
        bias=values.bias.at[gj].set(
            jnp.where(is_new, prev_bias, values.bias[gj])),
        num_poses=jnp.maximum(values.num_poses, gj + 1),
        num_vels=jnp.maximum(values.num_vels, gj + 1),
        num_biases=jnp.maximum(values.num_biases, gj + 1),
    )
    active = jnp.where(is_new, ~failed, edge_valid)
    bt = online_mod.between_row(graph.between, bt_slot, gi_vo, gj, meas_R,
                                meas_t, sqrt_info_vo, robust_kind,
                                robust_k, active=active)
    im = online_mod.imu_row(graph.imu, imu_slot, gi_imu, gj, st.dR, st.dp,
                            st.dv, st.H_R_bg, st.H_p_ba, st.H_p_bg,
                            st.H_v_ba, st.H_v_bg, st.bias_hat, st.dt,
                            gravity, st.cov, active=is_new)
    graph = graph._replace(between=bt, imu=im)
    fb = (jnp.where(is_new, est_R, prev_R),
          jnp.where(is_new, est_t, prev_t),
          jnp.where(is_new, pred_vel, prev_vel), prev_bias)
    return graph, values, fb, est_R, est_t, pred_vel, st


@functools.partial(jax.jit, static_argnames=("gate",))
def _fused_vio_step(graph, values, imu_params: ImuParams, acc, gyr, dts,
                    prev_R, prev_t, prev_vel, prev_bias,
                    meas_R, meas_t, sqrt_info_vo, robust_kind, robust_k,
                    failed, gi, gj, bt_slot, imu_slot, gravity,
                    gate: bool = False, gate_thresh: float = 4e4):
    """One VIO frame as ONE device program (the online engine's fast
    path when no plane stack is active; see ``_vio_frame_kernel``).

    The between row is written with ``active = ~failed`` so a gated or
    sentinel-failed edge costs its slot but not its residual — no
    data-dependent host branch, nothing read back per frame. The last
    output is the 15x15 preintegration covariance (the rescue host step's
    plane membership gate; other callers drop it unread, so XLA elides
    the transfer).
    """
    graph, values, _, est_R, est_t, pred_vel, st = _vio_frame_kernel(
        graph, values, imu_params, acc, gyr, dts, prev_R, prev_t,
        prev_vel, prev_bias, meas_R, meas_t, sqrt_info_vo, robust_kind,
        robust_k, failed, jnp.asarray(True), jnp.asarray(True),
        gi, gj - 1, gj, bt_slot, imu_slot, gravity, gate,
        jnp.asarray(gate_thresh, prev_t.dtype))
    return graph, values, est_R, est_t, pred_vel, st.cov


def _static_init(imu: ImuStream, t0: float, imu_params: ImuParams,
                 n_samples: int = 0):
    """Startup gravity/bias initialization from the static window.

    The reference aligns the first pose to the measured gravity direction
    (``initFromImu``, gtsam_graph.cpp:281-318, driven at
    main_rgbdslam_imu_offline.cpp:137-140) and estimates the prior bias
    from the initial static measurements (``initializeGravity``,
    imu_base.cpp:217-249). The static window is everything before the
    first image's sync point (``n_samples=0``); a log that starts at the
    sync point falls back to the first 200 samples (1 s at VN100 rate).

    Returns ``(R0, bias0)``: the gravity-aligned first-node rotation and
    the (ba, bg) prior bias.
    """
    from ..imu.streams import gravity_aligning_rotation, static_bias_estimate

    n = n_samples
    if n <= 0:
        idx = find_index_at(imu.t, t0)
        n = idx if idx > 0 else min(len(imu.t), 200)
    g_mag = float(np.linalg.norm(np.asarray(imu_params.gravity)))
    bias0, g_dir = static_bias_estimate(imu, n, gravity_mag=g_mag)
    R0 = gravity_aligning_rotation(g_dir)
    return R0, bias0


def _pad_window(acc, gyr, n, dt_nom, max_window):
    """Fixed-shape measurement window (masked rows have dt=0).

    An EMPTY window (non-advancing image timestamp) gets one zero-motion
    step: an all-zero ``dt`` vector makes the preintegration covariance
    singular and the IMU row's whitening Cholesky NaN.
    """
    acc_p = np.zeros((max_window, 3))
    gyr_p = np.zeros((max_window, 3))
    dt_p = np.zeros(max_window)
    k = min(n, max_window)
    acc_p[:k] = acc[:k]
    gyr_p[:k] = gyr[:k]
    dt_p[:k] = dt_nom
    if k == 0:
        dt_p[0] = dt_nom
    return acc_p, gyr_p, dt_p


# ---------------------------------------------------------------------------
# whole-replay-on-device engine (engine="scan")


@functools.partial(jax.jit,
                   static_argnames=("gate", "iters", "wcaps", "opt_caps"))
def _replay_scan(graph, values, xs, prev, imu_params, gravity, gate_thresh,
                 damping, robust_kind, robust_kval,
                 gate: bool, iters: int, wcaps, opt_caps):
    """The ENTIRE sequential VIO replay as one compiled program.

    One ``lax.scan`` over VRO records: per step — IMU-window
    preintegration, NavState prediction, (optional) chi2 VO gate, pose
    selection, all arena row writes, and (on schedule) a compact fixed-lag
    optimization (``windowed_gn``) with bias/state feedback. The graph
    STRUCTURE (slots, ids, failure flags, optimize schedule, window
    starts) is host-precomputed from the log — only VALUES flow on device,
    so a 27,000-frame replay is a handful of chunked dispatches sharing
    one compilation instead of one dispatch per frame (the reference
    replays host-side frame by frame, test_vro_imu_graph.cpp:158-351).
    ``prev`` is the (R, t, vel, bias) feedback state entering the chunk;
    the updated state is returned for the next chunk.

    Besides the carry, each optimize step's window chi2 is emitted as a
    scan OUTPUT (NaN on non-optimize records): the reference's
    error-before/after observability (test_gt_graph.cpp:113-117) at zero
    extra dispatches — the value is already computed by ``windowed_gn``,
    it just rides the ys instead of being thrown away.
    """
    from ..graph.online import window_graph, windowed_gn

    nan = jnp.asarray(jnp.nan, jax.tree.leaves(values)[0].dtype)

    def body(carry, x):
        graph, values, pR, pt_, pv, pb = carry
        # shared per-record kernel (identical traced ops to the per-frame
        # online fast path); loop-closure records park their (inactive,
        # finite) IMU row on the reserved dummy slot
        graph, values, fb, *_ = _vio_frame_kernel(
            graph, values, imu_params, x["acc"], x["gyr"], x["dts"],
            pR, pt_, pv, pb, x["meas_R"], x["meas_t"], x["sqrt_info"],
            robust_kind, robust_kval, x["failed"], x["is_new"],
            x["edge_valid"], x["gi"], x["gi_imu"], x["gj"], x["bt_slot"],
            x["imu_slot"], gravity, gate, gate_thresh)
        carry = (graph, values) + fb

        def optimize(c):
            g2, v2, _, _, _, _ = c
            win = window_graph(g2, x["opt_starts"], opt_caps)
            v3, werr = windowed_gn(win, v2, x["free_from"], wcaps, damping,
                                   iters)
            j = x["last_gj"]
            return ((g2, v3, v3.pose_R[j], v3.pose_t[j], v3.vel[j],
                     v3.bias[j]), werr.astype(nan.dtype))

        return jax.lax.cond(x["do_opt"], optimize,
                            lambda c: (c, nan), carry)

    carry0 = (graph, values) + tuple(prev)
    (graph, values, *prev_out), chi2_ys = jax.lax.scan(body, carry0, xs)
    return graph, values, tuple(prev_out), chi2_ys


@jax.jit
def _conjugate_edges_batch(xi, uR, ut):
    """All VRO edges camera->body in ONE device call (the per-record
    ``_conjugate_edge`` is eager JAX — one dispatch per edge, which
    dominates host precompute on remote-attached devices)."""
    T = jax.vmap(se3.expmap)(xi)
    u = se3.Pose(uR, ut)
    uinv = se3.inverse(u)

    def conj(R, t):
        P = se3.compose(se3.compose(u, se3.Pose(R, t)), uinv)
        return P.R, P.t

    R, t = jax.vmap(conj)(T.R, T.t)
    return R, t


@jax.jit
def _expmap_batch(xi):
    T = jax.vmap(se3.expmap)(xi)
    return T.R, T.t


class _ScanPlaneWriter(_PlaneWriterMixin):
    """_PlaneStack writer over the scan engine's live OnlineGraph.

    The scan's VO/IMU rows occupy host-precomputed slots (the scan never
    touches ``og._n``), so the plane tables' append counters stay valid
    for the rescue host steps; growth re-homes the arenas between
    segments (a recompile point, like _OnlineVioGraph's).
    """

    def __init__(self, og: OnlineGraph):
        self.og = og
        self._planes: list = []


def _run_vio_scan(log: VROLog, t_of, imu: ImuStream,
                  imu_params: ImuParams, u2c, params: SlamParams,
                  cfg: VioConfig, lm_params: LMParams,
                  frames=None, intrinsics=None,
                  plane_obs_provider=None) -> VioResult:
    """Host wrapper for ``engine="scan"``: precompute structure, run the
    chunked whole-replay scan, finalize like the per-frame engines.

    With ``plane_mode="rescue"`` and a frame source (or a plane
    observation provider) this is the FUSED FLAGSHIP path: the failure
    records are host-known from the log's info sentinel, so the replay is
    split into scan segments at each failure — everything between
    failures runs as compiled ``lax.scan`` chunks (one dispatch per
    chunk), and each failure record is one host step (fused VO/IMU
    kernel + the batched plane stack: one ``propagate_planes`` dispatch
    for all planes of the frame, association on host). Within a segment
    the plane tables are frozen, so the fixed-lag optimizer's per-record
    window starts stay host-precomputable. Semantics match the online
    engine's rescue path (pinned by tests); throughput is the scan
    engine's (test_vro_imu_graph.cpp:205-300 at the 27k-frame budget,
    gtsam_imuVN100_go.launch:13).
    """
    from ..graph.online import _TABLES, window_graph, windowed_gn
    from ..utils.profiling import Chi2Log, PhaseTimer, trace_context

    robust_k = cfg.robust_k if cfg.robust == "huber" else None
    gravity = np.asarray(imu_params.gravity)
    Wimu = cfg.max_imu_window
    rescue_on = cfg.plane_mode == "rescue" and (
        frames is not None or plane_obs_provider is not None)
    if rescue_on and cfg.chi2_vro_gate:
        raise ValueError(
            "engine='scan' plane rescue requires chi2_vro_gate=False: "
            "the segment split needs failures host-known from the log")

    if len(log) == 0:
        raise ValueError("empty VRO log")
    first_seq = int(log.id_from[0])
    seq2graph = {first_seq: 0}
    seq_ids = [first_seq]
    if cfg.gravity_init:
        init_R, init_bias = _static_init(imu, float(t_of(first_seq)),
                                         imu_params,
                                         cfg.static_init_samples)
    else:
        init_R, init_bias = np.eye(3), np.zeros(6)
    imu.set_start_time(float(t_of(first_seq)))
    cur = 0
    n_imu_rows = 0

    # batched edge conversion: 1-2 device calls for ALL records (the
    # per-record eager path costs one tunnel dispatch per edge)
    valid_mask = np.asarray(log.info[:, 0, 0] != FAILED_INFO_SENTINEL)
    xi_all = jnp.asarray(np.asarray(log.xi, np.float64))
    if u2c is not None:
        R_all, t_all = _conjugate_edges_batch(
            xi_all, jnp.asarray(u2c.R), jnp.asarray(u2c.t))
        Ad = np.asarray(se3.adjoint(u2c))
        info_all = np.einsum("ab,kbc,dc->kad", Ad,
                             np.asarray(log.info, np.float64), Ad)
    else:
        R_all, t_all = _expmap_batch(xi_all)
        info_all = np.asarray(log.info, np.float64)
    R_all = np.array(R_all)
    t_all = np.array(t_all)
    S_all = np.tile(np.eye(6), (len(log), 1, 1))
    if valid_mask.any():
        S_all[valid_mask] = np.transpose(
            np.linalg.cholesky(info_all[valid_mask]), (0, 2, 1))
    R_all[~valid_mask] = np.eye(3)   # fakeOdo identity on sentinel rows
    t_all[~valid_mask] = 0.0

    rows = []
    for k in range(len(log)):
        id_to = int(log.id_to[k])
        id_from = int(log.id_from[k])
        if id_from not in seq2graph:
            continue  # dangling edge (ordered-log assumption)
        failed = not bool(valid_mask[k])
        gi = seq2graph[id_from]
        is_new = id_to not in seq2graph
        if failed and not is_new:
            # failed loop closure: the per-frame engines skip the record
            # entirely (no row, no optimize-cadence check) — match them
            continue
        if is_new:
            gj = len(seq_ids)
            seq2graph[id_to] = gj
            seq_ids.append(id_to)
            t_img = float(t_of(id_to))
            nxt = find_index_at(imu.t, t_img, imu.start)
            if nxt < 0:
                nxt = len(imu.t) - imu.start - 1
            i0, i1 = cur, max(nxt, cur)
            acc, gyr = imu.window(i0, i1)
            cur = nxt
            a, g, d = _pad_window(acc, gyr, i1 - i0, imu.dt, Wimu)
            imu_slot = n_imu_rows
            n_imu_rows += 1
        else:
            gj = seq2graph[id_to]
            # finite single-step placeholder window: keeps the (inactive)
            # dummy IMU row's covariance Cholesky-factorable
            a = np.zeros((Wimu, 3))
            g = np.zeros((Wimu, 3))
            d = np.zeros(Wimu)
            d[0] = imu.dt
            imu_slot = -1  # patched to the dummy slot below
        # matches the per-frame engines: the cadence check runs after EVERY
        # record (loop-closure records can re-trigger at the same count)
        do_opt = bool(cfg.feedback
                      and len(seq_ids) % cfg.optimize_step == 0)
        rows.append(dict(
            is_new=is_new, failed=failed, edge_valid=(not failed),
            gi=gi, gi_imu=(gj - 1 if is_new else gi), gj=gj,
            bt_slot=len(rows), imu_slot=imu_slot,
            last_gj=len(seq_ids) - 1, do_opt=do_opt,
            host=(rescue_on and failed and is_new), seq_to=id_to,
            meas_R=R_all[k], meas_t=t_all[k],
            sqrt_info=S_all[k], acc=a, gyr=g, dts=d,
            n_poses=len(seq_ids), n_between=len(rows) + 1,
            n_imu=n_imu_rows,
        ))
    if not rows:
        raise ValueError("empty VRO log")

    n_frames = len(seq_ids)
    P = round_up(n_frames, 8)
    imu_cap = n_imu_rows + 1         # +1 reserved dummy slot
    between_cap = len(rows) + 1      # +1 reserved dummy slot (chunk pads)
    dummy_slot = imu_cap - 1
    dummy_bt = between_cap - 1

    n_rescue = sum(1 for r in rows if r["host"])
    if rescue_on:
        # host-known budget: rescue frames + firstPlaneNode, each holding
        # up to max_planes propagated + max_planes fresh observations
        plane_factor_cap = round_up(
            max(64, (n_rescue + 1) * (2 * cfg.max_planes + 2)), 8)
        plane_var_cap = max(8, cfg.plane_var_cap)
    else:
        plane_factor_cap = 0
        plane_var_cap = 0

    graph = empty_graph(prior_pose_cap=4, between_cap=between_cap,
                        prior_vel_cap=4, prior_bias_cap=4,
                        plane_cap=plane_factor_cap, imu_cap=imu_cap)
    arena = empty_arena(pose_cap=P, vel_cap=P, bias_cap=P,
                        plane_cap=plane_var_cap)
    og = OnlineGraph(graph, arena)
    pose0 = se3.Pose(jnp.asarray(init_R), jnp.zeros(3))
    og.set_pose(0, pose0)
    og.set_vel(0, np.zeros(3))
    og.set_bias(0, init_bias)
    og.add_prior_pose(0, pose0, _sqrt_info(6, sigmas=np.full(6, 1e-7)))
    og.add_prior_vel(0, np.zeros(3), _sqrt_info(3, sigma=1e-3))
    og.add_prior_bias(0, init_bias, _sqrt_info(6, sigma=1e-3))

    stack = None
    if rescue_on:
        stack = _PlaneStack(_ScanPlaneWriter(og), cfg, params, intrinsics,
                            u2c, frames, plane_obs_provider)
        stack.first_node_planes(0, pose0, first_seq)

    # fixed-lag window configuration (full-graph when cfg.window is None)
    if cfg.window is not None and cfg.window <= 0:
        raise ValueError("VioConfig.window must be positive or None")
    if cfg.window is None and n_frames > 2048:
        raise ValueError(
            f"engine='scan' on {n_frames} frames requires a fixed-lag "
            "window (set VioConfig.window): with window=None every "
            "scheduled optimization QR-solves the FULL arena dimension "
            "inside the compiled scan")
    Wwin = P if cfg.window is None else cfg.window
    PLANE_TB = _TABLES.index("plane")

    def current_opt_caps():
        """Per-table window caps from the LIVE graph (plane growth between
        segments changes table shapes — and therefore compiled shapes)."""
        table_caps = {
            name: jax.tree.leaves(getattr(og.graph, name))[0].shape[0]
            for name in _TABLES}
        if cfg.window:
            want = {"between": 8 * Wwin, "imu": Wwin, "plane": 4 * Wwin}
        else:
            want = {}
        return tuple(min(table_caps[nm], want.get(nm, table_caps[nm]))
                     for nm in _TABLES)

    opt_caps0 = current_opt_caps()

    # per-record optimize-window starts + free boundaries (host-known; the
    # plane column is patched per segment — plane counts only change at
    # host steps, never inside a segment)
    counts_keys = {"prior_pose": 1, "prior_vel": 1, "prior_bias": 1,
                   "plane": 0, "projection": 0, "prior_point": 0}
    for r in rows:
        counts = dict(counts_keys, between=r["n_between"], imu=r["n_imu"])
        r["opt_starts"] = np.asarray(
            [max(0, counts[nm] - opt_caps0[t])
             for t, nm in enumerate(_TABLES)], np.int32)
        f = max(0, r["n_poses"] - Wwin)
        r["free_from"] = np.asarray([f, f, f, 0, 0], np.int32)
        if r["imu_slot"] < 0:
            r["imu_slot"] = dummy_slot

    # host-side stacking only: chunks upload lazily, one per dispatch
    # (stacking straight to device would round-trip the ~512-sample IMU
    # windows — hundreds of MB on long replays — three times)
    def stack_col(key, dtype=None):
        out = np.stack([r[key] for r in rows])
        return out if dtype is None else out.astype(dtype)

    xs_np = {
        "is_new": stack_col("is_new", bool),
        "failed": stack_col("failed", bool),
        "edge_valid": stack_col("edge_valid", bool),
        "gi": stack_col("gi", np.int32),
        "gi_imu": stack_col("gi_imu", np.int32),
        "gj": stack_col("gj", np.int32),
        "bt_slot": stack_col("bt_slot", np.int32),
        "imu_slot": stack_col("imu_slot", np.int32),
        "last_gj": stack_col("last_gj", np.int32),
        "do_opt": stack_col("do_opt", bool),
        "meas_R": stack_col("meas_R"), "meas_t": stack_col("meas_t"),
        "sqrt_info": stack_col("sqrt_info"),
        "acc": stack_col("acc"), "gyr": stack_col("gyr"),
        "dts": stack_col("dts"),
        "opt_starts": stack_col("opt_starts"),
        "free_from": stack_col("free_from"),
    }
    host_idx = [i for i, r in enumerate(rows) if r["host"]]
    rec_seq_to = np.asarray([r["seq_to"] for r in rows])
    n_rec = len(rows)
    del rows   # drop the per-record dicts (dominant transient: IMU windows)

    if stack is not None and frames is not None and host_idx:
        # every rescue's plane SOURCE is the previous frame (gj - 1),
        # host-known upfront: batch all their fresh extractions into one
        # vmapped dispatch instead of one extraction per rescue step
        stack.precompute_detections({
            int(xs_np["gj"][i]) - 1: seq_ids[int(xs_np["gj"][i]) - 1]
            for i in host_idx})

    noop = dict(
        is_new=False, failed=True, edge_valid=False, gi=0, gi_imu=0, gj=0,
        bt_slot=dummy_bt, imu_slot=dummy_slot, last_gj=0, do_opt=False,
        meas_R=np.eye(3), meas_t=np.zeros(3), sqrt_info=np.eye(6),
        acc=np.zeros((Wimu, 3)), gyr=np.zeros((Wimu, 3)),
        dts=np.zeros(Wimu), opt_starts=np.zeros(8, np.int32),
        free_from=np.zeros(5, np.int32))
    noop["dts"][0] = imu.dt

    # chunk shapes: full scan_chunk plus power-of-two tails (>= 16), so the
    # segment split around rescue records compiles a BOUNDED set of
    # programs instead of one per segment length; pad rows are no-ops on
    # the reserved dummy slots
    CH = cfg.scan_chunk

    def chunk_len(remaining: int) -> int:
        if remaining >= CH:
            return CH
        p = 16
        while p < remaining:
            p <<= 1
        return min(p, CH)

    chi2_log = Chi2Log()
    pt = PhaseTimer()
    if stack is not None:
        stack.pt = pt
    dt64 = og.values.pose_t.dtype
    robust_kind_j = jnp.asarray(0 if robust_k is None else 1, jnp.int32)
    robust_k_j = jnp.asarray(1.0 if robust_k is None else float(robust_k),
                             dt64)
    damping_j = jnp.asarray(1e-6, dt64)

    def scan_segment(lo: int, hi: int, prev):
        """Run scan rows [lo, hi) as chunked compiled dispatches."""
        while lo < hi:
            take = chunk_len(hi - lo)
            n_real = min(hi - lo, take)
            pad = take - n_real
            xs_c = {}
            for key, arr in xs_np.items():
                sl = arr[lo:lo + n_real]
                if pad:
                    tail = np.broadcast_to(
                        np.asarray(noop[key], arr.dtype),
                        (pad,) + arr.shape[1:])
                    sl = np.concatenate([sl, tail])
                xs_c[key] = sl
            opt_caps = current_opt_caps()
            if stack is not None:
                xs_c["opt_starts"] = xs_c["opt_starts"].copy()
                xs_c["opt_starts"][:, PLANE_TB] = max(
                    0, og._n["plane"] - opt_caps[PLANE_TB])
            xs_c = {k: jnp.asarray(v) for k, v in xs_c.items()}
            og.graph, og.values, prev, chi2_ys = _replay_scan(
                og.graph, og.values, xs_c, prev, imu_params,
                jnp.asarray(gravity, dt64),
                jnp.asarray(cfg.chi2_threshold, dt64), damping_j,
                robust_kind_j, robust_k_j,
                gate=cfg.chi2_vro_gate, iters=cfg.incremental_iters,
                wcaps=(Wwin, Wwin, Wwin), opt_caps=opt_caps)
            # in-scan telemetry: the window chi2 of every scheduled
            # optimization rode the scan outputs — no extra programs, and
            # the read is DEFERRED to end-of-replay (an eager np.asarray
            # here would sync the pipeline once per chunk)
            opt_rows = np.nonzero(xs_np["do_opt"][lo:lo + n_real])[0]
            if len(opt_rows):
                _start_host_copies(chi2_ys)
                deferred_chi2.append((lo, opt_rows, chi2_ys))
            lo += n_real
        return prev

    def host_step(i: int, prev):
        """One rescue record: fused VO/IMU kernel + batched plane stack
        (the online engine's rescue semantics at scan-slot addressing)."""
        og.graph, og.values, est_R, est_t, pred_vel, S15 = _fused_vio_step(
            og.graph, og.values, imu_params,
            jnp.asarray(xs_np["acc"][i]), jnp.asarray(xs_np["gyr"][i]),
            jnp.asarray(xs_np["dts"][i]),
            jnp.asarray(prev[0], dt64), jnp.asarray(prev[1], dt64),
            jnp.asarray(prev[2], dt64), jnp.asarray(prev[3], dt64),
            jnp.asarray(xs_np["meas_R"][i], dt64),
            jnp.asarray(xs_np["meas_t"][i], dt64),
            jnp.asarray(xs_np["sqrt_info"][i], dt64),
            robust_kind_j, robust_k_j, jnp.asarray(True),
            jnp.asarray(int(xs_np["gi"][i])),
            jnp.asarray(int(xs_np["gj"][i])),
            jnp.asarray(int(xs_np["bt_slot"][i])),
            jnp.asarray(int(xs_np["imu_slot"][i])),
            jnp.asarray(gravity, dt64))
        gj = int(xs_np["gj"][i])
        og.num_poses = max(og.num_poses, gj + 1)
        og.num_vels = max(og.num_vels, gj + 1)
        og.num_biases = max(og.num_biases, gj + 1)
        est = se3.Pose(est_R, est_t)
        S_pose = S15[:6, :6]     # device ref: rescue enqueues against it
        seq_to = int(rec_seq_to[i])
        stack.provider_obs(gj, est, seq_to)
        if frames is not None:
            pre_gid = gj - 1
            pre_pose = se3.Pose(og.values.pose_R[pre_gid],
                                og.values.pose_t[pre_gid])
            stack.rescue(gj, est, seq_to, pre_gid, pre_pose,
                         seq_ids[pre_gid], S_pose)
        prev = (est_R, est_t, pred_vel, prev[3])
        if xs_np["do_opt"][i]:
            opt_caps = current_opt_caps()
            starts = np.array(xs_np["opt_starts"][i])
            starts[PLANE_TB] = max(0, og._n["plane"] - opt_caps[PLANE_TB])
            win = window_graph(og.graph, jnp.asarray(starts), opt_caps)
            vals, werr = windowed_gn(
                win, og.values, jnp.asarray(xs_np["free_from"][i]),
                (Wwin, Wwin, Wwin), damping_j, cfg.incremental_iters)
            og.values = vals
            j = int(xs_np["last_gj"][i])
            prev = (vals.pose_R[j], vals.pose_t[j], vals.vel[j],
                    vals.bias[j])
            _start_host_copies(werr)
            deferred_werr.append((i, j + 1, werr))
        return prev

    deferred_chi2: list = []   # (chunk_lo, opt_rows, device chi2 vector)
    deferred_werr: list = []   # (record, frame, device scalar)
    with trace_context(cfg.trace_dir):
        with pt("replay_scan"):
            prev = (og.values.pose_R[0], og.values.pose_t[0],
                    og.values.vel[0], og.values.bias[0])
            seg_lo = 0
            for i in host_idx:
                prev = scan_segment(seg_lo, i, prev)
                with pt("rescue_step"):
                    prev = host_step(i, prev)
                seg_lo = i + 1
            prev = scan_segment(seg_lo, n_rec, prev)
            jax.block_until_ready(og.values.pose_t)

        # materialize the deferred in-replay telemetry (device scalars
        # whose host copies were started inside the loop), in replay order
        merged = [(lo + int(q), int(xs_np["last_gj"][lo + q]) + 1, ys, q)
                  for lo, opt_rows, ys in deferred_chi2 for q in opt_rows]
        merged += [(rec, frame, werr, None)
                   for rec, frame, werr in deferred_werr]
        for rec, frame, val, q in sorted(merged, key=lambda m: m[0]):
            v = np.asarray(val)
            chi2_log.add(rec, frame, None,
                         float(v if q is None else v[q]))

        graph, values = og.graph, og.values
        n_vo = int(np.asarray(graph.between.active).sum())
        e0 = float(total_error(graph, values))
        if cfg.final_batch:
            with pt("final_batch"):
                res = lm_optimize(graph, values, lm_params)
            values = res.values
            err = float(res.error)
        else:
            err = e0
    chi2_log.add(len(log), n_frames, e0, err)

    return VioResult(values=values, graph=graph,
                     seq_ids=np.asarray(seq_ids), error0=e0, error=err,
                     n_imu_factors=n_imu_rows, n_vo_edges=n_vo,
                     n_plane_factors=stack.n_plane if stack else 0,
                     plane_book=stack.book if stack else None,
                     chi2_log=chi2_log, timers=pt.summary(),
                     plane_stack=stack)


def run_vio(log: VROLog, img_times, imu: ImuStream,
            imu_params: ImuParams, u2c: Optional[se3.Pose] = None,
            plane_obs_provider: Optional[Callable] = None,
            frames: Optional[Callable] = None,
            intrinsics: Optional[CameraIntrinsics] = None,
            params: SlamParams = SlamParams(),
            cfg: VioConfig = VioConfig(),
            lm_params: LMParams = LMParams()) -> VioResult:
    """Replay a VRO log with IMU (+ optional plane observations).

    Args:
      img_times: mapping seq_id -> timestamp (dict or callable).
      plane_obs_provider: optional ``seq_id -> [(plane_cam4, cov3x3), ...]``
        supplying per-frame plane observations in the camera frame
        (synthetic injection, used by tests).
      frames: optional ``seq_id -> (intensity, depth_m) | None`` frame
        source (e.g. ``io.frames.FrameStore``). When given (with
        ``intrinsics``), the plane stack runs end-to-end from real frames:
        node 0 planes are extracted and registered (``firstPlaneNode``,
        gtsam_graph.cpp:1102-1115); on VO failure the previous node's
        planes are propagated through the IMU-predicted pose
        (``predictPlaneNode``) with fresh extraction of the uncovered
        cloud, landmark ids carried, and plane factors inserted — the
        reference's plane rescue of tracking loss
        (test_vro_imu_graph.cpp:205-300).
    """
    t_of = img_times.__getitem__ if hasattr(img_times, "__getitem__") \
        else img_times
    gravity = np.asarray(imu_params.gravity)
    u2c_arg = u2c  # None means identity; predict_plane_node skips conjugation
    if frames is not None and intrinsics is None:
        raise ValueError("frames mode requires camera intrinsics")
    robust_k = cfg.robust_k if cfg.robust == "huber" else None

    if cfg.engine == "scan":
        if cfg.plane_mode == "always":
            raise ValueError(
                "engine='scan' supports plane_mode 'off' or 'rescue' "
                "(failures are host-known from the log, every frame is "
                "not); use engine='online' for 'always'")
        if not cfg.feedback:
            raise ValueError("engine='scan' requires feedback=True")
        return _run_vio_scan(log, t_of, imu, imu_params, u2c, params, cfg,
                             lm_params, frames=frames,
                             intrinsics=intrinsics,
                             plane_obs_provider=plane_obs_provider)

    online = cfg.engine == "online"
    if online:
        n_frames = len(set(int(x) for x in log.id_to)) + 1
        b = _OnlineVioGraph(
            n_frames, len(log), bucket=cfg.bucket,
            plane_var_cap=cfg.plane_var_cap,
            plane_factor_cap=max(64, 4 * n_frames))
        inc = IncrementalOptimizer(
            iters_per_update=cfg.incremental_iters, damping=1e-6,
            solver=cfg.incremental_solver,
            pcg_iters=cfg.incremental_pcg_iters, window=cfg.window)
    else:
        b = GraphBuilder()
        inc = None
    # the plane stack needs an observation SOURCE; plane_mode="rescue"
    # with neither frames nor a provider is inert, and treating it as
    # plane-free keeps the fused per-frame fast path available
    stack = _PlaneStack(b, cfg, params, intrinsics, u2c_arg, frames,
                        plane_obs_provider) \
        if cfg.plane_mode != "off" and (frames is not None
                                        or plane_obs_provider is not None) \
        else None
    book = stack.book if stack is not None else None

    seq2graph: dict[int, int] = {}
    seq_ids: list[int] = []
    n_vo = n_imu = 0

    # startup gravity/bias initialization (initFromImu + static window;
    # see _static_init) — identity pose / zero bias when disabled
    if cfg.gravity_init and len(log):
        init_R, init_bias = _static_init(
            imu, float(t_of(int(log.id_from[0]))), imu_params,
            cfg.static_init_samples)
    else:
        init_R, init_bias = np.eye(3), np.zeros(6)
    init_pose = se3.Pose(jnp.asarray(init_R), jnp.zeros(3))

    # estimator state (feedback loop)
    prev_pose = init_pose
    prev_vel = jnp.zeros(3)
    prev_bias = jnp.asarray(init_bias)
    cur_imu_idx = 0  # measurement cursor relative to sync start

    def first_node(seq):
        nonlocal cur_imu_idx
        gid = b.add_pose((init_R, np.zeros(3)))
        b.add_vel(np.zeros(3))
        b.add_bias(init_bias)
        seq2graph[seq] = gid
        seq_ids.append(seq)
        b.add_prior_pose(gid, (init_R, np.zeros(3)),
                         sigmas=np.full(6, 1e-7))
        b.add_prior_vel(gid, np.zeros(3), sigma=1e-3)
        b.add_prior_bias(gid, init_bias, sigma=1e-3)
        imu.set_start_time(float(t_of(seq)))
        cur_imu_idx = 0
        if stack is not None:
            stack.first_node_planes(gid, init_pose, seq)

    def imu_window_for(seq):
        """Padded measurement window [cur_imu_idx, index_at(t_img))."""
        nonlocal cur_imu_idx
        t_img = float(t_of(seq))
        nxt = find_index_at(imu.t, t_img, imu.start)
        if nxt < 0:
            nxt = len(imu.t) - imu.start - 1
        i0, i1 = cur_imu_idx, max(nxt, cur_imu_idx)
        acc, gyr = imu.window(i0, i1)
        cur_imu_idx = nxt
        return _pad_window(acc, gyr, i1 - i0, imu.dt, cfg.max_imu_window)

    def integrate_to(seq):
        """Preintegrate the window with the current bias estimate."""
        a, g, dts = imu_window_for(seq)
        st = init_preint(prev_bias, imu_params)
        return integrate_segment(st, a, g, dts, imu_params)

    # observability: per-phase wall timers + chi2-per-update records +
    # optional jax.profiler trace over the whole replay (SURVEY §5)
    import contextlib

    from ..utils.profiling import Chi2Log, PhaseTimer, trace_context

    chi2_log = Chi2Log()
    pt = PhaseTimer()
    _stack = contextlib.ExitStack()
    _stack.enter_context(trace_context(cfg.trace_dir))

    log_order = range(len(log))
    for k in log_order:
        id_to = int(log.id_to[k])
        id_from = int(log.id_from[k])
        info = log.info[k]
        failed = info[0, 0] == FAILED_INFO_SENTINEL

        if not seq2graph:
            first_node(id_from)
            prev_pose = init_pose
            prev_vel = jnp.zeros(3)
            prev_bias = jnp.asarray(init_bias)

        if id_from not in seq2graph:
            continue
        gi = seq2graph[id_from]

        # fused fast path: whole frame = ONE device call (no plane stack)
        fast = online and book is None and plane_obs_provider is None

        if id_to not in seq2graph and fast:
            with pt("fused_frame"):
                a, g_, dts = imu_window_for(id_to)
                if failed:
                    # the between row is written inactive, but its sqrt-info
                    # still passes through a host Cholesky — reference logs
                    # carry arbitrary values beyond the info(0,0) sentinel
                    # on failed rows, so substitute a benign placeholder
                    T = se3.identity()
                    info_b = np.eye(6)
                else:
                    T, info_b = _conjugate_edge(log.xi[k], info, u2c)
                gj = len(seq_ids)
                og = b.og
                bt_slot = og._slot("between", og.graph.between.i.shape[0])
                imu_slot = og._slot("imu", og.graph.imu.i.shape[0])
                dt64 = og.values.pose_t.dtype
                og.graph, og.values, est_R, est_t, pred_vel, _ = \
                    _fused_vio_step(
                        og.graph, og.values, imu_params, a, g_, dts,
                        jnp.asarray(prev_pose.R, dt64),
                        jnp.asarray(prev_pose.t, dt64),
                        jnp.asarray(prev_vel, dt64),
                        jnp.asarray(prev_bias, dt64),
                        jnp.asarray(T.R, dt64), jnp.asarray(T.t, dt64),
                        jnp.asarray(_sqrt_info(6, information=info_b), dt64),
                        jnp.asarray(0 if robust_k is None else 1, jnp.int32),
                        jnp.asarray(1.0 if robust_k is None
                                    else float(robust_k), dt64),
                        jnp.asarray(bool(failed)), jnp.asarray(gi),
                        jnp.asarray(gj),
                        jnp.asarray(bt_slot), jnp.asarray(imu_slot),
                        jnp.asarray(gravity, dt64),
                        gate=cfg.chi2_vro_gate,
                        gate_thresh=cfg.chi2_threshold)
                og.num_poses = max(og.num_poses, gj + 1)
                og.num_vels = max(og.num_vels, gj + 1)
                og.num_biases = max(og.num_biases, gj + 1)
                seq2graph[id_to] = gj
                seq_ids.append(id_to)
                n_imu += 1
                if cfg.feedback:
                    prev_pose = se3.Pose(est_R, est_t)
                    prev_vel = pred_vel
        elif id_to not in seq2graph:
            # --- new frame ---------------------------------------------
            with pt("imu_preint"):
                st = integrate_to(id_to)
                pred_pose, pred_vel = predict_navstate(
                    st, prev_pose, prev_vel, prev_bias, imu_params.gravity)

            T, info_b = _conjugate_edge(log.xi[k], info, u2c)

            if cfg.chi2_vro_gate and not failed:
                # rotation consistency: VO increment vs IMU prediction,
                # whitened by the preintegrated rotation covariance
                from ..core import so3 as _so3

                R_imu = (prev_pose.R.T @ pred_pose.R)
                e_R = np.asarray(_so3.logmap(jnp.asarray(T.R).T @ R_imu))
                S_R = np.asarray(st.cov)[:3, :3] + np.eye(3) * 1e-12
                chi2 = float(e_R @ np.linalg.solve(S_R, e_R))
                if chi2 > cfg.chi2_threshold:
                    failed = True   # reject the VO edge; IMU carries the pose

            gj = len(seq_ids)
            if not failed:
                # initial estimate composes from the MATCHED node's pose
                # (addToGTSAM, gtsam_graph.cpp:655-668); gi == gj-1 on
                # sequential logs but differs when tracking recovers
                # against an older keyframe
                Ri, ti = b.pose(gi)
                est = se3.compose(se3.Pose(jnp.asarray(Ri),
                                           jnp.asarray(ti)), T)
            else:
                est = pred_pose
            b.add_pose((np.asarray(est.R), np.asarray(est.t)))
            b.add_vel(np.asarray(pred_vel))
            b.add_bias(np.asarray(prev_bias))
            seq2graph[id_to] = gj
            seq_ids.append(id_to)

            if not failed:
                b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                              information=info_b, robust=robust_k)
                n_vo += 1
            # the CombinedImuFactor always connects CONSECUTIVE frames
            # (test_vro_imu_graph.cpp:191-196): the preintegration window
            # spans from the previous frame, whatever the VO edge matched
            b.add_imu_factor(gj - 1, gj, st, gravity)
            n_imu += 1

            want_planes = stack is not None and (
                cfg.plane_mode == "always"
                or (cfg.plane_mode == "rescue" and failed))
            if want_planes:
                stack.provider_obs(gj, est, id_to)
                if frames is not None:
                    # frames-driven rescue from the PREVIOUS FRAME's
                    # estimated pose — NOT the matched node gi and NOT the
                    # feedback state, which differ when tracking recovers
                    # against an older keyframe (see _PlaneStack.rescue)
                    pre_gid = gj - 1
                    Rp, tp = b.pose(pre_gid)
                    pre_pose = se3.Pose(jnp.asarray(Rp), jnp.asarray(tp))
                    stack.rescue(gj, est, id_to, pre_gid, pre_pose,
                                 seq_ids[pre_gid],
                                 np.asarray(st.cov)[:6, :6])

            if cfg.feedback:
                prev_pose, prev_vel = est, pred_vel
        else:
            # --- loop closure -------------------------------------------
            if failed:
                continue
            gj = seq2graph[id_to]
            T, info_b = _conjugate_edge(log.xi[k], info, u2c)
            b.add_between(gi, gj, (np.asarray(T.R), np.asarray(T.t)),
                          information=info_b, robust=robust_k)
            n_vo += 1

        # --- periodic incremental optimization + feedback ---------------
        if cfg.feedback and len(seq_ids) % cfg.optimize_step == 0:
            with pt("optimize"):
                if online:
                    # zero-recompile update on the live arenas; og.values IS
                    # the estimator state (no write-back needed)
                    res = inc.update(b.og)
                    vals = b.og.values
                else:
                    graph, values = b.build(bucket=cfg.bucket)
                    res = gn_optimize(graph, values,
                                      iterations=cfg.incremental_iters,
                                      solver="dense", damping=1e-6)
                    vals = res.values
            chi2_log.add(k, len(seq_ids), None, float(res.error))
            j = len(seq_ids) - 1
            prev_pose = se3.Pose(vals.pose_R[j], vals.pose_t[j])
            prev_vel = vals.vel[j]
            prev_bias = vals.bias[j]
            if not online:
                # write back optimized estimates as new initial values
                for q in range(len(seq_ids)):
                    b.set_pose(q, (np.asarray(vals.pose_R[q]),
                                   np.asarray(vals.pose_t[q])))
                    b._vels[q] = np.asarray(vals.vel[q])
                    b._biases[q] = np.asarray(vals.bias[q])

    if online:
        graph, values = b.og.graph, b.og.values
        # the fused path never reads the gate verdict back per frame;
        # count accepted VO edges from the active mask instead
        n_vo = int(np.asarray(graph.between.active).sum())
    else:
        graph, values = b.build(bucket=cfg.bucket)
    e0 = float(total_error(graph, values))
    if cfg.final_batch:
        with pt("final_batch"):
            res = lm_optimize(graph, values, lm_params)
        values = res.values
        err = float(res.error)
    else:
        err = e0
    chi2_log.add(len(log), len(seq_ids), e0, err)
    _stack.close()

    return VioResult(values=values, graph=graph,
                     seq_ids=np.asarray(seq_ids), error0=e0, error=err,
                     n_imu_factors=n_imu, n_vo_edges=n_vo,
                     n_plane_factors=stack.n_plane if stack else 0,
                     plane_book=book,
                     chi2_log=chi2_log, timers=pt.summary(),
                     plane_stack=stack)
