"""Plane-stack plumbing of the VIO pipeline.

The host-side plane state machine of ``test_vro_imu_graph.cpp`` —
firstPlaneNode, the rescue block, the addPlaneFactor /
planeNodeAssociation split — plus the writer facades that let it drive
either engine's live ``OnlineGraph`` arenas (round-3 verdict ask #7:
extracted from the 1,593-line ``pipelines/vio.py`` monolith).
"""

from __future__ import annotations

import contextlib
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamParams
from ..core import se3
from ..graph.builder import _sqrt_info, round_up
from ..graph.factors import empty_graph
from ..graph.online import OnlineGraph
from ..graph.variables import empty_arena
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
from .vio_types import VioConfig

__all__ = ["_PlaneWriterMixin", "_OnlineVioGraph", "_ScanPlaneWriter",
           "_PlaneStack", "_NULL_TIMER", "_append_planes_batch",
           "_start_host_copies", "_transform_plane_covs_batch"]


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

