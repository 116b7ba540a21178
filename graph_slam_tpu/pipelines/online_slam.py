"""Online RGB-D SLAM: feature frontend + keyframing + loop closures.

Twin of the reference's ONLINE pipeline (``test_gt_graph.cpp:38-130`` with
``CGraphGT::addNode`` gtsam_graph.cpp:1670-1766, and the g2o variant
``g2o/test_g2o_graph.cpp``):

  frame -> feature extraction -> match vs previous keyframe
    - small motion (t < 0.05 m AND theta < 3 deg)   -> drop frame
    - large motion (t > 2 m OR theta > 20 deg)      -> reject as outlier
    - match failure                                  -> fakeOdoNode
      (identity edge, info 1e4*I gtsam / 1e-3*I g2o, gtsam_graph.cpp:697-722,
       g2o_graph.cpp:151)
    - else VO edge; then loop closures against the last ``lookback``
      keyframes — the reference's QtConcurrent thread-pool map
      (gtsam_graph.cpp:1730-1731) becomes one vmapped batch
      (``match_one_to_many``) on device;
  every ``optimize_step`` keyframes: batch LM; trajectory / PLY output.

Optionally records every accepted edge to a ``vro_results.log``
(``recordVROResult`` role) so offline pipelines can replay the run.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SlamParams
from ..core import se3, so3
from ..graph import LMParams, lm_optimize
from ..graph.builder import _sqrt_info, round_up
from ..graph.factors import empty_graph
from ..graph.online import OnlineGraph
from ..graph.variables import empty_arena
from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog, write_vro_log
from ..vision.features import FeatureFrame, extract_features
from ..vision.frontend import match_frames_device, match_one_to_many

__all__ = ["OnlineSlam", "FrameStatus"]


class FrameStatus:
    FIRST = "first"
    KEYFRAME = "keyframe"
    SMALL_MOTION = "small_motion"      # dropped, not a keyframe
    FAILED = "failed"                   # fake odometry inserted


def _motion_magnitude(R, t):
    dist = float(np.linalg.norm(np.asarray(t)))
    tr = float(np.trace(np.asarray(R)))
    ang = math.degrees(math.acos(max(-1.0, min(1.0, (tr - 1.0) * 0.5))))
    return dist, ang


@dataclasses.dataclass
class OnlineSlam:
    """Stateful online SLAM session (CGraphGT + frontend roles)."""

    cam: CameraIntrinsics
    params: SlamParams = dataclasses.field(default_factory=SlamParams)
    backend: str = "gtsam"            # "gtsam" | "g2o" (fake-odo weighting)
    max_features: int = 256
    n_hyp: int = 2048
    inlier_thresh: float = 0.05
    min_inliers: int = 12
    seed: int = 0
    initial_pose_cap: int = 128   # arena start size; doubles on overflow
    features: str = "harris"      # "harris" | "sift" frontend (vision/)
    # global place-recognition loop closures (vision/place.py): try the
    # top-k most similar keyframes OLDER than the lookback window each
    # keyframe; 0 disables (the reference has no global tier)
    global_loop_k: int = 0
    global_loop_min_gap: int = 10  # proposals must be this many KFs old

    def __post_init__(self):
        # preallocated online arenas: appends are jitted row writes, the
        # optimizer runs on the live arrays with no host rebuild (the
        # CGraphGT::addNode + optimizeGraph execution model with ISAM2-role
        # zero-recompile updates, gtsam_graph.cpp:1670-1788)
        self._pose_cap = self.initial_pose_cap
        self.og = OnlineGraph(
            empty_graph(prior_pose_cap=2,
                        between_cap=self._between_cap(self._pose_cap)),
            empty_arena(pose_cap=self._pose_cap))
        self.frames: list[FeatureFrame] = []   # keyframe feature frames
        self.seq_ids: list[int] = []
        self.records: list[tuple] = []          # VRO log rows
        self._key = jax.random.PRNGKey(self.seed)
        self._values = None
        self._n_since_opt = 0
        self._sequence = 0
        from ..vision.frontend import get_extractor
        self._extract = get_extractor(self.features)
        self._places = None
        if self.global_loop_k > 0:
            from ..vision.place import PlaceIndex
            self._places = PlaceIndex(seed=self.seed)
        from ..utils.profiling import Chi2Log, PhaseTimer

        self.chi2_log = Chi2Log()
        self.timers = PhaseTimer()

    def _between_cap(self, pose_cap: int) -> int:
        return round_up(pose_cap * (self.params.lookback_nodes + 1), 64)

    def _ensure_capacity(self):
        bt_cap = self.og.graph.between.i.shape[0]
        if (len(self.frames) + 1 >= self._pose_cap
                or self.og._n["between"] + self.params.lookback_nodes + 2
                >= bt_cap):
            self._pose_cap *= 2
            self.og.grow(pose_cap=self._pose_cap, factor_caps={
                "between": self._between_cap(self._pose_cap)})

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def num_keyframes(self) -> int:
        return len(self.frames)

    def _fake_info(self):
        scale = 1e4 if self.backend == "gtsam" else 1e-3
        return np.eye(6) * scale

    def _record(self, id_to, id_from, T, info):
        xi = np.asarray(se3.logmap(se3.Pose(jnp.asarray(T[0]),
                                            jnp.asarray(T[1]))))
        self.records.append((id_to, id_from, xi, np.asarray(info)))

    # ------------------------------------------------------------------
    def process_frame(self, intensity, depth, seq_id: Optional[int] = None):
        """Feed one RGB-D frame; returns a FrameStatus."""
        if seq_id is None:
            seq_id = self._sequence
        self._sequence += 1
        frame = self._extract(self.cam, jnp.asarray(intensity),
                              jnp.asarray(depth),
                              max_features=self.max_features)

        if not self.frames:
            self.og.set_pose(0, se3.identity())
            self.og.add_prior_pose(0, se3.identity(),
                                   _sqrt_info(6, sigmas=np.full(6, 1e-7)))
            self.frames.append(frame)
            self.seq_ids.append(seq_id)
            if self._places is not None:
                self._places.add(frame)
            return FrameStatus.FIRST

    # -- odometry match vs the previous keyframe -----------------------
        prev = self.frames[-1]
        R, t, info, n_inl, ok = match_frames_device(
            self._next_key(), prev, frame, n_hyp=self.n_hyp,
            inlier_thresh=self.inlier_thresh, min_inliers=self.min_inliers)

        gi = len(self.frames) - 1
        self._ensure_capacity()
        if not bool(ok) or not np.isfinite(np.asarray(info)).all():
            # total failure -> fake odometry keyframe (fakeOdoNode)
            gj = gi + 1
            self.og.set_pose(gj, self.og.pose(gi))
            fake = self._fake_info()
            self.og.add_between(gi, gj, se3.identity(),
                                _sqrt_info(6, information=fake))
            self._record(seq_id, self.seq_ids[-1], (np.eye(3), np.zeros(3)),
                         np.eye(6) * FAILED_INFO_SENTINEL)
            self.frames.append(frame)
            self.seq_ids.append(seq_id)
            if self._places is not None:
                self._places.add(frame)
            self._after_keyframe()
            return FrameStatus.FAILED

        dist, ang = _motion_magnitude(R, t)
        if dist < self.params.small_translation \
                and ang < self.params.small_rotation:
            return FrameStatus.SMALL_MOTION
        if dist > self.params.large_translation \
                or ang > self.params.large_rotation:
            # outlier transform: treat like a failure (reference rejects it)
            return FrameStatus.SMALL_MOTION

        # accept keyframe + odometry edge
        est = se3.compose(self.og.pose(gi), se3.Pose(R, t))
        gj = gi + 1
        self.og.set_pose(gj, est)
        self.og.add_between(gi, gj, se3.Pose(R, t),
                            _sqrt_info(6, information=np.asarray(info)))
        self._record(seq_id, self.seq_ids[-1],
                     (np.asarray(R), np.asarray(t)), np.asarray(info))

        # -- loop closures: one vmapped batch over the lookback window --
        lb = min(self.params.lookback_nodes, gi)
        if lb > 1:
            cands = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *self.frames[gi - lb:gi])
            Rs, ts, infos, ninls, oks = match_one_to_many(
                self._next_key(), frame, cands, n_hyp=self.n_hyp,
                inlier_thresh=self.inlier_thresh,
                min_inliers=self.min_inliers)
            for c in range(lb - 1):   # skip the immediate predecessor
                ci = gi - lb + c
                if not bool(oks[c]):
                    continue
                d, a = _motion_magnitude(Rs[c], ts[c])
                if d > self.params.large_translation \
                        or a > self.params.large_rotation:
                    continue
                if not np.isfinite(np.asarray(infos[c])).all():
                    continue
                self.og.add_between(
                    ci, gj, se3.Pose(Rs[c], ts[c]),
                    _sqrt_info(6, information=np.asarray(infos[c])))
                self._record(seq_id, self.seq_ids[ci],
                             (np.asarray(Rs[c]), np.asarray(ts[c])),
                             np.asarray(infos[c]))

        # -- global loop closures: place-recognition proposals beyond the
        # lookback window (vision/place.py; no reference counterpart) --
        if self._places is not None:
            cand_ids, _ = self._places.query(
                frame, top_k=self.global_loop_k,
                max_id=gj - self.global_loop_min_gap + 1)
            for ci in cand_ids:
                ci = int(ci)
                Rg, tg, infog, _, okg = match_frames_device(
                    self._next_key(), self.frames[ci], frame,
                    n_hyp=self.n_hyp, inlier_thresh=self.inlier_thresh,
                    min_inliers=self.min_inliers)
                if not bool(okg):
                    continue
                d, a = _motion_magnitude(Rg, tg)
                if d > self.params.large_translation \
                        or a > self.params.large_rotation:
                    continue
                if not np.isfinite(np.asarray(infog)).all():
                    continue
                self.og.add_between(
                    ci, gj, se3.Pose(Rg, tg),
                    _sqrt_info(6, information=np.asarray(infog)))
                self._record(seq_id, self.seq_ids[ci],
                             (np.asarray(Rg), np.asarray(tg)),
                             np.asarray(infog))

        self.frames.append(frame)
        self.seq_ids.append(seq_id)
        if self._places is not None:
            self._places.add(frame)
        self._after_keyframe()
        return FrameStatus.KEYFRAME

    # ------------------------------------------------------------------
    def _after_keyframe(self):
        self._n_since_opt += 1
        if self._n_since_opt >= self.params.optimize_step:
            self.optimize()

    def optimize(self, lm_params: Optional[LMParams] = None):
        """Batch optimize on the live arenas (optimizeGraphBatch) — no host
        rebuild; the optimized values become the estimator state. Logs chi2
        before/after (the test_gt_graph.cpp:113-117 pattern).

        The g2o backend runs a flat 20 LM iterations with no convergence
        test (``CGraphG2O::optimizeGraph``, g2o_graph.cpp:241-252); gtsam
        uses the GTSAM default stopping rules.
        """
        if lm_params is None:
            lm_params = (LMParams(max_iterations=20, relative_error_tol=0.0,
                                  absolute_error_tol=0.0)
                         if self.backend == "g2o" else LMParams())
        before = self.og.error()
        with self.timers("optimize"):
            res = lm_optimize(self.og.graph, self.og.values, lm_params)
        self.og.values = res.values
        self._values = res.values
        self._n_since_opt = 0
        self.chi2_log.add(self._sequence, len(self.frames), before,
                          float(res.error))
        return float(res.error)

    def error(self) -> float:
        return self.og.error()

    # -- outputs ---------------------------------------------------------
    def trajectory(self, w2o: se3.Pose | None = None):
        n = len(self.frames)
        R = np.asarray(self.og.values.pose_R[:n])
        t = np.asarray(self.og.values.pose_t[:n])
        if w2o is not None:
            P = se3.compose(
                se3.Pose(jnp.broadcast_to(w2o.R, R.shape),
                         jnp.broadcast_to(w2o.t, t.shape)),
                se3.Pose(jnp.asarray(R), jnp.asarray(t)))
            R, t = np.asarray(P.R), np.asarray(P.t)
        q = np.asarray(so3.matrix_to_quat(jnp.asarray(R)))
        return np.arange(n), t, q, np.asarray(self.seq_ids)

    def vro_log(self) -> VROLog:
        if not self.records:
            return VROLog(np.zeros(0, int), np.zeros(0, int),
                          np.zeros((0, 6)), np.zeros((0, 6, 6)))
        return VROLog(
            np.asarray([r[0] for r in self.records]),
            np.asarray([r[1] for r in self.records]),
            np.stack([r[2] for r in self.records]),
            np.stack([r[3] for r in self.records]),
        )

    def save_vro_log(self, path: str):
        write_vro_log(path, self.vro_log())
