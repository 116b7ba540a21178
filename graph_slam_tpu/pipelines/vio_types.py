"""VIO pipeline configuration and result records.

Shared by the per-frame online engine (``pipelines.vio``) and the
whole-replay scan engine (``pipelines.vio_scan``); split out so the two
engines and the plane stack (``pipelines.vio_planes``) form an import DAG.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..planes import PlaneLandmarkBook

__all__ = ["VioConfig", "VioResult"]


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
    # (the round-1 host-rebuild engine was retired in round 4; the
    # independent NumPy optimizer, tests/np_optimizer.py, is the oracle)
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

