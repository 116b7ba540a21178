"""The whole-replay-on-device VIO engine (``engine="scan"``).

The sequential replay compiled into chunked ``lax.scan`` programs, with
plane rescue as host steps at the log's sentinel failures (the fused
flagship path; see ``_run_vio_scan``). Split out of ``pipelines/vio.py``
(round-3 verdict ask #7).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamParams
from ..core import se3
from ..graph import LMParams, lm_optimize, total_error
from ..graph.builder import _sqrt_info, round_up
from ..graph.factors import empty_graph
from ..graph.online import OnlineGraph
from ..graph.variables import empty_arena
from ..imu import ImuParams, ImuStream, find_index_at
from ..io.vro_log import FAILED_INFO_SENTINEL, VROLog
from .vio_kernel import (
    _conjugate_edges_batch,
    _expmap_batch,
    _fused_vio_step,
    _pad_window,
    _static_init,
    _vio_frame_kernel,
)
from .vio_planes import _PlaneStack, _ScanPlaneWriter, _start_host_copies
from .vio_types import VioConfig, VioResult

__all__ = ["_run_vio_scan", "_replay_scan"]


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
    # +1 reserved dummy slot, then rounded to a bucket of 8: the compiled
    # replay program is keyed on these table shapes, so exact caps force a
    # fresh multi-second XLA compile for every slightly-different log
    # length; padded rows are never written and stay inactive
    imu_cap = round_up(n_imu_rows + 1, 8)
    between_cap = round_up(len(rows) + 1, 8)
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

