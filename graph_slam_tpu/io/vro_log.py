"""VRO results log IO — the reference's canonical frontend record.

Format (one edge per line, whitespace separated), produced by
``CGraphGT::recordVROResult`` and consumed by ``readVRORecord``
(``/root/reference/gtsam/gtsam_graph.cpp:1505-1590``):

    id_to id_from xi0..xi5 info(0,0) info(0,1) ... info(5,5)

- ``xi`` is ``Pose3::ChartAtOrigin::Local`` of the relative camera-frame
  transform: SE(3) log with rotation-first ordering (our ``se3.logmap``).
- the information matrix is stored as its 21 upper-triangular entries,
  row-major.
- a *failed* match is encoded with ``info(0,0) == 10000`` (identity-ish
  sentinel edge; offline replays skip it and fall back to IMU/planes,
  ``gtsam_graph.cpp:1600`` and ``test_vro_imu_graph.cpp:198-205``).

This file is both a checkpoint of the frontend and the deterministic replay
fixture for every offline pipeline, so the reader/writer round-trips floats
with ``repr`` precision.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["VROLog", "read_vro_log", "write_vro_log", "FAILED_INFO_SENTINEL"]

FAILED_INFO_SENTINEL = 10000.0

_TRIU = np.triu_indices(6)


@dataclasses.dataclass
class VROLog:
    """Columnar edge records: ``id_to`` observed-at frame, ``id_from`` base."""

    id_to: np.ndarray    # (E,) int
    id_from: np.ndarray  # (E,) int
    xi: np.ndarray       # (E, 6) se3 log of relative pose (camera frame)
    info: np.ndarray     # (E, 6, 6) symmetric information

    def __len__(self) -> int:
        return len(self.id_to)

    @property
    def valid(self) -> np.ndarray:
        """Mask of successful matches (sentinel check, gtsam_graph.cpp:1600)."""
        return self.info[:, 0, 0] != FAILED_INFO_SENTINEL

    def sorted_by_target(self) -> "VROLog":
        order = np.argsort(self.id_to, kind="stable")
        return VROLog(self.id_to[order], self.id_from[order],
                      self.xi[order], self.info[order])


def read_vro_log(path: str) -> VROLog:
    # fast path: native strtod parser (graph_slam_tpu.native)
    try:
        from .. import native

        rows = native.parse_vro_log(path)
    except Exception:
        rows = None
    if rows is not None:
        n = len(rows)
        info = np.zeros((n, 6, 6))
        info[:, _TRIU[0], _TRIU[1]] = rows[:, 8:29]
        info = info + np.swapaxes(info, 1, 2)
        diag = np.arange(6)
        info[:, diag, diag] *= 0.5
        return VROLog(rows[:, 0].astype(int), rows[:, 1].astype(int),
                      rows[:, 2:8].copy(), info)

    ids_to, ids_from, xis, infos = [], [], [], []
    with open(path) as f:
        tokens = f.read().split()
    # 2 ids + 6 pose + 21 info = 29 tokens per record
    nrec = len(tokens) // 29
    for k in range(nrec):
        chunk = tokens[29 * k : 29 * (k + 1)]
        ids_to.append(int(float(chunk[0])))
        ids_from.append(int(float(chunk[1])))
        xis.append([float(x) for x in chunk[2:8]])
        vals = np.array([float(x) for x in chunk[8:29]])
        info = np.zeros((6, 6))
        info[_TRIU] = vals
        info = info + info.T - np.diag(np.diag(info))
        infos.append(info)
    if not nrec:
        return VROLog(np.zeros(0, int), np.zeros(0, int),
                      np.zeros((0, 6)), np.zeros((0, 6, 6)))
    return VROLog(
        np.asarray(ids_to), np.asarray(ids_from),
        np.asarray(xis), np.asarray(infos),
    )


def write_vro_log(path: str, log: VROLog) -> None:
    with open(path, "w") as f:
        for k in range(len(log)):
            parts = [str(log.id_to[k]), str(log.id_from[k])]
            parts += [repr(float(v)) for v in log.xi[k]]
            parts += [repr(float(v)) for v in log.info[k][_TRIU]]
            f.write(" ".join(parts) + " \n")


def failed_edge(id_to: int, id_from: int) -> tuple:
    """An identity edge row with the failure sentinel information."""
    info = np.eye(6) * FAILED_INFO_SENTINEL
    return id_to, id_from, np.zeros(6), info
