from .posegraph import (
    PoseGraphResult,
    build_pose_graph,
    run_pose_graph,
    trajectory_arrays,
)

__all__ = ["PoseGraphResult", "build_pose_graph", "run_pose_graph",
           "trajectory_arrays"]
