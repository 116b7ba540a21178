from .variables import VariableArena, TangentLayout, layout_of, retract_all
from .factors import FactorGraph, total_error, linearize_blocks, empty_graph
from .builder import GraphBuilder, round_up
from .banded import band_halfwidth, banded_gn_optimize
from .batch import (gn_optimize_many, sharded_gn_many, solve_many,
                    stack_pytrees, unstack_pytree)
from .gnc import GncResult, gnc_optimize
from .init import chordal_initialize, project_so3
from .pcm import (PcmResult, max_clique, odometry_consistency,
                  pairwise_consistency, pcm_mask)
from .sparsify import chow_liu_tree, marginalize_poses
from .lm import LMParams, LMResult, lm_optimize, lm_optimize_g2o, gn_optimize
from .marginals import (joint_marginal, plane_marginal, pose_marginal,
                        pose_marginals_all)
from .online import IncrementalOptimizer, OnlineGraph

__all__ = [
    "VariableArena", "TangentLayout", "layout_of", "retract_all",
    "FactorGraph", "total_error", "linearize_blocks", "empty_graph",
    "GraphBuilder", "round_up",
    "LMParams", "LMResult", "lm_optimize", "lm_optimize_g2o", "gn_optimize",
    "gn_optimize_many", "solve_many", "sharded_gn_many",
    "stack_pytrees", "unstack_pytree",
    "band_halfwidth", "banded_gn_optimize",
    "chordal_initialize", "project_so3",
    "GncResult", "gnc_optimize",
    "PcmResult", "pcm_mask", "pairwise_consistency",
    "odometry_consistency", "max_clique",
    "marginalize_poses", "chow_liu_tree",
    "IncrementalOptimizer", "OnlineGraph",
    "pose_marginal", "plane_marginal", "joint_marginal",
    "pose_marginals_all",
]
