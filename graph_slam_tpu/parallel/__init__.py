from .sharding import (
    make_mesh,
    pad_graph_for_mesh,
    shard_graph,
    sharded_ba_sqrt,
    sharded_gn,
    sharded_gn_pcg_step,
    sharded_gn_step,
)

__all__ = ["make_mesh", "pad_graph_for_mesh", "shard_graph",
           "sharded_ba_sqrt", "sharded_gn", "sharded_gn_pcg_step",
           "sharded_gn_step"]
