from .vro_log import VROLog, read_vro_log, write_vro_log, FAILED_INFO_SENTINEL
from .frames import FrameStore, load_frame, save_frame
from .rgbd_png import PngFrameStore, open_frame_source
from .sr4000 import convert_bdat_dir, read_bdat
from .tum import (TumDataset, associate_timestamps, groundtruth_at,
                  read_tum_groundtruth)
from .trajectory import (
    Trajectory,
    read_g2o,
    read_trajectory,
    write_g2o,
    write_ply_points,
    write_trajectory,
    write_trajectory_ply,
    write_graph_summary,
    write_marginals,
    read_marginals,
)

__all__ = [
    "VROLog", "read_vro_log", "write_vro_log", "FAILED_INFO_SENTINEL",
    "FrameStore", "load_frame", "save_frame",
    "read_bdat", "convert_bdat_dir", "PngFrameStore", "open_frame_source",
    "TumDataset", "associate_timestamps", "groundtruth_at",
    "read_tum_groundtruth",
    "Trajectory", "read_trajectory", "write_trajectory", "write_ply_points",
    "write_trajectory_ply", "write_g2o", "read_g2o", "write_graph_summary",
    "write_marginals", "read_marginals",
]
