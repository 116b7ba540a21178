from .preintegration import (
    ImuParams,
    PreintState,
    corrected_deltas,
    init_preint,
    integrate_segment,
    predict_navstate,
)
from .presets import MEMS_DT, VN100_DT, mems_params, vn100_params
from .streams import (
    ImuStream,
    find_index_at,
    gravity_aligning_rotation,
    mems_frame_times,
    read_mems_log,
    read_vn100_log,
    static_bias_estimate,
)

__all__ = [
    "ImuParams", "PreintState", "init_preint", "integrate_segment",
    "predict_navstate", "corrected_deltas",
    "vn100_params", "mems_params", "VN100_DT", "MEMS_DT",
    "ImuStream", "read_vn100_log", "read_mems_log", "find_index_at",
    "mems_frame_times",
    "static_bias_estimate", "gravity_aligning_rotation",
]
