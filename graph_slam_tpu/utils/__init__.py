from .chi2 import chi2_quantile
from .colors import COLORS, color
from .metrics import align_umeyama, ate_rmse, rpe
from .profiling import Chi2Log, PhaseTimer, trace_context

__all__ = ["chi2_quantile", "COLORS", "color", "align_umeyama", "ate_rmse",
           "rpe", "Chi2Log", "PhaseTimer", "trace_context"]
