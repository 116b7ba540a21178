from .chi2 import chi2_quantile
from .colors import COLORS, color
from .metrics import align_umeyama, ate_rmse, rpe

__all__ = ["chi2_quantile", "COLORS", "color", "align_umeyama", "ate_rmse",
           "rpe"]
