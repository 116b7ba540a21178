from .chi2 import chi2_quantile
from .colors import COLORS, color

__all__ = ["chi2_quantile", "COLORS", "color"]
