from . import so3, se3
from .se3 import Pose

__all__ = ["so3", "se3", "Pose"]
