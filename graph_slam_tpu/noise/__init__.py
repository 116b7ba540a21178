from .models import (
    ROBUST_HUBER,
    ROBUST_NONE,
    huber_weight,
    isotropic_sqrt_info,
    sqrt_info_from_covariance,
    sqrt_info_from_information,
    sqrt_info_from_sigmas,
)

__all__ = [
    "ROBUST_HUBER", "ROBUST_NONE", "huber_weight", "isotropic_sqrt_info",
    "sqrt_info_from_covariance", "sqrt_info_from_information",
    "sqrt_info_from_sigmas",
]
