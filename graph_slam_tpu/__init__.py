"""graph_slam_tpu — a TPU-native factor-graph SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``rising-turtle/graph_slam`` (GTSAM/g2o RGB-D + IMU graph SLAM backend):

- SE(3)/SO(3) Lie cores with GTSAM-compatible conventions (``core``)
- struct-of-arrays factor arenas with static padded shapes (``graph``)
- batch LM / GN and incremental optimization under ``jit`` (``graph.lm``)
- Forster-style IMU preintegration as ``lax.scan`` (``imu``)
- OrientedPlane3 landmarks, association and propagation (``planes``)
- projection-factor bundle adjustment with Schur elimination (``vision``)
- VRO-log / trajectory / PLY / g2o IO matching the reference formats (``io``)
- offline pipeline drivers mirroring the reference mains (``pipelines``)
- point-cloud mapping tools (``mapping``)
- multi-device sharding for large graphs (``parallel``)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls default to bfloat16 multiplicands under f32, which is fine
# for neural nets but poisons an estimator: whitened residual/Jacobian
# products lose ~5 decimal digits and the 27k-frame VIO replay measurably
# diverges to NaN. This is a state-estimation framework — numerics are the
# product — so full-precision accumulation is the package default. The
# MXU still executes these as (slower) multi-pass f32 matmuls. An
# explicit user choice wins: we only set the default when the application
# has not already configured it (opt out per-process with
# GRAPH_SLAM_TPU_MATMUL_PRECISION=default|high|highest).
if _jax.config.jax_default_matmul_precision is None:
    _prec = _os.environ.get("GRAPH_SLAM_TPU_MATMUL_PRECISION", "highest")
    if _prec != "default":
        _jax.config.update("jax_default_matmul_precision", _prec)

from . import core
from .core import se3, so3, Pose

__all__ = ["core", "se3", "so3", "Pose", "__version__"]
