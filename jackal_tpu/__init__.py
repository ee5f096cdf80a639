"""jackal_tpu: TPU-native stereo-vision obstacle-avoidance framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
jackal-navigation reference stack (stereo rectification, ELAS dense stereo,
BM/SGM engines, 3D reprojection, obstacle laser scan, safe-navigation
control), designed TPU-first: batched fixed-shape tensor pipelines, Pallas
kernels for the matching hot loops, and jax.sharding for multi-chip scale-out.
"""

__version__ = "0.1.0"

from .calib import StereoCalibration, load_calibration  # noqa: F401
from .config import (  # noqa: F401
    BMParams,
    ElasParams,
    ExtrinsicCalibParams,
    GroundPlaneParams,
    NavParams,
    PipelineParams,
    ScanParams,
    SGMParams,
)
