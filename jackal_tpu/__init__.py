"""jackal_tpu: TPU-native stereo-vision obstacle-avoidance framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
jackal-navigation reference stack (stereo rectification, ELAS dense stereo,
BM/SGM engines, 3D reprojection, obstacle laser scan, safe-navigation
control), designed TPU-first: batched fixed-shape tensor pipelines, Pallas
kernels for the matching hot loops, and jax.sharding for multi-chip scale-out.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the unrolled Pallas matchers compile in
# minutes per (shape, side); cache them across processes.
_cache_dir = _os.environ.get(
    "JACKAL_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # older jax without the knobs
    pass

# Platform pin for subprocesses: some environments (this machine's axon
# sitecustomize) force-register a TPU platform and clobber JAX_PLATFORMS,
# so an env var honored at import time is the only reliable way to run the
# CLIs on CPU from a parent process.
_plat = _os.environ.get("JACKAL_TPU_PLATFORM")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

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
