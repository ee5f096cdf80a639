"""ELAS end-to-end matching pipeline (Elas::process equivalent).

Mirrors elas.cpp:32-151 stage for stage, with the TPU-idiomatic split:
descriptors, support cost volumes, dense matching and all postprocessing run
on device as fixed-shape batched ops; support pruning, Delaunay
triangulation, plane fitting and rasterization run on host (tiny irregular
work, see prior.py). Every device stage is verified bit-identical to an
instrumented reference build; the one source of divergence is Qhull-vs-
Shewchuk Delaunay diagonal choices on co-circular support quads.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import ElasParams
from ...ops.descriptor import create_descriptor
from .support import support_candidates, collect_support_points
from .prior import build_priors
from .dense import dense_match
from .post import (
    adaptive_mean,
    gap_interpolation,
    left_right_consistency_check,
    median_filter,
    remove_small_segments,
)


@dataclasses.dataclass
class ElasDebug:
    support: np.ndarray
    dense_D1: np.ndarray
    dense_D2: np.ndarray


def elas_match(
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    params: ElasParams = ElasParams(),
    tri_left: Optional[np.ndarray] = None,
    tri_right: Optional[np.ndarray] = None,
    return_debug: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense stereo: two uint8 [H, W] images -> two float32 disparity maps.

    Invalid pixels are negative (-1 / -10), matching libelas encodings.
    tri_left/tri_right override the Delaunay triangulation (tests).
    """
    if params.subsampling:
        raise NotImplementedError("subsampling=True not supported yet")
    if left_u8.shape != right_u8.shape:
        raise ValueError(
            f"left/right shape mismatch: {left_u8.shape} vs {right_u8.shape}")
    H, W = left_u8.shape
    left = jnp.asarray(left_u8)
    right = jnp.asarray(right_u8)

    desc1 = create_descriptor(left)
    desc2 = create_descriptor(right)

    dcan = np.asarray(support_candidates(desc1, desc2, params))
    support = collect_support_points(dcan, params, W, H)
    if len(support) < 3:
        bad = np.full((H, W), -10.0, np.float32)
        return bad, bad.copy()

    maps1, maps2, grid1, grid2 = build_priors(
        support, W, H, params, tri_left=tri_left, tri_right=tri_right)

    D1 = dense_match(
        desc1, desc2, jnp.asarray(maps1.plane_a), jnp.asarray(maps1.plane_b),
        jnp.asarray(maps1.plane_c), jnp.asarray(maps1.valid),
        jnp.asarray(maps1.tri_id >= 0), jnp.asarray(grid1), params, False)
    D2 = dense_match(
        desc1, desc2, jnp.asarray(maps2.plane_a), jnp.asarray(maps2.plane_b),
        jnp.asarray(maps2.plane_c), jnp.asarray(maps2.valid),
        jnp.asarray(maps2.tri_id >= 0), jnp.asarray(grid2), params, True)

    if return_debug:
        dbg = ElasDebug(support, np.asarray(D1), np.asarray(D2))

    D1, D2 = left_right_consistency_check(D1, D2, params)

    D1 = remove_small_segments(D1, params)
    if not params.postprocess_only_left:
        D2 = remove_small_segments(D2, params)

    D1 = gap_interpolation(D1, params)
    if not params.postprocess_only_left:
        D2 = gap_interpolation(D2, params)

    if params.filter_adaptive_mean:
        D1 = adaptive_mean(D1)
        if not params.postprocess_only_left:
            D2 = adaptive_mean(D2)

    if params.filter_median:
        D1 = median_filter(D1)
        if not params.postprocess_only_left:
            D2 = median_filter(D2)

    if return_debug:
        return np.asarray(D1), np.asarray(D2), dbg
    return np.asarray(D1), np.asarray(D2)
