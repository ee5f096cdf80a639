"""Valid-disparity cache (vectorized cacheDisparityValues).

The reference's O(W*H*253) triple loop with a 4x4 double matmul per step
(point_cloud.cpp:104-147) becomes one broadcast over d=3..255 plus a
first-True argmax. Runs once at startup, on the host in float64 so the
ground-plane threshold comparisons match the reference bit-for-bit.
"""
from __future__ import annotations

import math
import numpy as np

from ..config import GroundPlaneParams, ScanParams


def ground_plane_mask(
    X: np.ndarray, Z: np.ndarray, gp: GroundPlaneParams
) -> np.ndarray:
    """True where a robot-frame point is ON/BELOW the ground-plane model
    (i.e. rejected as ground). point_cloud.cpp:133-139,166-172.

    The threshold height rises at GP_ANGLE_THRESH past GP_DIST_THRESH.
    """
    thresh = np.where(
        X < gp.dist_thresh,
        gp.height_thresh,
        gp.height_thresh + math.tan(gp.angle_thresh) * (X - gp.dist_thresh),
    )
    return Z < thresh


def cache_disparity_values(
    Q: np.ndarray,
    XR: np.ndarray,
    XT: np.ndarray,
    crop_im_width: int,
    crop_im_height: int,
    crop_offset_x: int = 0,
    crop_offset_y: int = 0,
    gp: GroundPlaneParams = GroundPlaneParams(),
    scan: ScanParams = ScanParams(),
) -> np.ndarray:
    """Per-pixel [dmin, dmax] valid disparity range, uint8 [H, W, 2].

    dmin = smallest d in [3,255] whose robot-frame point has Z >= 0 and
    clears the ground plane; dmax = 255. If no d qualifies the loop in the
    reference leaves d = 256 which is stored into a uint8 as 0
    (point_cloud.cpp:142, Vec2b overflow) -- making every disparity "valid"
    for that pixel. We reproduce that wraparound exactly.
    """
    H, W = crop_im_height, crop_im_width
    ds = np.arange(scan.cache_disp_lo, scan.cache_disp_hi + 1, dtype=np.float64)
    u = (np.arange(W, dtype=np.float64) + crop_offset_x)[None, :, None]
    v = (np.arange(H, dtype=np.float64) + crop_offset_y)[:, None, None]
    d = ds[None, None, :]
    Q = np.asarray(Q, np.float64)
    w = Q[3, 0] * u + Q[3, 1] * v + Q[3, 2] * d + Q[3, 3]
    Xc = (Q[0, 0] * u + Q[0, 1] * v + Q[0, 2] * d + Q[0, 3]) / w
    Yc = (Q[1, 0] * u + Q[1, 1] * v + Q[1, 2] * d + Q[1, 3]) / w
    Zc = (Q[2, 0] * u + Q[2, 1] * v + Q[2, 2] * d + Q[2, 3]) / w
    XR = np.asarray(XR, np.float64)
    XT = np.asarray(XT, np.float64).reshape(3)
    Xr = XR[0, 0] * Xc + XR[0, 1] * Yc + XR[0, 2] * Zc + XT[0]
    Zr = XR[2, 0] * Xc + XR[2, 1] * Yc + XR[2, 2] * Zc + XT[2]

    ok = (Zr >= 0.0) & ~ground_plane_mask(Xr, Zr, gp)  # [H, W, D]
    any_ok = ok.any(axis=-1)
    first = ok.argmax(axis=-1) + scan.cache_disp_lo
    # no valid d -> d ends at 256 -> uint8 wraparound to 0
    dmin = np.where(any_ok, first, 256).astype(np.int32).astype(np.uint8)
    dmax = np.full((H, W), 255, dtype=np.uint8)
    return np.stack([dmin, dmax], axis=-1)
