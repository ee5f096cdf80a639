"""Disparity -> 3D reprojection and camera->robot transforms.

TPU-native equivalents of the per-pixel Q-matrix math in
point_cloud.cpp:104-147 (cacheDisparityValues), 213-296 (scan direct from
disparity) and 298-404 (full point cloud): the triple loop with a 4x4
double matmul per pixel becomes one broadcast einsum.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def compose_rotation_cam_to_robot(x: float, y: float, z: float) -> np.ndarray:
    """Euler XYZ -> rotation, Z*Y*X composition (point_cloud.cpp:77-98).

    Used by the live-extrinsic-calibration mode (-m) with the
    dynamic_reconfigure sliders PHI_X/Y/Z.
    """
    # The reference constructs each elementary matrix from float-cast angles.
    x, y, z = np.float32(x), np.float32(y), np.float32(z)
    cx, sx = math.cos(x), math.sin(x)
    cy, sy = math.cos(y), math.sin(y)
    cz, sz = math.cos(z), math.sin(z)
    X = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=np.float64)
    Y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=np.float64)
    Z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=np.float64)
    return Z @ Y @ X


def compose_translation_cam_to_robot(x: float, y: float, z: float) -> np.ndarray:
    """point_cloud.cpp:100-102."""
    return np.array(
        [np.float32(x), np.float32(y), np.float32(z)], dtype=np.float64
    )


def reproject_Q(
    u: jnp.ndarray, v: jnp.ndarray, d: jnp.ndarray, Q: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(X,Y,Z) = dehomogenized Q @ [u,v,d,1] (point_cloud.cpp:237-244).

    u,v,d broadcastable arrays; Q [4,4]. Computed in the arrays' dtype.
    """
    w = Q[3, 0] * u + Q[3, 1] * v + Q[3, 2] * d + Q[3, 3]
    X = (Q[0, 0] * u + Q[0, 1] * v + Q[0, 2] * d + Q[0, 3]) / w
    Y = (Q[1, 0] * u + Q[1, 1] * v + Q[1, 2] * d + Q[1, 3]) / w
    Z = (Q[2, 0] * u + Q[2, 1] * v + Q[2, 2] * d + Q[2, 3]) / w
    return X, Y, Z


def cam_to_robot(
    X: jnp.ndarray, Y: jnp.ndarray, Z: jnp.ndarray,
    XR: jnp.ndarray, XT: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """point3d_robot = XR @ point3d_cam + XT (point_cloud.cpp:123,250)."""
    Xr = XR[0, 0] * X + XR[0, 1] * Y + XR[0, 2] * Z + XT[0]
    Yr = XR[1, 0] * X + XR[1, 1] * Y + XR[1, 2] * Z + XT[1]
    Zr = XR[2, 0] * X + XR[2, 1] * Y + XR[2, 2] * Z + XT[2]
    return Xr, Yr, Zr


def robot_to_cam_pixel(
    pts_robot: np.ndarray, XR: np.ndarray, XT: np.ndarray, P: np.ndarray
) -> np.ndarray:
    """Forward projection robot->camera->pixel (confidence_checks.cpp:122-132).

    pts_robot: [..., 3]. Returns integer pixel coords [..., 2] (truncated like
    the reference's int cast).
    """
    XR = np.asarray(XR, np.float64)
    XT = np.asarray(XT, np.float64).reshape(3)
    P = np.asarray(P, np.float64)
    cam = (np.asarray(pts_robot, np.float64) - XT) @ np.linalg.inv(XR).T
    hom = np.concatenate([cam, np.ones_like(cam[..., :1])], axis=-1)
    img = hom @ P.T
    return (img[..., :2] / img[..., 2:3]).astype(np.int64)


def reproject_disparity_to_robot(
    disp: jnp.ndarray, Q: jnp.ndarray, XR: jnp.ndarray, XT: jnp.ndarray,
    crop_offset_x: int = 0, crop_offset_y: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense robot-frame coordinates for every pixel of a disparity map.

    disp: [..., H, W] (float or int). Returns (X, Y, Z) each [..., H, W] in
    the robot frame. Pixel coordinates are offset by the crop origin exactly
    like point_cloud.cpp:237-239.
    """
    H, W = disp.shape[-2], disp.shape[-1]
    dt = disp.dtype if jnp.issubdtype(disp.dtype, jnp.floating) else jnp.float32
    u = (jnp.arange(W, dtype=dt) + crop_offset_x)[None, :]
    v = (jnp.arange(H, dtype=dt) + crop_offset_y)[:, None]
    d = disp.astype(dt)
    X, Y, Z = reproject_Q(u, v, d, Q.astype(dt))
    return cam_to_robot(X, Y, Z, XR.astype(dt), XT.astype(dt))
