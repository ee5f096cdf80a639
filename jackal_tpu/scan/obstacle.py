"""Obstacle laser-scan generation and point-cloud export (TPU path).

TPU-native equivalents of point_cloud.cpp:

  - ``obstacle_scan_from_disparity``  == publishObstacleScan(Mat&, seq)
    (point_cloud.cpp:213-296): per pixel validity-range check, Q
    reprojection, camera->robot transform, polar binning, per-bin min range.
    The per-pixel double loop becomes a fused masked reduction
    (scatter-min over 90 bins).

  - ``point_cloud_from_disparity``    == publishPointCloud (298-404):
    full cloud with packed-RGB channel and scan-time ground rejection
    (publishObstacleScan(vector<Point3d>), 149-211).

Scan conventions preserved from the reference:
  - bin k = floor(bin_size * (fov/2 - theta_deg) / fov), theta_deg uses
    pi = 3.1415 (point_cloud.cpp:256,264);
  - LaserScan.ranges is emitted from bin 89 down to 0, skipping empty bins
    (278-282), so angular indexing on the consumer side is approximate;
  - angle_min/max and range_min/max are the actual extrema over accepted
    points (pre-binning).

Deviation (documented): the reference writes scan[k] for k==90 when
theta == -fov/2 exactly (a C++ buffer overrun, point_cloud.cpp:264-267);
we drop bins outside [0, bin_size).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GroundPlaneParams, ScanParams, REF_PI
from ..geometry.reproject import reproject_disparity_to_robot

INF = 1e9  # const int INF = 1e9 (point_cloud.cpp:55)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ScanResult:
    """Device-side LaserScan payload (fixed shape; host formats the message)."""

    scan: jnp.ndarray        # [..., bin_size] min range per bin, INF if empty
    angle_min: jnp.ndarray   # [...] radians (actual extrema, 400/-400 if none)
    angle_max: jnp.ndarray
    range_min: jnp.ndarray
    range_max: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.scan, self.angle_min, self.angle_max, self.range_min,
             self.range_max),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _bin_and_reduce(
    Xr: jnp.ndarray, Yr: jnp.ndarray, accept: jnp.ndarray, sp: ScanParams
) -> ScanResult:
    """Shared polar binning + per-bin min reduction over accepted points."""
    theta = jnp.arctan2(Yr, Xr)
    theta_deg = theta * (180.0 / REF_PI)
    r = jnp.sqrt(Xr * Xr + Yr * Yr)
    k = jnp.floor(sp.bin_size * (sp.fov_deg / 2.0 - theta_deg) / sp.fov_deg)
    k = k.astype(jnp.int32)
    in_range = (k >= 0) & (k < sp.bin_size)
    use = accept & in_range

    # per-bin masked minima (unrolled) instead of a scatter-min: scatters
    # serialize on TPU; 90 fused masked reductions stay on the VPU
    r_masked = jnp.where(use, r, INF)
    big = jnp.asarray(INF, r.dtype)
    scan = jnp.stack([
        jnp.min(jnp.where(k == kb, r_masked, big))
        for kb in range(sp.bin_size)
    ])

    big = jnp.asarray(INF, theta.dtype)
    angle_min = jnp.min(jnp.where(accept, theta, 400.0))
    angle_max = jnp.max(jnp.where(accept, theta, -400.0))
    range_min = jnp.min(jnp.where(accept, r, big))
    range_max = jnp.max(jnp.where(accept, r, -500.0))
    return ScanResult(scan, angle_min, angle_max, range_min, range_max)


def _ground_mask_jnp(Xr, Zr, gp: GroundPlaneParams):
    thresh = jnp.where(
        Xr < gp.dist_thresh,
        gp.height_thresh,
        gp.height_thresh + jnp.tan(gp.angle_thresh) * (Xr - gp.dist_thresh),
    )
    return Zr < thresh


@partial(jax.jit, static_argnames=("sp", "crop_offset_x", "crop_offset_y"))
def obstacle_scan_from_disparity(
    dmap_u8: jnp.ndarray,
    valid_disp: jnp.ndarray,
    Q: jnp.ndarray,
    XR: jnp.ndarray,
    XT: jnp.ndarray,
    sp: ScanParams = ScanParams(),
    crop_offset_x: int = 0,
    crop_offset_y: int = 0,
) -> ScanResult:
    """Scan directly from a uint8 disparity map using the valid-range cache.

    dmap_u8: [H, W] uint8; valid_disp: [H, W, 2] uint8 (dmin, dmax).
    Mirrors publishObstacleScan(Mat&, seq): accept iff
    valid_disp[..,0] <= d <= valid_disp[..,1]; no ground-plane re-check.
    """
    d = dmap_u8.astype(jnp.int32)
    accept = (d >= valid_disp[..., 0].astype(jnp.int32)) & (
        d <= valid_disp[..., 1].astype(jnp.int32)
    )
    Xr, Yr, _ = reproject_disparity_to_robot(
        dmap_u8.astype(jnp.float32), Q, XR, XT, crop_offset_x, crop_offset_y
    )
    return _bin_and_reduce(Xr, Yr, accept, sp)


@partial(jax.jit, static_argnames=("sp", "gp"))
def obstacle_scan_from_points(
    pts_robot: jnp.ndarray,
    point_valid: jnp.ndarray,
    sp: ScanParams = ScanParams(),
    gp: GroundPlaneParams = GroundPlaneParams(),
) -> ScanResult:
    """Scan from a robot-frame point set with scan-time ground rejection.

    Mirrors publishObstacleScan(vector<Point3d>, seq) (point_cloud.cpp:149-211).
    pts_robot: [N, 3]; point_valid: [N] bool (fixed-shape mask standing in for
    the reference's variable-length vector).
    """
    Xr, Yr, Zr = pts_robot[..., 0], pts_robot[..., 1], pts_robot[..., 2]
    accept = point_valid & ~_ground_mask_jnp(Xr, Zr, gp)
    return _bin_and_reduce(Xr, Yr, accept, sp)


@partial(jax.jit, static_argnames=("sp", "crop_offset_x", "crop_offset_y"))
def point_cloud_from_disparity(
    dmap_u8: jnp.ndarray,
    color_bgr: Optional[jnp.ndarray],
    Q: jnp.ndarray,
    XR: jnp.ndarray,
    XT: jnp.ndarray,
    sp: ScanParams = ScanParams(),
    crop_offset_x: int = 0,
    crop_offset_y: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full point cloud (gen_pcl path, point_cloud.cpp:312-386).

    Returns (points [H*W, 3] robot frame, rgb_packed [H*W] float32 bit-cast
    of (r<<16|g<<8|b), valid [H*W] bool where d >= 2). Fixed shape; the host
    compacts to the published variable-length cloud.

    color_bgr: [H, W, 3] uint8 (OpenCV channel order, like leftim_res) or
    None for zero colors.
    """
    d = dmap_u8.astype(jnp.int32)
    valid = d >= sp.min_pcl_disp
    Xr, Yr, Zr = reproject_disparity_to_robot(
        dmap_u8.astype(jnp.float32), Q, XR, XT, crop_offset_x, crop_offset_y
    )
    pts = jnp.stack([Xr, Yr, Zr], axis=-1).reshape(-1, 3)
    if color_bgr is None:
        rgb = jnp.zeros(d.shape, dtype=jnp.int32)
    else:
        b = color_bgr[..., 0].astype(jnp.int32)
        g = color_bgr[..., 1].astype(jnp.int32)
        r = color_bgr[..., 2].astype(jnp.int32)
        # final override in the reference uses the raw image color for every
        # point (point_cloud.cpp:379-382 shadows the ground-color branch)
        rgb = (r << 16) | (g << 8) | b
    rgb_f = jax.lax.bitcast_convert_type(rgb, jnp.float32).reshape(-1)
    return pts, rgb_f, valid.reshape(-1)


def format_laser_scan_ranges(scan: np.ndarray) -> np.ndarray:
    """Compact bins to the published LaserScan.ranges array.

    Reference order: bin 89 down to 0, skipping bins still at INF
    (point_cloud.cpp:278-282).
    """
    scan = np.asarray(scan)
    out = [scan[i] for i in range(len(scan) - 1, -1, -1) if scan[i] < INF - 1]
    return np.asarray(out, dtype=np.float64)


def compact_cloud_msg(header, cloud) -> "object":
    """Compact a fixed-shape device cloud into the published PointCloud.

    The reference pushes one geometry_msgs::Point32 per pixel with
    d >= 2 plus a packed-RGB float channel named "rgb"
    (point_cloud.cpp:312-386, publish at 388). Here points/rgb ride as
    numpy arrays (the bus is in-process/pickled, not ROS-serialized):
    points [N, 3] float32 robot-frame, channel values [N] float32 whose
    BITS are (r<<16 | g<<8 | b).
    """
    from ..io_bus.messages import ChannelFloat32, PointCloud

    pts, rgb_f, valid = cloud
    v = np.asarray(valid)
    pts_c = np.asarray(pts).reshape(-1, 3)[v]
    rgb_c = np.asarray(rgb_f).reshape(-1)[v]
    return PointCloud(header, pts_c.astype(np.float32),
                      [ChannelFloat32("rgb", rgb_c.astype(np.float32))])
