"""Fused perception pipeline: rect -> disparity -> cloud -> scan.

The TPU-native equivalent of the point_cloud node's per-frame path
(point_cloud.cpp:431-471 + 298-404): one startup precompute (rectification
maps, valid-disparity cache — point_cloud.cpp:543-558) and a per-frame
fused function. With the BM/SGM engines the whole frame step is a single
jit; with ELAS it is two jitted device segments around the tiny host prior
stage (see matching/elas/pipeline.py).

Per-stage wall-clock logging mirrors the -l/-d/-p/-s hooks
(point_cloud.cpp:446-462) and writes plot-script-compatible time files.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..calib import StereoCalibration
from ..config import (
    BMParams,
    ElasParams,
    GroundPlaneParams,
    PipelineParams,
    ScanParams,
    SGMParams,
)
from ..geometry.rectify import init_undistort_rectify_map, stereo_rectify
from ..geometry.remap import remap_bilinear, remap_bilinear_batch
from ..matching.bm import bm_match
from ..matching.sgm import sgm_match
from ..matching.elas.pipeline import elas_match
from ..scan.obstacle import (
    ScanResult,
    obstacle_scan_from_disparity,
    point_cloud_from_disparity,
)
from ..scan.valid_disp import cache_disparity_values


@dataclasses.dataclass
class FrameResult:
    dmap: np.ndarray                 # [H, W] uint8 disparity (mono8 topic)
    scan: ScanResult                 # obstacle scan payload
    cloud: Optional[Tuple] = None    # (points, rgb, valid) if gen_pcl
    dmap_time: float = 0.0
    pcl_time: float = 0.0
    scan_time: float = 0.0


class StereoPipeline:
    """Host-side orchestrator owning calibration-derived device constants."""

    def __init__(
        self,
        calib: StereoCalibration,
        params: PipelineParams = PipelineParams(),
        engine: str = "elas",
        elas_params: ElasParams = ElasParams(),
        bm_params: BMParams = BMParams(),
        sgm_params: SGMParams = SGMParams(),
        gp_params: GroundPlaneParams = GroundPlaneParams(),
        scan_params: ScanParams = ScanParams(),
    ):
        if engine not in ("elas", "bm", "sgm"):
            raise ValueError(f"unknown engine {engine!r}")
        self.calib = calib
        self.p = params
        self.engine = engine
        self.elas_params = elas_params
        self.bm_params = bm_params
        self.sgm_params = sgm_params
        self.gp = gp_params
        self.sp = scan_params
        # Pallas kernels only on real TPU (interpret mode is slow on CPU)
        self.use_pallas = jax.default_backend() == "tpu"

        # startup precompute (point_cloud.cpp:543-558)
        rect = stereo_rectify(
            calib.K1, calib.D1, calib.K2, calib.D2, params.calib_im_size,
            calib.R, calib.T, zero_disparity=True, alpha=0.0,
            new_image_size=(params.im_width, params.im_height))
        self.rect = rect
        lmapx, lmapy = init_undistort_rectify_map(
            calib.K1, calib.D1, rect.R1, rect.P1,
            (params.im_width, params.im_height))
        rmapx, rmapy = init_undistort_rectify_map(
            calib.K2, calib.D2, rect.R2, rect.P2,
            (params.im_width, params.im_height))
        self.lmap = (jnp.asarray(lmapx), jnp.asarray(lmapy))
        self.rmap = (jnp.asarray(rmapx), jnp.asarray(rmapy))
        self.Q32 = jnp.asarray(rect.Q, jnp.float32)
        XR = calib.XR if calib.XR is not None else np.eye(3)
        XT = calib.XT if calib.XT is not None else np.zeros(3)
        self.XR32 = jnp.asarray(XR, jnp.float32)
        self.XT32 = jnp.asarray(XT, jnp.float32)
        if not params.gen_pcl:
            self.valid_disp = jnp.asarray(cache_disparity_values(
                rect.Q, XR, XT, params.crop_im_width, params.crop_im_height,
                params.crop_offset_x, params.crop_offset_y, gp_params,
                scan_params))
        else:
            self.valid_disp = None

    def update_extrinsics(self, phi_xyz, trans_xyz) -> None:
        """Live camera->robot recalibration (dynamic_reconfigure analogue).

        The reference recomposes XR/XT from the PHI_*/TRANS_* sliders every
        frame while -m is set (paramsCallback point_cloud.cpp:492-495,
        applied at 305-311). Recomputes the rotation, translation and the
        valid-disparity cache; jitted stages pick the new device constants
        up on the next call (they are instance attributes, and the methods
        re-trace per `self`; same-shape updates reuse the compiled code via
        donated-constant closure... we simply re-upload the small arrays)."""
        from ..geometry.reproject import (
            compose_rotation_cam_to_robot, compose_translation_cam_to_robot)

        XR = compose_rotation_cam_to_robot(*phi_xyz)
        XT = compose_translation_cam_to_robot(*trans_xyz)
        self.XR32 = jnp.asarray(XR, jnp.float32)
        self.XT32 = jnp.asarray(XT, jnp.float32)
        if not self.p.gen_pcl:
            self.valid_disp = jnp.asarray(cache_disparity_values(
                self.rect.Q, XR, XT, self.p.crop_im_width,
                self.p.crop_im_height, self.p.crop_offset_x,
                self.p.crop_offset_y, self.gp, self.sp))

    # ---- device stages -------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def _rectify_crop(self, left_raw, right_raw):
        p = self.p
        left = remap_bilinear(left_raw, *self.lmap)
        right = remap_bilinear(right_raw, *self.rmap)
        sl = (slice(p.crop_offset_y, p.crop_offset_y + p.crop_im_height),
              slice(p.crop_offset_x, p.crop_offset_x + p.crop_im_width))
        return left[sl], right[sl]

    @partial(jax.jit, static_argnames=("self",))
    def _rectify_crop_color(self, color_raw):
        """Rectify+crop a color frame [H, W, 3] (or batch [B, H, W, 3])
        with the LEFT maps — the cloud's RGB is sampled from leftim_res,
        the rectified cropped left image (point_cloud.cpp:440-442,
        356-383). Channels ride the batch axis of the one-gather remap."""
        p = self.p
        batched = color_raw.ndim == 4
        chans = jnp.moveaxis(color_raw, -1, 0 if not batched else 1)
        flat = chans.reshape((-1,) + color_raw.shape[-3:-1])
        rect = remap_bilinear_batch(flat, *self.lmap)
        sl = (slice(None),
              slice(p.crop_offset_y, p.crop_offset_y + p.crop_im_height),
              slice(p.crop_offset_x, p.crop_offset_x + p.crop_im_width))
        rect = rect[sl]
        if batched:
            rect = rect.reshape(color_raw.shape[0], 3, *rect.shape[1:])
            return jnp.moveaxis(rect, 1, -1)
        return jnp.moveaxis(rect, 0, -1)

    @partial(jax.jit, static_argnames=("self",))
    def _match_fused(self, left, right):
        """BM/SGM single-jit disparity + u8 conversion."""
        if self.engine == "bm":
            dL, _ = bm_match(left, right, self.bm_params)
        else:
            dL, _ = sgm_match(left, right, self.sgm_params)
        return jnp.clip(jnp.round(dL), 0, 255).astype(jnp.uint8)

    @partial(jax.jit, static_argnames=("self",))
    def _scan_stage_jit(self, dmap_u8, valid_disp, Q32, XR32, XT32):
        # extrinsic-dependent arrays are ARGUMENTS, not closure captures:
        # a jit with static self would bake the trace-time XR/XT/cache in
        # forever, silently ignoring update_extrinsics (-m mode)
        return obstacle_scan_from_disparity(
            dmap_u8, valid_disp, Q32, XR32, XT32,
            self.sp, self.p.crop_offset_x, self.p.crop_offset_y)

    def _scan_stage(self, dmap_u8):
        return self._scan_stage_jit(dmap_u8, self.valid_disp, self.Q32,
                                    self.XR32, self.XT32)

    # ---- per-frame host path (imageCallbackLeft equivalent) ------------
    def process_frame(
        self, left_raw: np.ndarray, right_raw: np.ndarray,
        color_bgr: Optional[np.ndarray] = None, timing: bool = False,
    ) -> FrameResult:
        left, right = self._rectify_crop(
            jnp.asarray(left_raw), jnp.asarray(right_raw))

        t0 = time.time()
        if self.engine == "elas":
            D1, _ = elas_match(np.asarray(left), np.asarray(right),
                               self.elas_params)
            dmap = np.clip(np.round(D1), 0, 255).astype(np.uint8)
            dmap_j = jnp.asarray(dmap)
        else:
            dmap_j = self._match_fused(left, right)
            if timing:
                dmap_j.block_until_ready()
            dmap = np.asarray(dmap_j)
        t1 = time.time()

        cloud = None
        pcl_time = 0.0
        if self.p.gen_pcl:
            tc = time.time()
            col = (None if color_bgr is None
                   else self._rectify_crop_color(jnp.asarray(color_bgr)))
            cloud = point_cloud_from_disparity(
                dmap_j, col,
                self.Q32, self.XR32, self.XT32, self.sp,
                self.p.crop_offset_x, self.p.crop_offset_y)
            jax.block_until_ready(cloud)
            pcl_time = time.time() - tc
            # scan from the cloud points with ground rejection
            from ..scan.obstacle import obstacle_scan_from_points
            pts, rgb, valid = cloud
            t2 = time.time()
            scan = obstacle_scan_from_points(pts, valid, self.sp, self.gp)
            jax.block_until_ready(scan)
            t3 = time.time()
        else:
            t2 = time.time()
            scan = self._scan_stage(dmap_j)
            if timing:
                jax.block_until_ready(scan)
            t3 = time.time()

        return FrameResult(
            dmap=dmap, scan=scan, cloud=cloud,
            dmap_time=t1 - t0, pcl_time=pcl_time, scan_time=t3 - t2)

    # ---- batched fused path (throughput mode) ---------------------------
    def process_batch_fused(self, left_raw_b, right_raw_b):
        """Fully fused batched step (BM/SGM engines): raw stereo batch in,
        (dmap_u8 batch, scan batch) out. One XLA program; this is the
        throughput path and the unit the chip-level benchmark measures.

        The remap runs batch-as-vector-dim (shared maps, one gather); the
        matchers and scan stage are gather-free and vmap cleanly."""
        return self._process_batch_fused_jit(
            left_raw_b, right_raw_b, self.valid_disp, self.Q32, self.XR32,
            self.XT32)

    @partial(jax.jit, static_argnames=("self",))
    def _process_batch_fused_jit(self, left_raw_b, right_raw_b,
                                 valid_disp, Q32, XR32, XT32):
        if self.engine == "elas":
            raise ValueError("fused batch path requires engine='bm'|'sgm'")
        p = self.p
        left_b = remap_bilinear_batch(left_raw_b, *self.lmap)
        right_b = remap_bilinear_batch(right_raw_b, *self.rmap)
        sl = (slice(None),
              slice(p.crop_offset_y, p.crop_offset_y + p.crop_im_height),
              slice(p.crop_offset_x, p.crop_offset_x + p.crop_im_width))
        left_b, right_b = left_b[sl], right_b[sl]
        dmaps = self._match_batch(left_b, right_b)
        scans = jax.vmap(lambda dm: self._scan_stage_jit(
            dm, valid_disp, Q32, XR32, XT32))(dmaps)
        return dmaps, scans

    def process_batch_fused_pcl(self, left_raw_b, right_raw_b,
                                color_bgr_b=None):
        """Fused batched gen-pcl step (BM/SGM): raw stereo batch in ->
        (dmap_u8 batch, cloud batch, scan batch), one XLA program.

        The full reference path rect -> disparity -> CLOUD -> scan
        (point_cloud.cpp:298-404): every pixel with d >= 2 becomes a
        robot-frame point with packed RGB, and the scan is built from the
        points with scan-time ground-plane rejection — unlike
        process_batch_fused's valid-disparity-cache shortcut."""
        return self._process_batch_fused_pcl_jit(
            left_raw_b, right_raw_b, color_bgr_b, self.Q32, self.XR32,
            self.XT32)

    @partial(jax.jit, static_argnames=("self",))
    def _process_batch_fused_pcl_jit(self, left_raw_b, right_raw_b,
                                     color_bgr_b, Q32, XR32, XT32):
        if self.engine == "elas":
            raise ValueError("fused batch path requires engine='bm'|'sgm'")
        p = self.p
        left_b = remap_bilinear_batch(left_raw_b, *self.lmap)
        right_b = remap_bilinear_batch(right_raw_b, *self.rmap)
        sl = (slice(None),
              slice(p.crop_offset_y, p.crop_offset_y + p.crop_im_height),
              slice(p.crop_offset_x, p.crop_offset_x + p.crop_im_width))
        left_b, right_b = left_b[sl], right_b[sl]
        dmaps = self._match_batch(left_b, right_b)

        def one(dm, col):
            return point_cloud_from_disparity(
                dm, col, Q32, XR32, XT32, self.sp,
                self.p.crop_offset_x, self.p.crop_offset_y)

        if color_bgr_b is None:
            pts, rgb, valid = jax.vmap(lambda dm: one(dm, None))(dmaps)
        else:
            col_b = self._rectify_crop_color(color_bgr_b)
            pts, rgb, valid = jax.vmap(one)(dmaps, col_b)
        from ..scan.obstacle import obstacle_scan_from_points
        scans = jax.vmap(
            lambda pp, vv: obstacle_scan_from_points(pp, vv, self.sp,
                                                     self.gp))(pts, valid)
        return dmaps, (pts, rgb, valid), scans

    def process_batch_pcl(self, left_raw_b, right_raw_b, color_bgr_b=None):
        """Engine-agnostic batched gen-pcl step: (dmap_u8 batch, cloud
        batch, scan batch). BM/SGM run the single-jit fused path; ELAS
        runs its pipelined batch then the cloud+scan jit. The cloud is the
        full reference gen-pcl export (robot-frame points + packed RGB,
        point_cloud.cpp:312-386) with the scan built from the points under
        scan-time ground rejection."""
        if self.engine != "elas":
            return self.process_batch_fused_pcl(left_raw_b, right_raw_b,
                                                color_bgr_b)
        from ..matching.elas.pipeline import elas_match_batch_device
        left_b, right_b = self._rectify_crop_batch(
            jnp.asarray(left_raw_b), jnp.asarray(right_raw_b))
        B = left_b.shape[0]
        chunk = max(c for c in (1, 2, 4, 8) if B % c == 0 and c <= B)
        D1, _ = elas_match_batch_device(
            left_b, right_b, self.elas_params, chunk=chunk)
        dmaps = self._dmap_u8(D1)
        col_b = (None if color_bgr_b is None
                 else self._rectify_crop_color(jnp.asarray(color_bgr_b)))
        cloud, scans = self._cloud_scan_jit(
            dmaps, col_b, self.Q32, self.XR32, self.XT32)
        return dmaps, cloud, scans

    @partial(jax.jit, static_argnames=("self",))
    def _cloud_scan_jit(self, dmaps, color_bgr_b, Q32, XR32, XT32):
        """Batched cloud export + point-scan from uint8 disparity maps."""
        from ..scan.obstacle import obstacle_scan_from_points

        def one(dm, col):
            return point_cloud_from_disparity(
                dm, col, Q32, XR32, XT32, self.sp,
                self.p.crop_offset_x, self.p.crop_offset_y)

        if color_bgr_b is None:
            pts, rgb, valid = jax.vmap(lambda dm: one(dm, None))(dmaps)
        else:
            pts, rgb, valid = jax.vmap(one)(dmaps, color_bgr_b)
        scans = jax.vmap(
            lambda pp, vv: obstacle_scan_from_points(pp, vv, self.sp,
                                                     self.gp))(pts, valid)
        return (pts, rgb, valid), scans

    def process_batch(self, left_raw_b, right_raw_b):
        """Engine-agnostic batched step: (dmap_u8 batch, scan batch), device
        arrays. BM/SGM use the single-jit fused path; ELAS runs its
        software-pipelined batch (matching/elas/pipeline.py) between the
        rectify and scan jits."""
        if self.engine != "elas":
            return self.process_batch_fused(left_raw_b, right_raw_b)
        from ..matching.elas.pipeline import elas_match_batch_device
        left_b, right_b = self._rectify_crop_batch(
            jnp.asarray(left_raw_b), jnp.asarray(right_raw_b))
        B = left_b.shape[0]
        chunk = max(c for c in (1, 2, 4, 8) if B % c == 0 and c <= B)
        D1, _ = elas_match_batch_device(
            left_b, right_b, self.elas_params, chunk=chunk)
        dmaps = self._dmap_u8(D1)
        scans = jax.vmap(self._scan_stage)(dmaps)
        return dmaps, scans

    @partial(jax.jit, static_argnames=("self",))
    def _rectify_crop_batch(self, left_raw_b, right_raw_b):
        p = self.p
        left_b = remap_bilinear_batch(left_raw_b, *self.lmap)
        right_b = remap_bilinear_batch(right_raw_b, *self.rmap)
        sl = (slice(None),
              slice(p.crop_offset_y, p.crop_offset_y + p.crop_im_height),
              slice(p.crop_offset_x, p.crop_offset_x + p.crop_im_width))
        return left_b[sl], right_b[sl]

    @partial(jax.jit, static_argnames=("self",))
    def _dmap_u8(self, D1):
        return jnp.clip(jnp.round(D1), 0, 255).astype(jnp.uint8)

    def _match_batch(self, left_b, right_b):
        """Batched disparity: Pallas kernels on TPU, vmapped jnp else."""
        if self.engine == "bm" and self.use_pallas:
            from ..matching.bm import bm_texture_gate
            from ..ops.pallas.bm_kernel import bm_match_pallas
            # kernel applies the L/R check in its epilogue
            dL, _ = bm_match_pallas(left_b, right_b, self.bm_params)
            dL = bm_texture_gate(left_b, dL, self.bm_params)
            return jnp.clip(jnp.round(dL), 0, 255).astype(jnp.uint8)
        if self.engine == "sgm" and self.use_pallas:
            from ..matching.sgm import sgm_match_pallas
            dL, _ = sgm_match_pallas(left_b, right_b, self.sgm_params)
            return jnp.clip(jnp.round(dL), 0, 255).astype(jnp.uint8)
        return jax.vmap(self._match_fused)(left_b, right_b)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other
