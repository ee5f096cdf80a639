"""ELAS prior construction: Delaunay triangulation, disparity planes,
candidate grid and triangle rasterization (host side).

Reference: computeDelaunayTriangulation (elas.cpp:445-505, Shewchuk
"triangle" with switches "zQB"), computeDisparityPlanes (507-577, 3x3
Gauss-Jordan per triangle), createGrid (579-659, candidate OR-diffusion) and
the scanline rasterization inside computeDisparity (813-904).

TPU stance: support points are ~100-2000 per frame; triangulation and
rasterization are irregular pointer-y work that is *host* work by design
(the one place the survey marks host compute as idiomatic). Outputs are
dense fixed-shape arrays (per-pixel plane maps + per-cell candidate masks)
consumed by the fully vectorized device matcher. A C++ native engine
(jackal_tpu/native) accelerates this path; this numpy version is the
reference implementation and the fallback.

Delaunay: the first-party native triangulator (native/delaunay_engine.cpp,
Guibas-Stolfi divide-and-conquer with Dwyer alternating cuts and EXACT
integer predicates) is the default. Its triangle SETS match the reference
triangulator's on golden fixtures — including the co-circular 5-px support
lattices — up to duplicate-point survivor choice (tests/test_delaunay.py).
scipy (Qhull) remains as the fallback for non-integral coordinates or a
missing C++ toolchain; Qhull's co-circular diagonal choices can differ,
giving a sub-pixel RMSE-bounded divergence. Tests that need bit-exactness
feed the reference triangle list directly.
"""
from __future__ import annotations

import ctypes
import dataclasses
from typing import Optional, Tuple

import numpy as np
from scipy.spatial import Delaunay as _SciDelaunay
from scipy.spatial import QhullError

from ...config import ElasParams

try:
    from ...native import available as _native_available
    _HAVE_NATIVE_TRI = _native_available()
except Exception:  # pragma: no cover - toolchain-less environments
    _HAVE_NATIVE_TRI = False


def _delaunay_native(pts_f32: np.ndarray) -> Optional[np.ndarray]:
    """Exact-arithmetic native triangulation; None if not applicable
    (non-integral coords fall back to Qhull)."""
    from ...native import load

    lib = load()
    pts = np.ascontiguousarray(pts_f32, np.float32)
    max_tri = 3 * len(pts) + 16
    out = np.zeros((max_tri, 3), np.int32)
    n = lib.delaunay_exact(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_tri, 1)
    if n < 0:
        return None
    return out[:n]


def delaunay(points_uv: np.ndarray) -> np.ndarray:
    """Triangle index list [T, 3] over 2D points (float32 coords like the
    reference, elas.cpp:453-465)."""
    pts = np.asarray(points_uv, dtype=np.float32)
    if len(pts) < 3:
        return np.zeros((0, 3), np.int32)
    if _HAVE_NATIVE_TRI:
        tri = _delaunay_native(pts)
        if tri is not None:
            return tri
    try:
        tri = _SciDelaunay(pts.astype(np.float64))
    except QhullError:
        return np.zeros((0, 3), np.int32)
    return tri.simplices.astype(np.int32)


def compute_disparity_planes(
    support: np.ndarray, tri: np.ndarray
) -> np.ndarray:
    """Per-triangle plane params [T, 6]: (t1a,t1b,t1c, t2a,t2b,t2c).

    t1: d = a*u + b*v + c fitted on left coords; t2: fitted on right coords
    (u-d). Singular systems yield zeros (elas.cpp:543-547).
    """
    if len(tri) == 0:
        return np.zeros((0, 6), np.float32)
    s = support.astype(np.float64)
    out = np.zeros((len(tri), 6), np.float32)
    for k, right in ((0, False), (3, True)):
        c = tri  # [T,3] indices
        u = s[c, 0] - (s[c, 2] if right else 0.0)   # [T,3]
        v = s[c, 1]
        b = s[c, 2]                                  # disparities
        A = np.stack([u, v, np.ones_like(u)], axis=-1)  # [T,3,3]
        det = np.linalg.det(A)
        ok = np.abs(det) > 1e-12
        sol = np.zeros((len(tri), 3))
        if ok.any():
            sol[ok] = np.linalg.solve(A[ok], b[ok][..., None])[..., 0]
        out[:, k:k + 3] = sol.astype(np.float32)
    return out


def create_grid(
    support: np.ndarray, width: int, height: int, right_image: bool,
    params: ElasParams = ElasParams(),
) -> np.ndarray:
    """Candidate-disparity mask per grid cell: bool [gh, gw, disp_max+1].

    Mirrors createGrid (elas.cpp:579-659) including its flat-array 3x3
    OR-diffusion (which wraps across grid-row boundaries — reproduced).
    The reference then flattens to count+list per cell; the mask is the
    same information in fixed shape (ascending-d scan order preserved).
    """
    gs = params.grid_size
    gw = int(np.ceil(width / gs))
    gh = int(np.ceil(height / gs))
    D = params.disp_max + 1
    temp1 = np.zeros((gh * gw, D), dtype=bool)
    for u, v, d in support:
        d_min = max(d - 1, 0)
        d_max = min(d + 1, params.disp_max)
        if right_image:
            x = int(np.floor(float(u - d) / gs))
        else:
            x = int(np.floor(float(int(u) // gs)))
        y = int(np.floor(float(v) / gs))
        if 0 <= x < gw and 0 <= y < gh:
            temp1[y * gw + x, d_min:d_max + 1] = True

    # flat 3x3 OR diffusion, stride gw, result cells [gw+1, gw*gh-gw-1)
    temp2 = np.zeros_like(temp1)
    n = gh * gw
    acc = np.zeros((n - 2 * gw - 2, D), dtype=bool)
    for off in (0, 1, 2, gw, gw + 1, gw + 2, 2 * gw, 2 * gw + 1, 2 * gw + 2):
        acc |= temp1[off:off + n - 2 * gw - 2]
    temp2[gw + 1:n - gw - 1] = acc
    return temp2.reshape(gh, gw, D)


def grid_mask_to_reference_lists(mask: np.ndarray) -> np.ndarray:
    """Convert a [gh, gw, D] mask (D = disp_max+1) to the reference int32
    layout [gh, gw, disp_max+2] (count, then ascending candidate list,
    zero-padded) for fixture comparison."""
    gh, gw, D = mask.shape
    out = np.zeros((gh, gw, D + 1), np.int32)
    for y in range(gh):
        for x in range(gw):
            ds = np.nonzero(mask[y, x])[0]
            out[y, x, 0] = len(ds)
            out[y, x, 1:1 + len(ds)] = ds
    return out


def _u32_trunc(x: np.ndarray) -> np.ndarray:
    """(int32)(uint32)(float) cast chain used for scanline v bounds
    (elas.cpp:878-879): x86 cvttss2si truncation + uint32 wrap."""
    t = np.trunc(np.asarray(x, np.float64)).astype(np.int64)
    return (t & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)


@dataclasses.dataclass
class PlaneMaps:
    """Dense per-pixel prior for the device matcher."""

    tri_id: np.ndarray    # [H, W] int32, -1 where no triangle rasterized
    plane_a: np.ndarray   # [H, W] float32
    plane_b: np.ndarray
    plane_c: np.ndarray
    valid: np.ndarray     # [H, W] bool: |a|<0.7 and |a_other|<0.7

    @property
    def d_plane(self) -> np.ndarray:
        """(int)(a*u + b*v + c) per pixel, evaluated on host float32 so the
        reference's x86 rounding/truncation is preserved exactly (TPU f32
        fma/excess-precision shifts trunc boundaries)."""
        H, W = self.plane_a.shape
        u = np.arange(W, dtype=np.float32)[None, :]
        v = np.arange(H, dtype=np.float32)[:, None]
        f = (self.plane_a * u).astype(np.float32) \
            + (self.plane_b * v).astype(np.float32)
        dp = (f + self.plane_c).astype(np.float32).astype(np.int64)
        # int16 wire format (see native_prior._MapsNative)
        return np.clip(dp, -512, 511).astype(np.int16)


def pack_prior_wire(maps: "PlaneMaps", grid: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Wire format for the host->device prior upload: ONE int16 word per
    pixel — d_plane+512 in bits 0..9 (d_plane is pre-clipped to [-512, 511]
    by the int16 wire contract), plane-valid in bit 10, triangle-covered in
    bit 11 — plus the candidate grid bitpacked 8 disparities per byte. Cuts
    the upload from 4 arrays (~3.4 MB/side at 640x480) to ~640 KB/side,
    which is what matters on tunnel-attached TPUs (~45 MB/s host->device).
    Device-side inverse: matching/elas/pipeline._unpack_prior_wire."""
    dp = np.asarray(maps.d_plane, np.int16).astype(np.int32)
    wire = (dp + 512) & 0x3FF
    wire |= maps.valid.astype(np.int32) << 10
    wire |= (np.asarray(maps.tri_id) >= 0).astype(np.int32) << 11
    gridp = np.packbits(np.asarray(grid, bool), axis=-1, bitorder="little")
    return wire.astype(np.int16), gridp


def rasterize_planes(
    support: np.ndarray, tri: np.ndarray, planes: np.ndarray,
    width: int, height: int, right_image: bool,
) -> PlaneMaps:
    """Exact scanline rasterization of computeDisparity (elas.cpp:813-904).

    Iterates triangles in order; later triangles overwrite shared pixels,
    matching the reference's repeated findMatch calls. float32 line math and
    the (uint32)(float) v-bound casts are reproduced.
    """
    tri_id = np.full((height, width), -1, np.int32)
    s = support.astype(np.float32)
    for i in range(len(tri)):
        c1, c2, c3 = tri[i]
        if right_image:
            tu = np.array([s[c1, 0] - s[c1, 2], s[c2, 0] - s[c2, 2],
                           s[c3, 0] - s[c3, 2]], np.float32)
        else:
            tu = np.array([s[c1, 0], s[c2, 0], s[c3, 0]], np.float32)
        tv = np.array([s[c1, 1], s[c2, 1], s[c3, 1]], np.float32)
        # literal corner sort (elas.cpp:847-854): pairwise strict-> swaps;
        # NOT a stable sort on ties, so reproduce the exact swap sequence
        tu = list(tu)
        tv = list(tv)
        for j in range(3):
            for k in range(j):
                if tu[k] > tu[j]:
                    tu[j], tu[k] = tu[k], tu[j]
                    tv[j], tv[k] = tv[k], tv[j]
        A_u, B_u, C_u = float(tu[0]), float(tu[1]), float(tu[2])
        A_v, B_v, C_v = float(tv[0]), float(tv[1]), float(tv[2])
        AB_a = np.float32(0.0)
        AC_a = np.float32(0.0)
        BC_a = np.float32(0.0)
        if int(A_u) != int(B_u):
            AB_a = np.float32((A_v - B_v)) / np.float32((A_u - B_u))
        if int(A_u) != int(C_u):
            AC_a = np.float32((A_v - C_v)) / np.float32((A_u - C_u))
        if int(B_u) != int(C_u):
            BC_a = np.float32((B_v - C_v)) / np.float32((B_u - C_u))
        AB_b = np.float32(A_v) - AB_a * np.float32(A_u)
        AC_b = np.float32(A_v) - AC_a * np.float32(A_u)
        BC_b = np.float32(B_v) - BC_a * np.float32(B_u)

        for (u0, u1, a2, b2) in (
            (int(A_u), int(B_u), AB_a, AB_b),
            (int(B_u), int(C_u), BC_a, BC_b),
        ):
            if u0 == u1:
                continue
            us = np.arange(max(u0, 0), min(u1, width))
            if len(us) == 0:
                continue
            usf = us.astype(np.float32)
            v1 = _u32_trunc(AC_a * usf + AC_b)
            v2 = _u32_trunc(a2 * usf + b2)
            lo = np.minimum(v1, v2)
            hi = np.maximum(v1, v2)
            lo = np.clip(lo, 0, height)
            hi = np.clip(hi, 0, height)
            for j, u in enumerate(us):
                if hi[j] > lo[j]:
                    tri_id[lo[j]:hi[j], u] = i
    if len(tri) == 0:
        zz = np.zeros((height, width), np.float32)
        return PlaneMaps(tri_id, zz, zz.copy(), zz.copy(),
                         np.zeros((height, width), bool))
    if right_image:
        pa, pb, pc = planes[:, 3], planes[:, 4], planes[:, 5]
        pother = planes[:, 0]
    else:
        pa, pb, pc = planes[:, 0], planes[:, 1], planes[:, 2]
        pother = planes[:, 3]
    tid = np.clip(tri_id, 0, None)
    covered = tri_id >= 0
    valid_tri = (np.abs(pa) < 0.7) & (np.abs(pother) < 0.7)  # elas.cpp:872
    return PlaneMaps(
        tri_id=tri_id,
        plane_a=np.where(covered, pa[tid], 0).astype(np.float32),
        plane_b=np.where(covered, pb[tid], 0).astype(np.float32),
        plane_c=np.where(covered, pc[tid], 0).astype(np.float32),
        valid=covered & valid_tri[tid],
    )


def build_priors(
    support: np.ndarray, width: int, height: int,
    params: ElasParams = ElasParams(),
    tri_left: Optional[np.ndarray] = None,
    tri_right: Optional[np.ndarray] = None,
) -> Tuple[PlaneMaps, PlaneMaps, np.ndarray, np.ndarray]:
    """Full host prior for one frame: plane maps + grid masks, both images.

    tri_left/tri_right override the triangulation (used by exactness tests
    with the reference triangle lists)."""
    left_pts = support[:, :2].astype(np.float32)
    right_pts = np.stack(
        [support[:, 0] - support[:, 2], support[:, 1]], axis=-1
    ).astype(np.float32)
    t1 = delaunay(left_pts) if tri_left is None else tri_left
    t2 = delaunay(right_pts) if tri_right is None else tri_right
    p1 = compute_disparity_planes(support, t1)
    p2 = compute_disparity_planes(support, t2)
    maps1 = rasterize_planes(support, t1, p1, width, height, False)
    maps2 = rasterize_planes(support, t2, p2, width, height, True)
    grid1 = create_grid(support, width, height, False, params)
    grid2 = create_grid(support, width, height, True, params)
    return maps1, maps2, grid1, grid2
