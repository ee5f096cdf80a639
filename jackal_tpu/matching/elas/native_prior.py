"""Native-backed host prior path: exact semantics, milliseconds per frame.

Same contract as support.collect_support_points + prior.build_priors, with
the sequential pruning, plane fit, rasterization, plane-map evaluation and
grid build in C++ (jackal_tpu/native/prior_engine.cpp). Triangulation stays
in scipy/Qhull.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from ...config import ElasParams
from ...native import load as load_native
from .post import speckle_size_eff
from .prior import PlaneMaps, delaunay
from .support import add_corner_support_points, effective_stepsize


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def remove_small_segments_native(
    D: np.ndarray, params: ElasParams = ElasParams()
) -> np.ndarray:
    """Exact BFS speckle removal (elas.cpp:981-1099) in C++; microseconds
    per frame vs the device label-propagation's batched-gather cost."""
    lib = load_native()
    a = np.ascontiguousarray(D, np.float32).copy()
    H, W = a.shape
    lib.remove_small_segments_native(
        _ptr(a, ctypes.c_float), W, H,
        ctypes.c_float(params.speckle_sim_threshold),
        speckle_size_eff(params))
    return a


def collect_support_points_native(
    D_can: np.ndarray, params: ElasParams = ElasParams(),
    width: int = 0, height: int = 0,
) -> np.ndarray:
    lib = load_native()
    D = np.ascontiguousarray(D_can, dtype=np.int16).copy()
    ncv, ncu = D.shape
    lib.prune_support(
        _ptr(D, ctypes.c_int16), ncv, ncu,
        params.incon_window_size, params.incon_threshold,
        params.incon_min_support, 5, 1)
    out = np.zeros((ncv * ncu, 3), np.int32)
    n = lib.collect_support(
        _ptr(D, ctypes.c_int16), ncv, ncu, effective_stepsize(params),
        _ptr(out, ctypes.c_int32), ncv * ncu)
    sp = out[:n]
    if params.add_corners and width and height:
        sp = add_corner_support_points(sp, width, height)
    return np.ascontiguousarray(sp, np.int32)


class _MapsNative(PlaneMaps):
    """PlaneMaps with the d_plane evaluated natively (stored, not derived).

    d_plane is clipped to int16: values outside [-512, 511] behave
    identically in the matcher (the +/-plane_radius window and prior
    selects saturate), and halving the dtype matters on tunnel-attached
    TPUs where host->device bandwidth is ~50 MB/s."""

    def __init__(self, tri_id, d_plane, valid):
        self.tri_id = tri_id
        self._d_plane = np.clip(d_plane, -512, 511).astype(np.int16)
        self.valid = valid
        z = np.zeros_like(d_plane, np.float32)
        self.plane_a = z
        self.plane_b = z
        self.plane_c = z

    @property
    def d_plane(self):
        return self._d_plane


def build_grid_native(
    support: np.ndarray, width: int, height: int, right: bool,
    params: ElasParams = ElasParams(),
) -> np.ndarray:
    """Candidate grid (createGrid, elas.cpp:579-659) alone, bool
    [gh, gw, disp_max+1] — for the coefficient-wire path where the plane
    maps are rasterized on device (device_prior.py)."""
    lib = load_native()
    sp = np.ascontiguousarray(support, np.int32)
    gs = params.grid_size
    gw = -(-width // gs)
    gh = -(-height // gs)
    D = params.disp_max + 1
    grid = np.zeros((gh, gw, D), np.uint8)
    lib.build_grid(_ptr(sp, ctypes.c_int32), len(sp), width, height,
                   int(right), gs, params.disp_max,
                   _ptr(grid, ctypes.c_uint8))
    return grid.astype(bool)


def tri_wire_and_bin_native(
    support: np.ndarray, tri: np.ndarray, W: int, H: int,
    slab: int, ctile: int, right: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """tri_wire + slab_select fused in C++ (native/wire_engine.cpp):
    returns (tri_sorted int16 [T,3], paint int16 [T], sel int16 [S*C, Ts]).
    Semantics twin of device_prior.tri_wire/slab_select (asserted equal in
    tests/test_device_prior.py); the numpy pair costs ~2.4 ms/frame on
    this 1-core host, the two C++ linear passes ~0.05 ms."""
    lib = load_native()
    T = len(tri)
    S = -(-H // slab)
    C = -(-W // ctile)
    if T == 0:
        return (np.zeros((0, 3), np.int16), np.zeros((0,), np.int16),
                np.full((S * C, 1), -1, np.int16))
    sp = np.ascontiguousarray(support, np.int16)
    tr = np.ascontiguousarray(tri, np.int32)
    tri_out = np.empty((T, 3), np.int16)
    paint = np.empty((T,), np.int16)
    cap = 48
    while True:
        sel = np.empty((S * C, cap), np.int16)
        got = lib.tri_wire_and_bin(
            _ptr(sp, ctypes.c_int16), len(sp), _ptr(tr, ctypes.c_int32), T,
            W, H, slab, ctile, int(right), cap,
            _ptr(tri_out, ctypes.c_int16), _ptr(paint, ctypes.c_int16),
            _ptr(sel, ctypes.c_int16))
        if got <= cap:
            return tri_out, paint, sel[:, :max(got, 1)]
        cap = got


def fit_planes_native(support: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Per-triangle plane fit [T, 6] via the C++ full-pivot solve
    (prior_engine.cpp fit_planes, condensing matrix.cpp:414-502) — the
    reference-exact production fit, ~10x faster than the numpy fallback
    (prior.compute_disparity_planes) on this 1-core host."""
    lib = load_native()
    sp = np.ascontiguousarray(support, np.int32)
    tri = np.ascontiguousarray(tri, np.int32)
    t = len(tri)
    planes = np.zeros((max(t, 1), 6), np.float32)
    if t:
        lib.fit_planes(_ptr(sp, ctypes.c_int32), len(sp),
                       _ptr(tri, ctypes.c_int32), t,
                       _ptr(planes, ctypes.c_float))
    return planes[:t]


def build_priors_native(
    support: np.ndarray, width: int, height: int,
    params: ElasParams = ElasParams(),
    tri_left: Optional[np.ndarray] = None,
    tri_right: Optional[np.ndarray] = None,
) -> Tuple[PlaneMaps, PlaneMaps, np.ndarray, np.ndarray]:
    lib = load_native()
    sp = np.ascontiguousarray(support, np.int32)
    n = len(sp)
    left_pts = sp[:, :2].astype(np.float32)
    right_pts = np.stack([sp[:, 0] - sp[:, 2], sp[:, 1]], -1).astype(np.float32)
    t1 = (delaunay(left_pts) if tri_left is None else tri_left)
    t2 = (delaunay(right_pts) if tri_right is None else tri_right)
    t1 = np.ascontiguousarray(t1, np.int32)
    t2 = np.ascontiguousarray(t2, np.int32)

    gs = params.grid_size
    gw = -(-width // gs)
    gh = -(-height // gs)
    D = params.disp_max + 1

    results = []
    for tri, right in ((t1, 0), (t2, 1)):
        t = len(tri)
        planes = np.zeros((max(t, 1), 6), np.float32)
        if t:
            lib.fit_planes(_ptr(sp, ctypes.c_int32), n,
                           _ptr(tri, ctypes.c_int32), t,
                           _ptr(planes, ctypes.c_float))
        tri_id = np.empty((height, width), np.int32)
        lib.rasterize(_ptr(sp, ctypes.c_int32), n,
                      _ptr(tri, ctypes.c_int32), t,
                      width, height, right, _ptr(tri_id, ctypes.c_int32))
        d_plane = np.empty((height, width), np.int32)
        valid = np.empty((height, width), np.uint8)
        covered = np.empty((height, width), np.uint8)
        lib.plane_maps(_ptr(tri_id, ctypes.c_int32),
                       _ptr(planes, ctypes.c_float), t,
                       width, height, right,
                       _ptr(d_plane, ctypes.c_int32),
                       _ptr(valid, ctypes.c_uint8),
                       _ptr(covered, ctypes.c_uint8))
        grid = np.zeros((gh, gw, D), np.uint8)
        lib.build_grid(_ptr(sp, ctypes.c_int32), n, width, height, right,
                       gs, params.disp_max, _ptr(grid, ctypes.c_uint8))
        maps = _MapsNative(tri_id, d_plane, valid.astype(bool))
        results.append((maps, grid.astype(bool)))
    (m1, g1), (m2, g2) = results
    return m1, m2, g1, g2
