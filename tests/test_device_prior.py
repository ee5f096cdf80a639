"""Device-computed prior maps vs the host rasterizer, bit-for-bit.

The on-device prior (matching/elas/device_prior.py) must reproduce the
host PlaneMaps EXACTLY — d_plane int16, plane-valid and covered masks —
including every f32 truncation boundary, because the dense matcher's MAP
window and the final disparities hang off those values."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from jackal_tpu.config import ElasParams
from jackal_tpu.matching.elas.device_prior import (
    pad_coeff_wire, prior_coeff_wire, prior_maps_device)
from jackal_tpu.matching.elas.prior import (
    compute_disparity_planes, delaunay, rasterize_planes)


def _case_support(fix):
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures", fix)
    z = np.load(path)
    from jackal_tpu.matching.elas.pipeline import elas_match
    out = elas_match(z["left"], z["right"], ElasParams(), return_debug=True)
    H, W = z["left"].shape
    return out[2].support, W, H


@pytest.mark.parametrize("fix", ["elas_stages_st320.npz",
                                 "elas_golden_s320_boxes.npz"])
@pytest.mark.parametrize("right", [False, True])
def test_device_prior_bit_equal_host(fix, right):
    support, W, H = _case_support(fix)
    pts = (np.stack([support[:, 0] - support[:, 2], support[:, 1]], -1)
           if right else support[:, :2]).astype(np.float32)
    tri = delaunay(pts)
    planes = compute_disparity_planes(support, tri)
    maps_host = rasterize_planes(support, tri, planes, W, H, right)

    wire = prior_coeff_wire(support, tri, right)
    Tp = -(-len(tri) // 64) * 64
    wire = pad_coeff_wire(wire, Tp)
    dp, valid, covered = prior_maps_device(
        wire.corners_u[None], wire.corners_v[None], wire.slope_bits[None],
        wire.plane_bits[None], wire.pvalid[None], wire.paint_idx[None],
        W, H)
    dp, valid, covered = (np.asarray(x[0]) for x in (dp, valid, covered))

    assert np.array_equal(covered, maps_host.tri_id >= 0)
    assert np.array_equal(valid, maps_host.valid)
    assert np.array_equal(dp[covered], maps_host.d_plane[covered])


def test_empty_and_tiny_triangulations():
    support = np.array([[10, 10, 5], [40, 10, 5], [25, 40, 5]], np.int32)
    tri = np.array([[0, 1, 2]], np.int32)
    planes = compute_disparity_planes(support, tri)
    maps_host = rasterize_planes(support, tri, planes, 64, 64, False)
    wire = pad_coeff_wire(prior_coeff_wire(support, tri, False), 64)
    dp, valid, covered = prior_maps_device(
        wire.corners_u[None], wire.corners_v[None], wire.slope_bits[None],
        wire.plane_bits[None], wire.pvalid[None], wire.paint_idx[None],
        64, 64)
    assert np.array_equal(np.asarray(covered[0]), maps_host.tri_id >= 0)
    assert np.array_equal(np.asarray(dp[0])[maps_host.tri_id >= 0],
                          maps_host.d_plane[maps_host.tri_id >= 0])

    empty = prior_coeff_wire(support, np.zeros((0, 3), np.int32), False)
    wire0 = pad_coeff_wire(empty, 64)
    dp, valid, covered = prior_maps_device(
        wire0.corners_u[None], wire0.corners_v[None],
        wire0.slope_bits[None], wire0.plane_bits[None],
        wire0.pvalid[None], wire0.paint_idx[None], 64, 64)
    assert not np.asarray(covered).any()


@pytest.mark.parametrize("right", [False, True])
def test_device_tri_coeffs_match_host_wire(right):
    """v3: coefficients computed on device from (support, tri) indices —
    softfloat f64 plane fit + correctly-rounded f32 slope divisions —
    must equal the host prior_coeff_wire bitwise; the device one-hot-
    matmul grid must equal create_grid exactly."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jackal_tpu.matching.elas.device_prior import (
        _grid_impl, _tri_coeffs_impl)
    from jackal_tpu.matching.elas.prior import create_grid

    pytest.importorskip("jackal_tpu.native")
    from jackal_tpu.native import available
    if not available():
        pytest.skip("native engine unavailable")
    from jackal_tpu.matching.elas.native_prior import fit_planes_native

    support, W, H = _case_support("elas_golden_s320_boxes.npz")
    pts = (np.stack([support[:, 0] - support[:, 2], support[:, 1]], -1)
           if right else support[:, :2]).astype(np.float32)
    tri = delaunay(pts)
    # the production fit: native full-pivot Gauss-Jordan (the numpy
    # LAPACK default rounds differently and is only RMSE-close)
    want = prior_coeff_wire(support, tri, right, fit_planes_native)

    def traced(sp, t):
        with jax.enable_x64(True):
            return _tri_coeffs_impl(sp, t, right)
    with jax.enable_x64(True):
        cu, cv, sb, pb, pv = jax.jit(traced)(
            jnp.asarray(support, jnp.int32), jnp.asarray(tri, jnp.int32))
    np.testing.assert_array_equal(np.asarray(cu),
                                  want.corners_u.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(cv),
                                  want.corners_v.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(sb), want.slope_bits)
    np.testing.assert_array_equal(np.asarray(pb), want.plane_bits)
    np.testing.assert_array_equal(np.asarray(pv), want.pvalid.astype(bool))

    p = ElasParams()
    gs = p.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    grid = jax.jit(partial(_grid_impl, right=right, gs=gs, gh=gh, gw=gw,
                           disp_max=p.disp_max))(
        jnp.asarray(support, jnp.int32))
    np.testing.assert_array_equal(np.asarray(grid),
                                  create_grid(support, W, H, right, p))


def test_device_grid_masks_padded_support():
    """Padded support rows (d = -1) must not mark any grid cell."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jackal_tpu.matching.elas.device_prior import _grid_impl
    from jackal_tpu.matching.elas.prior import create_grid

    p = ElasParams()
    support = np.array([[40, 40, 10], [80, 40, 12], [60, 80, 11]], np.int32)
    padded = np.concatenate(
        [support, np.array([[0, 0, -1]] * 5, np.int32)])
    gs = p.grid_size
    W = H = 120
    gh, gw = -(-H // gs), -(-W // gs)
    grid = jax.jit(partial(_grid_impl, right=False, gs=gs, gh=gh, gw=gw,
                           disp_max=p.disp_max))(jnp.asarray(padded))
    np.testing.assert_array_equal(np.asarray(grid),
                                  create_grid(support, W, H, False, p))


def test_sorted_wire_preserves_paint_order():
    """sort_wire_rows reorders triangles by top row (the raster's
    short-slab locality optimization); paint_idx must keep the painted
    winner identical to the reference's ascending paint order, including
    on shared-edge pixels that several triangles touch."""
    from jackal_tpu.matching.elas.device_prior import sort_wire_rows

    support, W, H = _case_support("elas_golden_s320_boxes.npz")
    tri = delaunay(support[:, :2].astype(np.float32))
    planes = compute_disparity_planes(support, tri)
    maps_host = rasterize_planes(support, tri, planes, W, H, False)

    wire = sort_wire_rows(prior_coeff_wire(support, tri, False))
    assert not np.all(np.diff(wire.paint_idx.astype(np.int32)) == 1)
    wire = pad_coeff_wire(wire, -(-len(tri) // 64) * 64)
    dp, valid, covered = prior_maps_device(
        wire.corners_u[None], wire.corners_v[None], wire.slope_bits[None],
        wire.plane_bits[None], wire.pvalid[None], wire.paint_idx[None],
        W, H)
    assert np.array_equal(np.asarray(covered[0]), maps_host.tri_id >= 0)
    assert np.array_equal(np.asarray(valid[0]), maps_host.valid)
    assert np.array_equal(np.asarray(dp[0])[maps_host.tri_id >= 0],
                          maps_host.d_plane[maps_host.tri_id >= 0])


def test_slab_raster_wide_triangles_bit_equal_host():
    """Column-tiled slab raster == host rasterizer on triangles spanning
    MANY 128-column tiles and row bands (the golden scenes' spans average
    ~14 px, so they never cross tiles; sparse support makes every
    triangle multi-tile). Exercises slab_select's 2D duplication, the
    right-side u-d binning, and the tile recompose."""
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas.device_prior import (
        _RASTER_CTILE, _RASTER_SLAB, slab_select, tri_wire)

    W, H = 640, 480
    rng = np.random.default_rng(11)
    # sparse, spread-out support: triangles span hundreds of px
    us = rng.choice(np.arange(8, W - 8), size=14, replace=False)
    vs = rng.choice(np.arange(8, H - 8), size=14, replace=False)
    ds = rng.integers(6, 120, size=14)
    support = np.stack([us, vs, ds], -1).astype(np.int32)

    t1 = delaunay(support[:, :2].astype(np.float32))
    right_pts = np.stack(
        [support[:, 0] - support[:, 2], support[:, 1]], -1
    ).astype(np.float32)
    t2 = delaunay(right_pts)

    tw1, pw1 = tri_wire(support, t1)
    tw2, pw2 = tri_wire(support, t2)
    sel1 = slab_select(support, tw1, W, H, _RASTER_SLAB, _RASTER_CTILE)
    sel2 = slab_select(support, tw2, W, H, _RASTER_SLAB, _RASTER_CTILE,
                       right=True)
    wire = (support.astype(np.int16), tw1, pw1, tw2, pw2, sel1, sel2)

    p = ElasParams()
    gs = p.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Np, Tp, Ts = P._chunk_pads([wire])
    import jax.numpy as jnp
    flat = jnp.asarray(P._flatten_chunk_wire([wire], Np, Tp, Ts))
    m1, m2, _, _ = P._raster_chunk(flat, 1, Np, Tp, Ts, gh, gw,
                                   p.disp_max + 1, W, H, gs)

    for (dp, valid, covered), tri, right in ((m1, t1, False),
                                             (m2, t2, True)):
        planes = compute_disparity_planes(support, tri)
        host = rasterize_planes(support, tri, planes, W, H, right)
        assert np.array_equal(np.asarray(covered[0]), host.tri_id >= 0)
        assert np.array_equal(np.asarray(valid[0]), host.valid)
        cov = host.tri_id >= 0
        assert np.array_equal(np.asarray(dp[0])[cov], host.d_plane[cov])


def test_native_wire_engine_matches_numpy_twin():
    """tri_wire_and_bin (native/wire_engine.cpp) vs the numpy
    tri_wire + slab_select pair, on real support geometry (both sides) and
    on adversarial spans (negative right-image u, u <= 1 columns,
    off-image vmin-1 rows)."""
    pytest.importorskip("jackal_tpu.native")
    from jackal_tpu.native import available
    if not available():
        pytest.skip("native engine unavailable")
    from jackal_tpu.matching.elas.device_prior import (
        _RASTER_CTILE, _RASTER_SLAB, slab_select, tri_wire)
    from jackal_tpu.matching.elas.native_prior import tri_wire_and_bin_native

    def check(support, tri, W, H, right):
        t_np, p_np = tri_wire(support, tri)
        s_np = slab_select(support, t_np, W, H, _RASTER_SLAB,
                           _RASTER_CTILE, right=right)
        t_c, p_c, s_c = tri_wire_and_bin_native(
            support.astype(np.int16), tri, W, H, _RASTER_SLAB,
            _RASTER_CTILE, right=right)
        np.testing.assert_array_equal(t_np, t_c)
        np.testing.assert_array_equal(p_np, p_c)
        Ts = max(s_np.shape[1], s_c.shape[1])

        def pad(s):
            out = np.full((s.shape[0], Ts), -1, np.int32)
            out[:, :s.shape[1]] = s
            return out

        np.testing.assert_array_equal(pad(s_np), pad(s_c))

    support, W, H = _case_support("elas_golden_s320_boxes.npz")
    for right in (False, True):
        pts = (np.stack([support[:, 0] - support[:, 2], support[:, 1]], -1)
               if right else support[:, :2]).astype(np.float32)
        check(support, delaunay(pts), W, H, right)

    # adversarial: top-row triangles (vmin-1 < 0), d > u (negative right
    # u spans), and u <= 1 (the max(umax, 1) - 1 clamp)
    sp = np.array([[0, 0, 5], [1, 0, 1], [5, 9, 30], [630, 3, 200],
                   [639, 479, 2], [2, 478, 1], [320, 240, 128]], np.int32)
    for right in (False, True):
        pts = (np.stack([sp[:, 0] - sp[:, 2], sp[:, 1]], -1)
               if right else sp[:, :2]).astype(np.float32)
        check(sp, delaunay(pts), 640, 480, right)


def test_native_flatten_chunk_wire_matches_numpy_twin():
    """flatten_chunk_wire (native/wire_engine.cpp) vs the numpy flatten,
    byte-for-byte, on real per-frame wires plus the empty-support
    bail-out wire (int32 sel dtype, zero triangles)."""
    pytest.importorskip("jackal_tpu.native")
    from jackal_tpu.native import available
    if not available():
        pytest.skip("native engine unavailable")
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas.device_prior import (
        _RASTER_CTILE, _RASTER_SLAB)

    params = ElasParams()
    support, W, H = _case_support("elas_golden_s320_boxes.npz")

    def wire_from_support(sp):
        from jackal_tpu.matching.elas.native_prior import (
            tri_wire_and_bin_native)
        sp16 = sp.astype(np.int16)
        lp = sp[:, :2].astype(np.float32)
        rp = np.stack([sp[:, 0] - sp[:, 2], sp[:, 1]], -1).astype(np.float32)
        t1, p1, s1 = tri_wire_and_bin_native(
            sp16, delaunay(lp), W, H, _RASTER_SLAB, _RASTER_CTILE)
        t2, p2, s2 = tri_wire_and_bin_native(
            sp16, delaunay(rp), W, H, _RASTER_SLAB, _RASTER_CTILE,
            right=True)
        return (sp16, t1, p1, t2, p2, s1, s2)

    # two real frames with different triangle counts + the bail-out wire
    w_full = wire_from_support(support)
    w_half = wire_from_support(support[::2])
    S = -(-H // _RASTER_SLAB) * -(-W // _RASTER_CTILE)
    e3 = np.zeros((0, 3), np.int16)
    e1 = np.zeros((0,), np.int16)
    es = np.full((S, 1), -1, np.int32)
    w_empty = (np.zeros((0, 3), np.int16), e3, e1, e3.copy(), e1.copy(),
               es, es.copy())
    wires = [w_full, w_half, w_empty, w_full]
    Np, Tp, Ts = P._chunk_pads(wires)
    np.testing.assert_array_equal(
        P._flatten_chunk_wire_native(wires, Np, Tp, Ts),
        P._flatten_chunk_wire_np(wires, Np, Tp, Ts))
