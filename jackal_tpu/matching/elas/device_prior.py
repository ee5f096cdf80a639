"""ELAS prior maps computed ON DEVICE from per-triangle coefficients.

Round-1/2 shipped the prior as per-pixel maps (d_plane int16 + flags +
grids ≈ 1.3 MB/frame); on tunnel-attached TPUs that upload IS the ELAS
throughput bound (~28 MB/s ⇒ ~46 ms/frame, docs/results.md). This module
reduces the wire to per-TRIANGLE coefficients (~45 B/triangle ≈ 130-300 KB
/frame) and evaluates the scanline rasterization + plane truncation on
device — BIT-EXACTLY, in plain f32: measured on the target TPU, XLA's
f32 multiply/add are separate IEEE round-to-nearest-even ops (no FMA
contraction), identical to the host's x86 SSE singles. Only f32 DIVISION
differs (2 ulp), so every division stays on host.

Split of work:
  host  — support collection, Delaunay, f64 plane fit (needs float64,
          which TPUs lack), corner sort, slope/intercept f32 division
          (TPU f32 divide is not bit-exact): everything per-TRIANGLE,
          O(T) tiny;
  device— per-(triangle, column) line evaluation, winner-takes-last-triangle
          rasterization, per-pixel d_plane truncation: everything per-PIXEL
          or per-(T, W), O(T·W + H·W) tensor ops.

Reference anchors: computeDisparityPlanes (elas.cpp:507-577), the scanline
rasterization in computeDisparity (elas.cpp:813-904); host twin:
matching/elas/prior.py rasterize_planes / PlaneMaps.d_plane (the outputs
here are asserted bit-identical to it in tests/test_device_prior.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

from ...config import ElasParams
from .prior import compute_disparity_planes


# ---------------------------------------------------------------------------
# host side: per-triangle coefficient wire
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PriorCoeffWire:
    """Per-triangle device wire for one image side (numpy, padded later).

    35 B/triangle: line INTERCEPTS are not shipped — the device recomputes
    b = A_v - a*A_u bit-exactly from the slope and the (integer) corner
    coords, and corner coords fit int16. Only values whose computation
    involves f32 division (slopes) or f64 (plane fit) ride as f32 bits."""
    corners_u: np.ndarray   # [T, 3] int16: int(A_u), int(B_u), int(C_u)
    corners_v: np.ndarray   # [T, 2] int16: int(A_v), int(B_v)
    slope_bits: np.ndarray  # [T, 3] int32: f32 bits of AC_a, AB_a, BC_a
    plane_bits: np.ndarray  # [T, 3] int32: f32 bits of pa, pb, pc
    pvalid: np.ndarray      # [T] uint8: |a|<0.7 on both images
    #                         (elas.cpp:872)
    paint_idx: np.ndarray   # [T] int16: ORIGINAL paint-order index — the
    #   raster's winner-takes-last compares THIS, so host reordering of
    #   rows (the top-row sort below) cannot change the painted result
    vmin: np.ndarray        # [T] int16: min corner v — top-row sort key
    #   (row locality lets the device rasterize short row slabs)


def sort_wire_rows(w: "PriorCoeffWire") -> "PriorCoeffWire":
    """Stable-sort the wire rows by top row (vmin). Pure locality
    optimization: the device raster derives each chunk's actual row span
    from the sorted rows and processes a short slab instead of the full
    image height; paint_idx keeps winner semantics order-independent."""
    o = np.argsort(w.vmin, kind="stable")
    return PriorCoeffWire(
        w.corners_u[o], w.corners_v[o], w.slope_bits[o],
        w.plane_bits[o], w.pvalid[o], w.paint_idx[o], w.vmin[o])


def _corner_sort_f32(tu: np.ndarray, tv: np.ndarray):
    """The reference's literal pairwise swap sequence (elas.cpp:847-854,
    prior.py:199-203), vectorized: NOT a stable sort on ties."""
    tu = tu.astype(np.float32).copy()
    tv = tv.astype(np.float32).copy()
    for j, k in ((1, 0), (2, 0), (2, 1)):
        sw = tu[:, k] > tu[:, j]
        for arr in (tu, tv):
            a, b = arr[:, k].copy(), arr[:, j].copy()
            arr[:, k] = np.where(sw, b, a)
            arr[:, j] = np.where(sw, a, b)
    return tu, tv


def prior_coeff_wire(support: np.ndarray, tri: np.ndarray,
                     right_image: bool, fit_fn=None) -> PriorCoeffWire:
    """Host prep mirroring rasterize_planes' per-triangle math exactly.

    fit_fn(support, tri) -> [T, 6] float32 plane params; defaults to the
    numpy fit (prior.compute_disparity_planes). The pipeline passes the
    native full-pivot fit (native_prior.fit_planes_native)."""
    T = len(tri)
    if T == 0:
        return PriorCoeffWire(
            np.zeros((0, 3), np.int16), np.zeros((0, 2), np.int16),
            np.zeros((0, 3), np.int32), np.zeros((0, 3), np.int32),
            np.zeros((0,), np.uint8), np.zeros((0,), np.int16),
            np.zeros((0,), np.int16))
    s = support.astype(np.float32)
    if right_image:
        tu = (s[tri, 0] - s[tri, 2]).astype(np.float32)
    else:
        tu = s[tri, 0].astype(np.float32)
    tv = s[tri, 1].astype(np.float32)
    tu, tv = _corner_sort_f32(tu, tv)
    A_u, B_u, C_u = tu[:, 0], tu[:, 1], tu[:, 2]
    A_v, B_v, C_v = tv[:, 0], tv[:, 1], tv[:, 2]
    iA, iB, iC = (x.astype(np.int64) for x in (A_u, B_u, C_u))

    with np.errstate(divide="ignore", invalid="ignore"):
        def slope(num_v0, num_v1, den_u0, den_u1, i0, i1):
            a = np.where(i0 != i1,
                         (num_v0 - num_v1).astype(np.float32)
                         / (den_u0 - den_u1).astype(np.float32),
                         np.float32(0.0)).astype(np.float32)
            return a
        AB_a = slope(A_v, B_v, A_u, B_u, iA, iB)
        AC_a = slope(A_v, C_v, A_u, C_u, iA, iC)
        BC_a = slope(B_v, C_v, B_u, C_u, iB, iC)

    planes = (fit_fn or compute_disparity_planes)(support, tri)  # [T, 6] f32
    if right_image:
        pa, pb, pc = planes[:, 3], planes[:, 4], planes[:, 5]
        pother = planes[:, 0]
    else:
        pa, pb, pc = planes[:, 0], planes[:, 1], planes[:, 2]
        pother = planes[:, 3]
    pvalid = (np.abs(pa) < 0.7) & (np.abs(pother) < 0.7)

    sbits = np.stack([AC_a, AB_a, BC_a], axis=1).view(np.int32)
    pbits = np.stack([pa, pb, pc], axis=1).view(np.int32)
    corners = np.stack([iA, iB, iC], axis=1).astype(np.int16)
    cv = np.stack([A_v, B_v], axis=1).astype(np.int16)
    vmin = np.minimum(np.minimum(A_v, B_v), C_v).astype(np.int16)
    return PriorCoeffWire(corners, cv, sbits, pbits,
                          pvalid.astype(np.uint8),
                          np.arange(T, dtype=np.int16), vmin)


def pad_coeff_wire(w: PriorCoeffWire, T_pad: int) -> PriorCoeffWire:
    """Pad to T_pad triangles; padded entries have empty column spans
    (A=B=C=0) so they never rasterize."""
    T = len(w.corners_u)
    if T >= T_pad:
        return w
    p = T_pad - T
    return PriorCoeffWire(
        np.pad(w.corners_u, ((0, p), (0, 0))),
        np.pad(w.corners_v, ((0, p), (0, 0))),
        np.pad(w.slope_bits, ((0, p), (0, 0))),
        np.pad(w.plane_bits, ((0, p), (0, 0))),
        np.pad(w.pvalid, (0, p)),
        np.pad(w.paint_idx, (0, p)),
        np.pad(w.vmin, (0, p)))


# ---------------------------------------------------------------------------
# device side: spans -> raster -> maps (plain f32 — measured bit-exact)
# ---------------------------------------------------------------------------

def _raster_mul_impl(corners_u, slope_bits, plane_bits, *, W, H):
    """ALL the f32 multiplies of the rasterization, alone in their own
    executable. XLA's backends may contract a multiply feeding an add in
    the SAME executable into a single-rounding FMA (XLA:CPU does; the
    target TPU does not) — splitting mul and add across two dispatches
    forbids contraction by construction, keeping both backends bit-equal
    to the host's x86 SSE single ops. Products are exact-rounded f32, so
    downstream adds in the second dispatch reproduce the reference."""
    import jax
    import jax.numpy as jnp

    slopes = jax.lax.bitcast_convert_type(slope_bits.astype(jnp.int32),
                                          jnp.float32)     # [T, 3]
    planes = jax.lax.bitcast_convert_type(plane_bits.astype(jnp.int32),
                                          jnp.float32)     # [T, 3]
    u_f = jnp.arange(W, dtype=jnp.float32)[None, :]
    v_f = jnp.arange(H, dtype=jnp.float32)[None, :]
    A_u_f = corners_u[:, 0:1].astype(jnp.float32)          # exact ints
    B_u_f = corners_u[:, 1:2].astype(jnp.float32)
    m_ac = slopes[:, 0:1] * u_f                            # [T, W]
    m_ab = slopes[:, 1:2] * u_f
    m_bc = slopes[:, 2:3] * u_f
    s_ac = slopes[:, 0:1] * A_u_f                          # [T, 1]
    s_ab = slopes[:, 1:2] * A_u_f
    s_bc = slopes[:, 2:3] * B_u_f
    au = planes[:, 0:1] * u_f                              # [T, W]
    bv = planes[:, 1:2] * v_f                              # [T, H]
    return m_ac, m_ab, m_bc, s_ac, s_ab, s_bc, au, bv


def _raster_add_impl(corners_u, corners_v, plane_bits, pvalid, paint_idx,
                     m_ac, m_ab, m_bc, s_ac, s_ab, s_bc, au, bv,
                     *, W, H, chunk=64, slab=48):
    """Scanline rasterization + plane evaluation: adds/compares ONLY (the
    multiplies arrive precomputed from _raster_mul_impl — see there for
    why). Plain f32 adds and C-semantics truncation are bit-identical to
    the host x86 ops on both XLA:CPU and the TPU (measured). f32 DIVISION
    is not (2 ulp on TPU) — all slopes are divided on host and shipped as
    bits. Line intercepts b = A_v - a*A_u are recomputed here (one f32
    subtract of the shipped product — same single rounding as the host's).
    The u32-wrap of negative scanline bounds (elas.cpp:878-879 cast
    chain) is an int32->uint32 convert here.

    Winner-takes-LAST-triangle semantics (the reference paints triangles
    in ascending order, elas.cpp:813-904) compare paint_idx, so the wire
    rows can arrive in ANY order; the host sorts them by top row
    (sort_wire_rows) and each 64-triangle chunk then rasterizes only a
    `slab`-row band derived from its own scanline bounds — a lax.cond
    falls back to full height for chunks containing tall triangles.
    NOTE: under vmap the cond runs both branches (still correct, not
    faster); the production path maps frames with lax.map instead."""
    import jax
    import jax.numpy as jnp

    T = corners_u.shape[0]
    u_i = jnp.arange(W, dtype=jnp.int32)[None, :]          # [1, W]
    A = corners_u[:, 0:1].astype(jnp.int32)                # [T, 1]
    B = corners_u[:, 1:2].astype(jnp.int32)
    C = corners_u[:, 2:3].astype(jnp.int32)
    A_v_f = corners_v[:, 0:1].astype(jnp.float32)          # exact ints
    B_v_f = corners_v[:, 1:2].astype(jnp.float32)
    planes = jax.lax.bitcast_convert_type(plane_bits.astype(jnp.int32),
                                          jnp.float32)
    seg1 = (u_i >= A) & (u_i < B)
    cover = (u_i >= A) & (u_i < C)                         # A<=B<=C (sorted)

    def line_trunc(m, b):
        # f32 add (exact), C trunc toward zero, uint32 wrap
        return (m + b).astype(jnp.int32).astype(jnp.uint32)

    v1 = line_trunc(m_ac, A_v_f - s_ac)                    # AC line [T, W]
    v2 = jnp.where(seg1,
                   line_trunc(m_ab, A_v_f - s_ab),         # AB line
                   line_trunc(m_bc, B_v_f - s_bc))         # BC line
    Hu = jnp.uint32(H)
    lo = jnp.minimum(jnp.minimum(v1, v2), Hu).astype(jnp.int32)
    hi = jnp.minimum(jnp.maximum(v1, v2), Hu).astype(jnp.int32)
    lo = jnp.where(cover, lo, 0)
    hi = jnp.where(cover, hi, 0)

    # per chunk: find the max covering paint index AND its plane value
    # f = (pa*u + pb*v) + pc via a masked one-hot sum — no [H,W]-sized
    # gathers (TPU gathers cost ~ms each)
    n_chunks = -(-T // chunk)
    pvi = pvalid.astype(jnp.bool_)
    pidx = paint_idx.astype(jnp.int32)
    BH = min(slab, H)

    def body(ci, carry):
        sl = ci * chunk
        lo_c = jax.lax.dynamic_slice_in_dim(lo, sl, chunk, 0)[:, None, :]
        hi_c = jax.lax.dynamic_slice_in_dim(hi, sl, chunk, 0)[:, None, :]
        au_c = jax.lax.dynamic_slice_in_dim(au, sl, chunk, 0)[:, None, :]
        bv_c = jax.lax.dynamic_slice_in_dim(bv, sl, chunk, 0)
        pc_c = jax.lax.dynamic_slice_in_dim(planes, sl, chunk, 0)[:, 2]
        pv_c = jax.lax.dynamic_slice_in_dim(pvi, sl, chunk, 0)[:, None,
                                                               None]
        idx = jax.lax.dynamic_slice_in_dim(pidx, sl, chunk, 0)[:, None,
                                                               None]
        act = hi_c > lo_c
        rlo = jnp.min(jnp.where(act, lo_c, H))
        rhi = jnp.max(hi_c)
        rlo_al = jnp.clip((rlo // 8) * 8, 0, max(H - BH, 0))
        fits = rhi <= rlo_al + BH

        def paint(carry, r0, nrows):
            tid, fmap, pvmap = carry
            rows = (r0 + jnp.arange(nrows, dtype=jnp.int32))[None, :,
                                                             None]
            bv_s = jax.lax.dynamic_slice(
                bv_c, (0, r0), (chunk, nrows))[:, :, None]
            covered = (rows >= lo_c) & (rows < hi_c)   # [chunk, nrows, W]
            best = jnp.max(jnp.where(covered, idx, -1), axis=0)
            win = covered & (idx == best[None])        # one-hot over c
            f_c = (au_c + bv_s) + pc_c[:, None, None]  # adds only
            f_best = jnp.sum(jnp.where(win, f_c, 0.0), axis=0)
            pv_best = jnp.any(win & pv_c, axis=0)
            tid_s = jax.lax.dynamic_slice(tid, (r0, 0), (nrows, W))
            f_s = jax.lax.dynamic_slice(fmap, (r0, 0), (nrows, W))
            pv_s = jax.lax.dynamic_slice(pvmap, (r0, 0), (nrows, W))
            upd = best > tid_s
            return (
                jax.lax.dynamic_update_slice(
                    tid, jnp.maximum(tid_s, best), (r0, 0)),
                jax.lax.dynamic_update_slice(
                    fmap, jnp.where(upd, f_best, f_s), (r0, 0)),
                jax.lax.dynamic_update_slice(
                    pvmap, jnp.where(upd, pv_best, pv_s), (r0, 0)))

        return jax.lax.cond(
            fits,
            lambda c: paint(c, rlo_al, BH),
            lambda c: paint(c, jnp.int32(0), H),
            carry)

    tid, fmap, pvmap = jax.lax.fori_loop(
        0, n_chunks, body,
        (jnp.full((H, W), -1, jnp.int32),
         jnp.zeros((H, W), jnp.float32),
         jnp.zeros((H, W), jnp.bool_)))

    covered_px = tid >= 0
    dp = jnp.clip(fmap.astype(jnp.int32), -512, 511).astype(jnp.int16)
    dp = jnp.where(covered_px, dp, 0)
    valid = covered_px & pvmap
    return dp, valid, covered_px


# ---------------------------------------------------------------------------
# slab raster: host-binned row bands + packed-key winner max (one parallel
# reduce instead of a sequential chunk loop)
# ---------------------------------------------------------------------------

_RASTER_SLAB = 16
_RASTER_CTILE = 128   # lane width; triangle column spans are ~14 px mean.
#   (32-wide tiles cut key COUNT 2.4x but bought ~nothing: the XLA
#   raster is reduce/layout-bound, not key-bound, and sub-lane minor
#   dims pad 4x — measured round 4. The Pallas raster kernel is the
#   real fix; this XLA form remains the CPU/fallback path.)


def slab_select(support: np.ndarray, tri: np.ndarray, W: int, H: int,
                slab: int, ctile: int, right: bool = False) -> np.ndarray:
    """Host: bin triangles into (`slab`-row x `ctile`-column) tiles;
    [S*C, Ts] int32 indices (into the tri/paint wire order), -1 padded,
    band-major (band = s*C + c).

    A triangle's painted rows lie in [vmin, vmax-1] (its scanlines are
    convex combinations of integer corner rows); the bin range is widened
    by one row below vmin to absorb f32 slope rounding (|err| << 1).
    Columns are exact: the raster covers u in [minU, maxU) of the integer
    corner u's (right image: u - d). Duplicating a triangle into every
    tile it can touch makes each tile's raster independent — the device
    computes ALL tiles in one parallel reduce with NO dynamic slicing.
    Column tiling matters because spans are tiny (mean ~14 px at
    640x480): rasterizing full W per triangle did ~3x the work."""
    S = -(-H // slab)
    C = -(-W // ctile)
    if len(tri) == 0:
        return np.full((S * C, 1), -1, np.int32)
    v = support[tri, 1].astype(np.int32)
    u = support[tri, 0].astype(np.int32)
    if right:
        u = u - support[tri, 2].astype(np.int32)
    s0 = np.clip((v.min(axis=1) - 1) // slab, 0, S - 1)
    s1 = np.clip(v.max(axis=1) // slab, 0, S - 1)
    c0 = np.clip(u.min(axis=1) // ctile, 0, C - 1)
    c1 = np.clip((np.maximum(u.max(axis=1), 1) - 1) // ctile, 0, C - 1)
    nr = s1 - s0 + 1
    nc = c1 - c0 + 1
    n = nr * nc
    total = int(n.sum())
    tid = np.repeat(np.arange(len(tri), dtype=np.int32), n)
    off = np.repeat(np.cumsum(n) - n, n)
    k = np.arange(total, dtype=np.int32) - off          # 0..n[t]-1
    ncr = nc[tid]
    band = ((s0[tid] + k // ncr) * C) + (c0[tid] + k % ncr)
    order = np.argsort(band, kind="stable")
    bands = band[order]
    tids = tid[order]
    counts = np.bincount(bands, minlength=S * C)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(total, dtype=np.int64) - starts[bands]
    sel = np.full((S * C, max(int(counts.max()), 1)), -1, np.int32)
    sel[bands, rank] = tids
    return sel


_PAINT_SHIFT = 11   # low bits: trunc(f)+512 (10) + pvalid (1)


def _slab_products_impl(sel_flat, row0, col0, corners_u, slope_bits,
                        plane_bits, *, CT, slab):
    """ALL the f32 multiplies of the slab raster, gathered into slab
    layout, alone in their own executable on CPU (see _raster_mul_impl
    for the FMA-contraction rationale; on TPU this fuses with
    _slab_raster_impl bit-safely). sel_flat [R] indexes the flat
    [CH*Tp]-row coefficient arrays; row0/col0 [R] are each entry's tile
    base row/column. ONE flat gather per array — a vmapped/batched
    gather falls off the TPU fast path."""
    import jax
    import jax.numpy as jnp

    take = lambda x: jnp.take(x, sel_flat, axis=0)
    cu = take(corners_u)                                    # [R, 3]
    slopes = jax.lax.bitcast_convert_type(
        take(slope_bits).astype(jnp.int32), jnp.float32)
    planes = jax.lax.bitcast_convert_type(
        take(plane_bits).astype(jnp.int32), jnp.float32)
    u_f = (col0[:, None]
           + jnp.arange(CT, dtype=jnp.int32)[None, :]) \
        .astype(jnp.float32)                                # [R, CT]
    rows_f = (row0[:, None]
              + jnp.arange(slab, dtype=jnp.int32)[None, :]) \
        .astype(jnp.float32)                                # [R, slab]
    A_u_f = cu[:, 0:1].astype(jnp.float32)
    B_u_f = cu[:, 1:2].astype(jnp.float32)
    m_ac = slopes[:, 0:1] * u_f                             # [R, CT]
    m_ab = slopes[:, 1:2] * u_f
    m_bc = slopes[:, 2:3] * u_f
    s_ac = slopes[:, 0:1] * A_u_f                           # [R, 1]
    s_ab = slopes[:, 1:2] * A_u_f
    s_bc = slopes[:, 2:3] * B_u_f
    au = planes[:, 0:1] * u_f                               # [R, CT]
    bv = planes[:, 1:2] * rows_f                            # [R, slab]
    return m_ac, m_ab, m_bc, s_ac, s_ab, s_bc, au, bv


def _slab_raster_impl(sel_flat, row0, col0, corners_u, corners_v,
                      plane_bits, pvalid, paint_idx,
                      m_ac, m_ab, m_bc, s_ac, s_ab, s_bc, au, bv,
                      *, CH, S, C, Ts, W, H, slab, CT):
    """Adds/compares only (products arrive from _slab_products_impl).

    Same line/trunc/uint-wrap semantics as _raster_add_impl; the winner
    bookkeeping is a single int32 max over the tile's triangles with the
    key (paint << 11) | (trunc(f)+512) << 1 | pvalid — winner-takes-last
    == max paint, and the payload rides along. Tiles are (slab x CT)
    pixel blocks, band-major (band = s*C + c, see slab_select). Returns
    (d_plane int16, valid, covered) [CH, H, W]."""
    import jax
    import jax.numpy as jnp

    take = lambda x: jnp.take(x, sel_flat, axis=0)
    cu = take(corners_u)
    cv = take(corners_v)
    planes = jax.lax.bitcast_convert_type(
        take(plane_bits).astype(jnp.int32), jnp.float32)
    pv = take(pvalid).astype(jnp.int32)                     # [R]
    paint = take(paint_idx).astype(jnp.int32)               # [R]

    u_i = col0[:, None] + jnp.arange(CT, dtype=jnp.int32)[None, :]
    A = cu[:, 0:1].astype(jnp.int32)
    B = cu[:, 1:2].astype(jnp.int32)
    Cc = cu[:, 2:3].astype(jnp.int32)
    A_v_f = cv[:, 0:1].astype(jnp.float32)
    B_v_f = cv[:, 1:2].astype(jnp.float32)
    seg1 = (u_i >= A) & (u_i < B)
    cover = (u_i >= A) & (u_i < Cc)                         # A<=B<=C

    def line_trunc(m, b):
        return (m + b).astype(jnp.int32).astype(jnp.uint32)

    v1 = line_trunc(m_ac, A_v_f - s_ac)                     # [R, CT]
    v2 = jnp.where(seg1,
                   line_trunc(m_ab, A_v_f - s_ab),
                   line_trunc(m_bc, B_v_f - s_bc))
    Hu = jnp.uint32(H)
    lo = jnp.minimum(jnp.minimum(v1, v2), Hu).astype(jnp.int32)
    hi = jnp.minimum(jnp.maximum(v1, v2), Hu).astype(jnp.int32)
    lo = jnp.where(cover, lo, 0)
    hi = jnp.where(cover, hi, 0)

    f = (au[:, None, :] + bv[:, :, None]) + planes[:, 2:3, None]
    dt = jnp.clip(f.astype(jnp.int32), -512, 511)           # [R, slab, CT]
    key = ((paint[:, None, None] << _PAINT_SHIFT)
           | ((dt + 512) << 1) | pv[:, None, None])
    r = (row0[:, None] + jnp.arange(slab, dtype=jnp.int32))[:, :, None]
    covered = (r >= lo[:, None, :]) & (r < hi[:, None, :])
    key = jnp.where(covered & (paint[:, None, None] >= 0), key, -1)

    win = key.reshape(CH * S * C, Ts, slab, CT).max(axis=1)
    win = win.reshape(CH, S, C, slab, CT).transpose(0, 1, 3, 2, 4) \
        .reshape(CH, S * slab, C * CT)[:, :H, :W]
    covered_px = win >= 0
    dp = (((win >> 1) & 1023) - 512).astype(jnp.int16)
    dp = jnp.where(covered_px, dp, 0)
    valid = covered_px & ((win & 1) == 1)
    return dp, valid, covered_px


# ---------------------------------------------------------------------------
# v3: coefficients computed ON DEVICE from (support, triangle) indices
# ---------------------------------------------------------------------------

def tri_wire(support: np.ndarray, tri: np.ndarray):
    """Host: order triangle rows by top image row (raster slab locality)
    and keep the ORIGINAL index as the paint order. Everything else the
    old coefficient wire computed on host (corner sort, slopes, f64 plane
    fit, grids) now runs on device (_tri_coeffs_impl / _grid_impl), so the
    wire is just vertex indices: ~8 B/triangle instead of ~35."""
    if len(tri) == 0:
        return np.zeros((0, 3), np.int16), np.zeros((0,), np.int16)
    vmin = support[tri, 1].min(axis=1)
    o = np.argsort(vmin, kind="stable")
    return (np.ascontiguousarray(tri[o], np.int16),
            o.astype(np.int16))


def pad_tri_wire(tri: np.ndarray, paint: np.ndarray, Tp: int):
    """Pad to Tp rows. Padded rows index support[0] three times: equal
    corners give an empty column span, so they never rasterize; the grid
    ignores triangles entirely."""
    T = len(tri)
    if T >= Tp:
        return tri, paint
    return (np.pad(tri, ((0, Tp - T), (0, 0))),
            np.pad(paint, (0, Tp - T), constant_values=-1))


def _corner_sort_dev(tu, tv):
    """The reference's literal pairwise swap sequence (elas.cpp:847-854) on
    integer corner coords [T, 3] — f32 compares of exact ints == int
    compares."""
    import jax.numpy as jnp

    cu = [tu[:, 0], tu[:, 1], tu[:, 2]]
    cv = [tv[:, 0], tv[:, 1], tv[:, 2]]
    for j, k in ((1, 0), (2, 0), (2, 1)):
        sw = cu[k] > cu[j]
        for cols in (cu, cv):
            a, b = cols[k], cols[j]
            cols[k] = jnp.where(sw, b, a)
            cols[j] = jnp.where(sw, a, b)
    return jnp.stack(cu, 1), jnp.stack(cv, 1)


def _tri_coeffs_impl(support, tri, right):
    """Device twin of prior_coeff_wire minus the host fit: support [N, 3]
    i32, tri [T, 3] i32 -> (corners_u [T,3] i32, corners_v [T,2] i32,
    slope_bits [T,3] i32, plane_bits [T,3] i32, pvalid [T] bool).

    Slopes are correctly-rounded f32 quotients of integer differences
    (softfloat.f32_div_int == x86 divss); the plane fit is the softfloat
    f64 Gauss-Jordan (device_fit). Trace under jax.enable_x64(True).

    `right` may be a bool OR a per-row bool array [T]: the pipeline
    concatenates BOTH sides' triangle lists into one call — the softfloat
    fit and slope chains are ~100 tiny [T]-shaped int ops each, so at
    T ~ 14k the per-op dispatch overhead dominates and one double-width
    call halves it (measured round 4)."""
    import jax
    import jax.numpy as jnp
    from ...ops import softfloat as sf
    from .device_fit import _fit_planes_impl

    u = support[tri, 0]
    v = support[tri, 1]
    d = support[tri, 2]
    if isinstance(right, bool):
        tu = (u - d) if right else u
    else:
        tu = jnp.where(right[:, None], u - d, u)
    tu, tv = _corner_sort_dev(tu.astype(jnp.int32), v.astype(jnp.int32))
    A_u, B_u, C_u = tu[:, 0], tu[:, 1], tu[:, 2]
    A_v, B_v = tv[:, 0], tv[:, 1]

    def slope(dv_, du_):
        q = sf.f32_div_int(dv_, jnp.where(du_ == 0, 1, du_))
        return jnp.where(du_ != 0, q, jnp.float32(0.0))

    AC_a = slope(A_v - tv[:, 2], A_u - C_u)
    AB_a = slope(A_v - B_v, A_u - B_u)
    BC_a = slope(B_v - tv[:, 2], B_u - C_u)

    planes = _fit_planes_impl(support, tri)          # [T, 6] f32
    if isinstance(right, bool):
        sel_r = jnp.bool_(right)
    else:
        sel_r = right
    pa = jnp.where(sel_r, planes[:, 3], planes[:, 0])
    pb = jnp.where(sel_r, planes[:, 4], planes[:, 1])
    pc = jnp.where(sel_r, planes[:, 5], planes[:, 2])
    pother = jnp.where(sel_r, planes[:, 0], planes[:, 3])
    pvalid = (jnp.abs(pa) < 0.7) & (jnp.abs(pother) < 0.7)
    sbits = jax.lax.bitcast_convert_type(
        jnp.stack([AC_a, AB_a, BC_a], 1), jnp.int32)
    pbits = jax.lax.bitcast_convert_type(
        jnp.stack([pa, pb, pc], 1), jnp.int32)
    corners_u = jnp.stack([A_u, B_u, C_u], 1)
    corners_v = jnp.stack([A_v, B_v], 1)
    return corners_u, corners_v, sbits, pbits, pvalid


def _grid_impl(support, right, *, gs, gh, gw, disp_max):
    """createGrid (elas.cpp:579-659) on device: candidate marking as ONE
    one-hot matmul (MXU) + d+/-1 shifts + the flat 3x3 OR-diffusion
    including its row-wrap quirk. support [N, 3] i32; padded rows carry
    d = -1 and are masked out. Returns bool [gh, gw, disp_max+1].
    `right` may be a traced scalar bool (the fused both-sides call)."""
    import jax
    import jax.numpy as jnp

    D = disp_max + 1
    G = gh * gw
    u = support[:, 0].astype(jnp.int32)
    v = support[:, 1].astype(jnp.int32)
    d = support[:, 2].astype(jnp.int32)
    if isinstance(right, bool):
        x = (u - d) // gs if right else u // gs
    else:
        x = jnp.where(right, (u - d) // gs, u // gs)
    y = v // gs
    ok = (x >= 0) & (x < gw) & (y >= 0) & (y < gh) & (d >= 0)
    cell = jnp.clip(y * gw + x, 0, G - 1)
    onehot_c = ((cell[:, None] == jnp.arange(G, dtype=jnp.int32)[None, :])
                & ok[:, None])                            # [N, G]
    onehot_d = (d[:, None] == jnp.arange(D, dtype=jnp.int32)[None, :])
    counts = jnp.dot(onehot_c.astype(jnp.float32).T,
                     onehot_d.astype(jnp.float32),
                     precision="highest")                 # [G, D]
    base = counts > 0
    # d-1 / d+1 marking (clamped at both ends == plain shifts)
    t1 = base
    t1 = t1.at[:, :-1].set(t1[:, :-1] | base[:, 1:])
    t1 = t1.at[:, 1:].set(t1[:, 1:] | base[:, :-1])
    # flat 3x3 OR diffusion with stride gw (wraps across grid rows —
    # reproduced from the reference's flat-array loop)
    m = G - 2 * gw - 2
    acc = jnp.zeros((m, D), bool)
    for off in (0, 1, 2, gw, gw + 1, gw + 2,
                2 * gw, 2 * gw + 1, 2 * gw + 2):
        acc = acc | jax.lax.slice_in_dim(t1, off, off + m, axis=0)
    out = jnp.zeros((G, D), bool).at[gw + 1:G - gw - 1].set(acc)
    return out.reshape(gh, gw, D)


_JITS = {}


def prior_maps_device(corners_u, corners_v, slope_bits, plane_bits,
                      pvalid, paint_idx, W: int, H: int):
    """[B, T, ...] padded coefficient arrays -> (d_plane int16, valid,
    covered) [B, H, W] device arrays, bit-identical to the host
    rasterize_planes + PlaneMaps.d_plane pair. Two dispatches: multiplies,
    then adds/raster (see _raster_mul_impl for why they must not share an
    executable)."""
    import jax

    key = (W, H)
    if key not in _JITS:
        def muls(cu, sb, pb):
            return jax.vmap(partial(_raster_mul_impl, W=W, H=H))(
                cu, sb, pb)

        def adds(cu, cv, pb, pv, pidx, prods):
            return jax.vmap(partial(_raster_add_impl, W=W, H=H))(
                cu, cv, pb, pv, pidx, *prods)
        _JITS[key] = (jax.jit(muls), jax.jit(adds))
    mul_jit, add_jit = _JITS[key]
    prods = mul_jit(corners_u, slope_bits, plane_bits)
    return add_jit(corners_u, corners_v, plane_bits, pvalid, paint_idx,
                   prods)
