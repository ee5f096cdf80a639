"""Semi-global matching (SGM) disparity engine, TPU-native.

BASELINE config 3: "SGM 8-path cost-volume at 1280x960, 64 disparity
levels". Census-transform matching cost + 8-path semi-global aggregation
(Hirschmueller 2008) expressed as lax.scan dynamic programming:

  - census 5x5 -> 24-bit codes; cost = Hamming distance (popcount via
    int bit tricks on the VPU);
  - straight paths: scan over rows/cols with the classic recurrence
    L(p,d) = C(p,d) + min(L(q,d), L(q,d+/-1)+P1, min_d' L(q,d')+P2)
             - min_d' L(q,d')
  - diagonal paths: the same scan with the carry row shifted one column
    per step (roll + edge reset);
  - WTA over the path sum, uniqueness, L/R consistency, parabolic
    sub-pixel. By default the right-image volume is derived as
    S_R(u,d) = S_L(u+d,d). DOCUMENTED DEVIATION: that relation is exact
    for the raw matching cost (same pixel pair) but an approximation for
    the aggregated sum — true right-image SGM runs its own 8 path scans
    over cost_R, and paths through a right-image pixel traverse different
    pixel pairs than paths through its left correspondent. The
    approximation only feeds the L/R consistency check (a thresholded
    compare), where it is standard practice; the left disparity map
    itself is exact SGM. SGMParams.true_right=True enables the
    reference-grade aggregation (cost_R built exactly from the raw
    volume, then its own 8-path DP) at ~2x aggregation cost; the measured
    validity delta on the fixture scene is recorded in docs/parity.md.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SGMParams
from ..ops.shifts import shifted_row_lookup

# int16 value domain (both engines): the cost and aggregated volumes
# store int16, halving their HBM traffic — the Pallas wavefront upcasts
# each slab to int32 in-register for compute (Mosaic int16 vector
# reductions/rotates are unimplemented) while the jnp scan engine
# computes in int16 directly; values are wrap-free in both widths and
# the clamp points coincide, so the engines remain bit-identical.
# Real values are tiny: census cost
# <= 24, per-path increments <= p2 (86), 8-path sums <= ~900. Sentinel
# cells (d > u, borders) carry clamped garbage in BOTH engines; the
# clamps bind only there.
_INVALID = jnp.int16(12000)      # cost-volume "no such pair" sentinel
_CARRY_BIG = 28000               # DP carry clamp / edge reset
_WTA_BIG = jnp.int32(30000)      # WTA exclusion sentinel (> any volume)


def census5x5(img_u8: jnp.ndarray) -> jnp.ndarray:
    """24-neighbor census transform, int32 codes [H, W]."""
    H, W = img_u8.shape
    x = img_u8.astype(jnp.int32)
    p = jnp.pad(x, 2, mode="edge")
    center = x
    code = jnp.zeros((H, W), jnp.int32)
    bit = 0
    for dv in range(-2, 3):
        for du in range(-2, 3):
            if dv == 0 and du == 0:
                continue
            nb = p[2 + dv:2 + dv + H, 2 + du:2 + du + W]
            code = code | (jnp.where(nb < center, 1, 0) << bit)
            bit += 1
    return code


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def census_cost_volume(cl: jnp.ndarray, cr: jnp.ndarray, D: int
                       ) -> jnp.ndarray:
    """Hamming cost [D, H, W] between left census and d-shifted right.

    Shifts are dynamic_slices of a padded copy (gathers compile and run an
    order of magnitude slower on TPU)."""
    H, W = cl.shape
    u = jnp.arange(W)
    cr_pad = jnp.pad(cr, ((0, 0), (D, 0)))

    def body(d, _):
        shifted = jax.lax.dynamic_slice_in_dim(cr_pad, D - d, W, axis=1)
        c = _popcount(cl ^ shifted).astype(jnp.int16)
        return d + 1, jnp.where((u - d >= 0)[None, :], c, _INVALID)

    _, out = jax.lax.scan(body, 0, None, length=D)
    return out


def census_cost_volume_hdw(cl: jnp.ndarray, cr: jnp.ndarray, D: int
                           ) -> jnp.ndarray:
    """census_cost_volume in [H, D, W] layout (what the Pallas wavefront
    consumes) built DIRECTLY — one materialization instead of a [D, H, W]
    scan followed by a 300 MB moveaxis. Values identical."""
    H, W = cl.shape
    u = jnp.arange(W)
    cr_pad = jnp.pad(cr, ((0, 0), (D, 0)))
    slabs = []
    for d in range(D):
        shifted = jax.lax.dynamic_slice_in_dim(cr_pad, D - d, W, axis=1)
        c = _popcount(cl ^ shifted).astype(jnp.int16)
        slabs.append(jnp.where((u - d >= 0)[None, :], c, _INVALID)[:, None])
    return jnp.concatenate(slabs, axis=1)


def _path_scan(cost_thw: jnp.ndarray, p1: int, p2: int, shift: int
               ) -> jnp.ndarray:
    """DP over axis 0 of [T, W, D]; shift in {-1, 0, +1} rolls the carry one
    column per step (diagonal paths)."""
    T, W, D = cost_thw.shape
    BIG = jnp.int16(_CARRY_BIG)

    def step(carry, c):
        prev = carry
        if shift:
            prev = jnp.roll(prev, shift, axis=0)
            edge = 0 if shift == 1 else W - 1
            prev = prev.at[edge].set(BIG)
        m = jnp.min(prev, axis=1, keepdims=True)          # [W, 1]
        # d-range boundary: the missing d-/+1 neighbour is a plain BIG
        # sentinel row (the old prev+BIG overflow trick exceeds int16;
        # BIG+p1 < 2^15 and prev <= cost+p2 < BIG at real cells, so the
        # boundary candidate still never wins). (best - m) <= p2 before
        # the add keeps every int16 intermediate wrap-free.
        cap = jnp.full_like(prev[:, :1], BIG)
        up = jnp.concatenate([cap, prev[:, :-1]], axis=1)
        dn = jnp.concatenate([prev[:, 1:], cap], axis=1)
        best = jnp.minimum(jnp.minimum(prev, m + p2),
                           jnp.minimum(up + p1, dn + p1))
        out = c + (best - m)
        # keep invalid costs from poisoning the carry
        out = jnp.minimum(out, BIG)
        return out, out

    init = jnp.minimum(cost_thw[0], BIG)
    _, path = jax.lax.scan(step, init, cost_thw[1:])
    return jnp.concatenate([init[None], path], axis=0)


def _clamp16(x_i32: jnp.ndarray) -> jnp.ndarray:
    """Pass-group clamp: i32 partial sum -> int16 volume. Real sums are
    <= ~900; the clamp binds only at sentinel cells, keeping every stored
    volume int16. BOTH engines clamp at the same pass boundaries (down
    group, up group + down, each horizontal pass, final sum), so they
    stay bit-identical including sentinel garbage."""
    return jnp.minimum(x_i32, jnp.int32(_CARRY_BIG)).astype(jnp.int16)


def aggregate_paths(cost: jnp.ndarray, params: SGMParams) -> jnp.ndarray:
    """8-path SGM aggregation. cost: [D, H, W] int16 -> S: [D, H, W] int16.

    Grouped exactly like the Pallas wavefront engine: one down group
    (vertical + both down-diagonals), one up group added onto it, the two
    horizontal passes, then the final sum — each group accumulated in
    int32 and clamped back to the int16 domain (_clamp16)."""
    D, H, W = cost.shape
    p1, p2 = params.p1, params.p2
    c_hwd = jnp.moveaxis(cost, 0, -1)           # [H, W, D]

    def i32(x):
        return x.astype(jnp.int32)

    shifts = (0, +1, -1) if params.num_paths >= 8 else (0,)
    down = sum(i32(_path_scan(c_hwd, p1, p2, s)) for s in shifts)
    up = sum(i32(_path_scan(c_hwd[::-1], p1, p2, s)) for s in shifts)[::-1]
    Sv = _clamp16(i32(_clamp16(down)) + up)
    # left->right / right->left: scan over columns => transpose to [W, H, D]
    c_whd = jnp.swapaxes(c_hwd, 0, 1)
    h1 = _clamp16(i32(_path_scan(c_whd, p1, p2, 0)))
    h2 = _clamp16(i32(h1) + i32(_path_scan(c_whd[::-1], p1, p2, 0)[::-1]))
    S = _clamp16(i32(Sv) + i32(jnp.swapaxes(h2, 0, 1)))
    return jnp.moveaxis(S, -1, 0)               # [D, H, W]


def _wta_from_maps(best, best_d, second, cm, cp, D: int,
                   params: SGMParams) -> jnp.ndarray:
    """Uniqueness + parabolic sub-pixel from the five per-pixel WTA maps.
    Shared float epilogue of the jnp and Pallas engines (the maps are
    pure-integer, so both engines feed bit-identical inputs here)."""
    unique = best.astype(jnp.float32) < params.uniqueness * \
        second.astype(jnp.float32)
    den = cm + cp - 2 * best
    offs = jnp.where(
        (best_d > 0) & (best_d < D - 1) & (den > 0),
        (cm - cp).astype(jnp.float32) / (2.0 * den.astype(jnp.float32)),
        0.0)
    return jnp.where(unique, best_d.astype(jnp.float32) + offs, -1.0)


def right_view_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """[D, H, W] left-anchored volume -> right-anchored: out[d,v,u] =
    vol[d,v,u+d], _INVALID where u+d >= W. Exact for the raw cost volume
    (cost_R(u,d) compares the same pixel pair as cost_L(u+d,d))."""
    D, H, W = vol.shape
    u = jnp.arange(W)
    v_pad = jnp.pad(vol, ((0, 0), (0, 0), (0, D)),
                    constant_values=int(_INVALID))

    def body(d, _):
        c = jax.lax.dynamic_slice_in_dim(v_pad[d], d, W, axis=1)
        return d + 1, jnp.where((u + d < W)[None, :], c,
                                _INVALID.astype(vol.dtype))

    _, out = jax.lax.scan(body, 0, None, length=D)
    return out


def _lr_tail(dL: jnp.ndarray, dR: jnp.ndarray, D: int,
             params: SGMParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L/R consistency: invalidate left pixels whose right correspondent
    disagrees (shift-select sweep, no per-pixel gathers)."""
    W = dL.shape[-1]
    u = jnp.arange(W)
    uw = jnp.clip((u[None, :] - dL).astype(jnp.int32), 0, W - 1)
    s = jnp.clip(u[None, :] - uw, 0, D)
    other = shifted_row_lookup(dR, s, D, -1)
    ok = (dL >= 0) & (other >= 0) & \
        (jnp.abs(other - dL) <= params.lr_threshold)
    return jnp.where(ok, dL, -1.0), dR


def _finalize(S: jnp.ndarray, params: SGMParams, S_right=None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """WTA + uniqueness + sub-pixel + L/R consistency on the aggregated
    volume S [D, H, W] (lax.scan engine). S_right, when given, is a
    separately aggregated right-view volume (true_right mode); otherwise
    the right view is derived as S_R(u,d) = S_L(u+d,d)."""
    D, H, W = S.shape

    def wta_maps(vol):
        vol = vol.astype(jnp.int32)
        best_d = jnp.argmin(vol, axis=0).astype(jnp.int32)
        best = jnp.min(vol, axis=0)
        ds = jnp.arange(D)[:, None, None]
        near = jnp.abs(ds - best_d[None]) <= 1
        second = jnp.min(jnp.where(near, _WTA_BIG, vol), axis=0)
        # neighbor costs via masked reductions (no per-pixel gathers)
        cm = jnp.min(jnp.where(ds == best_d[None] - 1, vol, _WTA_BIG),
                     axis=0)
        cp = jnp.min(jnp.where(ds == best_d[None] + 1, vol, _WTA_BIG),
                     axis=0)
        return best, best_d, second, cm, cp

    dL = _wta_from_maps(*wta_maps(S), D, params)
    SR = right_view_volume(S) if S_right is None else S_right
    dR = _wta_from_maps(*wta_maps(SR), D, params)
    return _lr_tail(dL, dR, D, params)


@partial(jax.jit, static_argnames=("params",))
def sgm_match(
    left_u8: jnp.ndarray, right_u8: jnp.ndarray,
    params: SGMParams = SGMParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SGM disparity. Returns (D_left, D_right) float32 [H, W]; invalid=-1."""
    D = params.disp_num
    cl = census5x5(left_u8)
    cr = census5x5(right_u8)
    cost = census_cost_volume(cl, cr, D)
    S = aggregate_paths(cost, params)
    S_right = None
    if params.true_right:
        S_right = aggregate_paths(right_view_volume(cost), params)
    return _finalize(S, params, S_right)


@partial(jax.jit, static_argnames=("params",))
def sgm_match_pallas(
    left_b: jnp.ndarray, right_b: jnp.ndarray,
    params: SGMParams = SGMParams(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched SGM [B, H, W] with the Pallas wavefront path aggregation
    and single-pass WTA-maps kernel (ops/pallas/sgm_kernel.py): identical
    output to vmap(sgm_match). The 8 lax.scan DP passes become 4
    VMEM-resident row walks, and the finalize reads the 300 MB aggregated
    volume exactly once (left AND right WTA from the same row slab)
    instead of ~12 elementwise passes."""
    from ..ops.pallas.sgm_kernel import (
        aggregate_paths_pallas_bhdw, census5x5_pallas, sgm_wta_maps_pallas)

    D = params.disp_num
    cl = census5x5_pallas(left_b)
    cr = census5x5_pallas(right_b)
    cost = jax.vmap(lambda a, b: census_cost_volume_hdw(a, b, D))(cl, cr)
    S = aggregate_paths_pallas_bhdw(cost, params,
                                    hdw_layout=True)  # [B, H, D, W]
    m = sgm_wta_maps_pallas(S).astype(jnp.int32)      # [B, H, 10, W]
    dL = _wta_from_maps(m[:, :, 0], m[:, :, 1], m[:, :, 2],
                        m[:, :, 3], m[:, :, 4], D, params)
    if params.true_right:
        # reference-grade: the right volume gets its own 8-path DP; its
        # direct (left-view) WTA maps are rows 0-4 of the maps kernel
        cost_r = jnp.moveaxis(
            jax.vmap(right_view_volume)(jnp.moveaxis(cost, 2, 1)), 1, 2)
        SRv = aggregate_paths_pallas_bhdw(cost_r, params, hdw_layout=True)
        mr = sgm_wta_maps_pallas(SRv).astype(jnp.int32)
        dR = _wta_from_maps(mr[:, :, 0], mr[:, :, 1], mr[:, :, 2],
                            mr[:, :, 3], mr[:, :, 4], D, params)
    else:
        dR = _wta_from_maps(m[:, :, 5], m[:, :, 6], m[:, :, 7],
                            m[:, :, 8], m[:, :, 9], D, params)
    dLc, dR = jax.vmap(lambda a, b: _lr_tail(a, b, D, params))(dL, dR)
    return dLc, dR


sgm_match_batch = jax.vmap(sgm_match, in_axes=(0, 0, None))
