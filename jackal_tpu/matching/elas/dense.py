"""ELAS dense disparity matching as a fused masked argmin (device hot loop).

Reference: computeDisparity/findMatch (elas.cpp:661-907). The per-pixel
candidate walk (grid candidates outside the plane window, then the plane
window with a log-prior penalty) becomes one masked scan over all D
disparities with an order-encoding integer key, vectorized over every pixel:

  for each d:  cost[v,u] = SAD16(desc1[v,u], desc2[v, u -/+ d])
               S1 = in grid-cell candidate set and outside plane window
               S2 = inside plane window (prior added when the plane is valid)
               key = (val+16)*512 + rank,  rank = d (S1) | 256+d (S2)
  result = argmin key   -- reproduces the reference's strict-< visit order
                           (S1 ascending d, then S2 ascending d) exactly.

The prior table P[dd] = (int)((-log(g+exp(-dd^2/2s^2))+log g)/b)
(elas.cpp:804-805) is negative near the plane (a bonus), truncated toward
zero like the C cast.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from ...config import ElasParams

_WINDOW = 2          # findMatch window_size (elas.cpp:689)
_MIN_VAL_INIT = 10000  # elas.cpp:735
_KEY_BIAS = 16       # priors reach -14; keep keys non-negative
_BIG = jnp.int32(1 << 30)


def prior_table(params: ElasParams = ElasParams()) -> np.ndarray:
    """P[delta_d] int32 (elas.cpp:802-805), C-cast truncation."""
    dd = np.arange(params.disp_num, dtype=np.float64)
    two_s2 = 2.0 * params.sigma * params.sigma
    val = (-np.log(params.gamma + np.exp(-dd * dd / two_s2))
           + np.log(params.gamma)) / params.beta
    return val.astype(np.int32)  # trunc toward zero, like (int32_t)(float)


@partial(jax.jit, static_argnames=("params", "right_image"))
def dense_match(
    desc1: jnp.ndarray,          # [H, W, 16] uint8 (left descriptor)
    desc2: jnp.ndarray,          # [H, W, 16] uint8 (right descriptor)
    d_plane: jnp.ndarray,        # [H, W] int (int)(a*u+b*v+c), host-eval
    plane_valid: jnp.ndarray,    # [H, W] bool (|a|<0.7 both images)
    covered: jnp.ndarray,        # [H, W] bool (pixel rasterized by a tri)
    grid_mask: jnp.ndarray,      # [gh, gw, D] bool candidate sets
    params: ElasParams = ElasParams(),
    right_image: bool = False,
) -> jnp.ndarray:
    """Disparity map [H, W] float32: d, -1 (no candidate) or -10 (not
    covered / texture-gated), matching the reference encodings."""
    H, W, _ = desc1.shape
    D = params.disp_num
    gs = params.grid_size
    radius = params.plane_radius

    if right_image:
        q, t = desc2, desc1
        sign = 1
    else:
        q, t = desc1, desc2
        sign = -1

    # line clamp v -> [2, H-3] (elas.cpp:701)
    vidx = jnp.clip(jnp.arange(H), 2, H - 3)
    # channel-major [16, H, W]: a trailing 16-wide dim wastes 7/8 of the
    # 128 lanes; per-channel [H, W] planes tile fully
    qc = jnp.moveaxis(q[vidx].astype(jnp.int16), -1, 0)
    tc = jnp.moveaxis(t[vidx].astype(jnp.int16), -1, 0)
    # pad the target so the per-d column shift is a dynamic_slice, not a
    # gather (gathers are an order of magnitude slower on TPU)
    if right_image:
        tc_pad = jnp.pad(tc, ((0, 0), (0, 0), (0, D)))
    else:
        tc_pad = jnp.pad(tc, ((0, 0), (0, 0), (D, 0)))

    u = jnp.arange(W)

    # texture gate on the (clamped-row) query descriptor (elas.cpp:715-719)
    tex = jnp.abs(qc.astype(jnp.int32) - 128).sum(0)
    u_ok = (u >= _WINDOW) & (u < W - _WINDOW)
    pixel_ok = covered & u_ok[None, :] & (tex >= params.match_texture)

    d_plane = d_plane.astype(jnp.int32)
    d_min = jnp.maximum(d_plane - radius, 0)
    d_max = jnp.minimum(d_plane + radius, D - 1)  # disp_num-1 (elas.cpp:724)

    # grid candidate masks upsampled to pixel resolution once (repeat =
    # broadcast+reshape on TPU; avoids a per-pixel gather in the hot loop)
    gh, gw, _ = grid_mask.shape
    grid_px = jnp.repeat(jnp.repeat(grid_mask, gs, axis=0), gs, axis=1)
    grid_px = jnp.moveaxis(grid_px[:H, :W], -1, 0)  # [D, H, W] bool

    prior = jnp.where(plane_valid, 1, 0).astype(jnp.int32)
    # prior values as static per-offset selects (radius is tiny); the table
    # is deterministic from params, so it folds to compile-time constants
    P_host = [int(x) for x in prior_table(params)[:radius + 1]]

    def body(d, best):
        warp_ok = (u + sign * d >= _WINDOW) & (u + sign * d < W - _WINDOW)
        offset = d if right_image else D - d
        shifted = jax.lax.dynamic_slice_in_dim(tc_pad, offset, W, axis=2)
        # SAD accumulated per channel plane (int16 on full 128-lane tiles)
        acc = jnp.abs(qc[0] - shifted[0])
        for c in range(1, qc.shape[0]):
            acc = acc + jnp.abs(qc[c] - shifted[c])
        cost = acc.astype(jnp.int32)                           # [H, W]
        in_grid = jax.lax.dynamic_index_in_dim(grid_px, d, keepdims=False)
        in_win = (d >= d_min) & (d <= d_max)
        cand = in_grid | in_win
        dd = jnp.abs(d - d_plane)
        pd = jnp.zeros((H, W), jnp.int32)
        for j, pj in enumerate(P_host):
            pd = jnp.where(dd == j, pj, pd)
        val = cost + jnp.where(in_win, prior * pd, 0)
        rank = jnp.where(in_win, 256 + d, d)
        key = (val + _KEY_BIAS) * 512 + rank
        key = jnp.where(cand & warp_ok[None, :] & pixel_ok, key, _BIG)
        return jnp.minimum(best, key)

    init = jnp.full((H, W), _BIG, jnp.int32)
    best = jax.lax.fori_loop(0, D, body, init, unroll=4)

    d_best = (best % 512) % 256
    out = jnp.where(best < _BIG, d_best.astype(jnp.float32), -1.0)
    # pixels never visited by findMatch (not covered / u out of range) stay
    # -10; texture-gated pixels return without writing -> also -10
    return jnp.where(pixel_ok, out, -10.0)
