"""ELAS support-point matching, TPU-reformulated.

Reference: computeSupportMatches / computeMatchingDisparity
(elas.cpp:269-443). The per-point sequential SSE loops become dense masked
cost volumes over the 5-px candidate grid:

  - left pass: 4-block descriptor SAD argmin over d for every grid point at
    once (vs the reference's per-point d loop);
  - right pass: the same, dense over *all* columns of the grid rows, because
    the backwards check lands on arbitrary columns u-d;
  - ratio test / texture / bounds reproduce the reference's integer
    semantics exactly (strict-< best/second-best bookkeeping included).

The inconsistent/redundant support pruning (elas.cpp:153-235) mutates the
candidate grid in scan order — invalidations affect later decisions — so the
exact variant runs sequentially on host (numpy; a C++ native version backs
the production path). A parallel device variant is provided for the fully
fused pipeline (documented deviation, same neighborhoods).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import ElasParams

def effective_stepsize(params: ElasParams) -> int:
    """candidate_stepsize, rounded up to even under subsampling so only
    every-second-line descriptors are touched (elas.cpp:379-381)."""
    step = params.candidate_stepsize
    if params.subsampling:
        step += step % 2
    return step


# 4 SAD blocks at (v +/- 2, u +/- 2) (elas.cpp:275-278)
_BLOCK_OFFS = ((-2, -2), (-2, 2), (2, -2), (2, 2))
_WINDOW = 3   # window_size (elas.cpp:273)
_STEP = 2     # u_step / v_step


def _blocks(desc: jnp.ndarray) -> jnp.ndarray:
    """[64, H, W] int16 (channel-major): the 4 16-byte blocks used by the
    support SAD. Channel-major keeps each plane on full 128-lane tiles."""
    H, W, _ = desc.shape
    p = jnp.pad(desc.astype(jnp.int16), ((2, 2), (2, 2), (0, 0)),
                constant_values=128)
    return jnp.concatenate(
        [jnp.moveaxis(p[2 + dv:2 + dv + H, 2 + du:2 + du + W], -1, 0)
         for dv, du in _BLOCK_OFFS],
        axis=0,
    )


def _best_two(cost: jnp.ndarray, valid: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """min1, argmin1 (first occurrence), min2 (excluding that), count.

    cost: [..., D] int32; valid: [..., D] bool. Mirrors the reference's
    strict-< best/second-best update (elas.cpp:354-362).
    """
    BIG = jnp.int32(1 << 28)
    c = jnp.where(valid, cost, BIG)
    min1 = c.min(axis=-1)
    d1 = jnp.argmin(c, axis=-1).astype(jnp.int32)  # first occurrence
    onehot = jax.nn.one_hot(d1, c.shape[-1], dtype=jnp.bool_)
    min2 = jnp.where(onehot, BIG, c).min(axis=-1)
    count = valid.sum(axis=-1)
    return min1, d1, min2, count


@partial(jax.jit, static_argnames=("params",))
def support_candidates(
    desc1: jnp.ndarray, desc2: jnp.ndarray, params: ElasParams = ElasParams()
) -> jnp.ndarray:
    """Candidate grid D_can [ncv, ncu] int16 (calloc-0 border row/col 0).

    ncu/ncv = ceil(W/step), ceil(H/step). Entry (v_can, u_can) for
    u_can,v_can >= 1 is the L/R-consistent support disparity at
    (u_can*step, v_can*step), or -1.
    """
    H, W, _ = desc1.shape
    step = effective_stepsize(params)
    ncu = -(-W // step)
    ncv = -(-H // step)
    us = jnp.arange(1, ncu) * step          # [nu]
    vs = jnp.arange(1, ncv) * step          # [nv]
    nu, nv = ncu - 1, ncv - 1
    D = params.disp_max + 1
    ds = jnp.arange(D)                      # [D]

    B1 = _blocks(desc1)
    B2 = _blocks(desc2)
    B1v = B1[:, vs]                         # [64, nv, W]
    B2v = B2[:, vs]

    tex1 = jnp.abs(desc1[vs][:, :, :].astype(jnp.int32) - 128).sum(-1)  # [nv, W]
    tex2 = jnp.abs(desc2[vs][:, :, :].astype(jnp.int32) - 128).sum(-1)

    in_v = (vs >= _WINDOW + _STEP) & (vs <= H - _WINDOW - 1 - _STEP)    # [nv]

    def cost_scan(Bq, Bt, sign):
        """cost[nv, C, D] for query blocks Bq [64, nv, C] against target Bt
        at columns c + sign*d; per-d column shifts are dynamic_slices of a
        padded copy (not gathers) for TPU speed."""
        if sign < 0:
            Bt_pad = jnp.pad(Bt, ((0, 0), (0, 0), (D, 0)))
        else:
            Bt_pad = jnp.pad(Bt, ((0, 0), (0, 0), (0, D)))

        def body(d, _):
            offset = d if sign > 0 else D - d
            shifted = jax.lax.dynamic_slice_in_dim(Bt_pad, offset, W, axis=2)
            diff = jnp.abs(Bq - shifted).sum(0, dtype=jnp.int32)
            return d + 1, diff
        _, out = jax.lax.scan(body, 0, None, length=D)
        return jnp.moveaxis(out, 0, -1)     # [nv, W, D]

    # ---- left image match at ALL columns of the grid rows ----
    costL = cost_scan(B1v, B2v, -1)         # match left col c to right c-d
    u_all = jnp.arange(W)
    dmaxL = jnp.minimum(params.disp_max, u_all - _WINDOW - _STEP)       # [W]
    validL = (ds[None, :] <= dmaxL[:, None]) & (ds[None, :] >= params.disp_min)
    okL_col = (
        (u_all >= _WINDOW + _STEP) & (u_all <= W - _WINDOW - 1 - _STEP)
        & (dmaxL - params.disp_min >= 10)
    )
    min1, d1, min2, cnt = _best_two(costL, validL[None, :, :])
    accL = (
        okL_col[None, :] & in_v[:, None]
        & (tex1 >= params.support_texture)
        & (cnt >= 2)
        & (min1.astype(jnp.float32)
           < params.support_threshold * min2.astype(jnp.float32))
    )
    dL_all = jnp.where(accL, d1, -1)        # [nv, W]

    # ---- right image match at ALL columns of the grid rows ----
    costR = cost_scan(B2v, B1v, +1)         # match right col c to left c+d
    dmaxR = jnp.minimum(params.disp_max, W - u_all - _WINDOW - _STEP)
    validR = (ds[None, :] <= dmaxR[:, None]) & (ds[None, :] >= params.disp_min)
    okR_col = (
        (u_all >= _WINDOW + _STEP) & (u_all <= W - _WINDOW - 1 - _STEP)
        & (dmaxR - params.disp_min >= 10)
    )
    r1, rd1, r2, rcnt = _best_two(costR, validR[None, :, :])
    accR = (
        okR_col[None, :] & in_v[:, None]
        & (tex2 >= params.support_texture)
        & (rcnt >= 2)
        & (r1.astype(jnp.float32)
           < params.support_threshold * r2.astype(jnp.float32))
    )
    dR_all = jnp.where(accR, rd1, -1)       # [nv, W]

    # ---- forward-backward consistency on the grid columns ----
    dg = dL_all[:, us]                      # [nv, nu]
    back_col = jnp.clip(us[None, :] - dg, 0, W - 1)
    d2 = jnp.take_along_axis(dR_all, back_col, axis=1)
    ok = (dg >= 0) & (d2 >= 0) & (jnp.abs(dg - d2) <= params.lr_threshold)
    dcan = jnp.where(ok, dg, -1).astype(jnp.int16)

    out = jnp.zeros((ncv, ncu), jnp.int16)  # calloc border semantics
    return out.at[1:, 1:].set(dcan)


# ---------------------------------------------------------------------------
# host-side sequential pruning (exact reference semantics)
# ---------------------------------------------------------------------------

def remove_inconsistent_support_points(
    D_can: np.ndarray, params: ElasParams = ElasParams()
) -> np.ndarray:
    """In-place sequential port of elas.cpp:153-179 (scan order u outer)."""
    D = D_can  # mutated in place like the reference
    ncv, ncu = D.shape
    win, thr, min_s = (params.incon_window_size, params.incon_threshold,
                       params.incon_min_support)
    for u in range(ncu):
        u0, u1 = max(u - win, 0), min(u + win, ncu - 1)
        for v in range(ncv):
            d = D[v, u]
            if d >= 0:
                v0, v1 = max(v - win, 0), min(v + win, ncv - 1)
                nb = D[v0:v1 + 1, u0:u1 + 1]
                support = ((nb >= 0) & (np.abs(nb - d) <= thr)).sum()
                if support < min_s:
                    D[v, u] = -1
    return D


def remove_redundant_support_points(
    D_can: np.ndarray, redun_max_dist: int = 5, redun_threshold: int = 1,
    vertical: bool = True,
) -> np.ndarray:
    """In-place sequential port of elas.cpp:181-235."""
    D = D_can
    ncv, ncu = D.shape
    dirs = [(-1, 0), (1, 0)] if vertical else [(0, -1), (0, 1)]
    for u in range(ncu):
        for v in range(ncv):
            d = D[v, u]
            if d < 0:
                continue
            redundant = True
            for dv, du in dirs:
                support = False
                v2, u2 = v, u
                for _ in range(redun_max_dist):
                    v2 += dv
                    u2 += du
                    if not (0 <= v2 < ncv and 0 <= u2 < ncu):
                        break
                    d2 = D[v2, u2]
                    if d2 >= 0 and abs(int(d) - int(d2)) <= redun_threshold:
                        support = True
                        break
                if not support:
                    redundant = False
                    break
            if redundant:
                D[v, u] = -1
    return D


def add_corner_support_points(
    support: np.ndarray, width: int, height: int
) -> np.ndarray:
    """elas.cpp:237-267 (MIDDLEBURY add_corners): nearest-neighbor corner
    points plus two right-image corners."""
    corners = np.array(
        [[0, 0], [0, height - 1], [width - 1, 0], [width - 1, height - 1]],
        dtype=np.int64,
    )
    extra = []
    for cu, cv in corners:
        dd = (support[:, 0] - cu) ** 2 + (support[:, 1] - cv) ** 2
        best = support[np.argmin(dd), 2] if len(support) else 0
        extra.append([cu, cv, best])
    extra.append([extra[2][0] + extra[2][2], extra[2][1], extra[2][2]])
    extra.append([extra[3][0] + extra[3][2], extra[3][1], extra[3][2]])
    return np.concatenate([support, np.array(extra, support.dtype)], axis=0)


def collect_support_points(
    D_can: np.ndarray, params: ElasParams = ElasParams(),
    width: int = 0, height: int = 0,
) -> np.ndarray:
    """Prune + collect (u, v, d) support points in reference vector order."""
    D = np.array(D_can, dtype=np.int16)
    remove_inconsistent_support_points(D, params)
    remove_redundant_support_points(D, 5, 1, True)
    remove_redundant_support_points(D, 5, 1, False)
    step = effective_stepsize(params)
    ncv, ncu = D.shape
    pts = []
    for u_can in range(1, ncu):       # reference order: u outer (elas.cpp:426)
        for v_can in range(1, ncv):
            if D[v_can, u_can] >= 0:
                pts.append((u_can * step, v_can * step, int(D[v_can, u_can])))
    out = np.array(pts, dtype=np.int32).reshape(-1, 3)
    if params.add_corners and width and height:
        out = add_corner_support_points(out, width, height)
    return out


def prune_support_parallel(D_can: jnp.ndarray,
                           params: ElasParams = ElasParams()) -> jnp.ndarray:
    """Device-side parallel pruning (fast path): identical neighborhoods,
    single-shot (no sequential in-place effects)."""
    D = D_can.astype(jnp.int32)
    win = params.incon_window_size
    valid = D >= 0
    Dp = jnp.pad(D, win, constant_values=-1)
    support = jnp.zeros_like(D)
    ncv, ncu = D.shape
    for dv in range(-win, win + 1):
        for du in range(-win, win + 1):
            nb = Dp[win + dv:win + dv + ncv, win + du:win + du + ncu]
            support += ((nb >= 0)
                        & (jnp.abs(nb - D) <= params.incon_threshold))
    keep = valid & (support >= params.incon_min_support)
    return jnp.where(keep, D, -1).astype(jnp.int16)
