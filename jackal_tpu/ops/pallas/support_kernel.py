"""Pallas kernel for ELAS support-point matching (computeSupportMatches).

Reference: elas.cpp:269-443. The jnp engine (matching/elas/support.py)
computes two dense [nv, W, D] cost volumes with a lax.scan over d — ~16 ms
per 640x480 frame. This kernel streams the same costs through VMEM and
keeps only the running best/second-best keys, for BOTH image directions in
one pass:

  - the 4-block 64-byte SAD at grid row v decomposes as
      cost(c, d) = S(v-2, c-2, d) + S(v-2, c+2, d)
                 + S(v+2, c-2, d) + S(v+2, c+2, d)
    where S is the 16-channel descriptor SAD; stacking the v-2 / v+2 rows
    as 32 channels turns that into ONE 32-channel SAD per (c, d) plus two
    column rolls — half the arithmetic of the direct 64-channel form;
  - the right-image match shares values with the left via
      cost_R(c, d) = cost_L(c+d, d)
    (a lane roll), so the backwards pass of the L/R consistency check costs
    two rolls + one WTA update instead of a second cost volume;
  - per direction the kernel tracks the two smallest keys cost*512 + d
    (ascending-d visit order -> lowest-d tie-break, matching the
    reference's strict-< best/second bookkeeping, elas.cpp:354-362).

The wrapper reproduces support_candidates' acceptance tests (texture,
candidate-count, ratio test, column/row bounds, forward-backward check)
bit-exactly from the four key maps; all thresholds stay in XLA where they
fuse for free.

Mosaic notes follow bm_kernel.py: loop-carried rolled int32 target
registers (no unaligned u8 lane reads), 128-aligned lane dims.

The d loop is chunked onto a THIRD grid dimension (innermost, so chunks
execute in ascending-d order) instead of being fully unrolled: Mosaic
compile time is super-linear in straight-line program length, and the
reference search range D=256 unrolled (~15k vector ops) takes the
compiler tens of minutes, while a 32-wide chunk compiles in seconds.
The four best/second-best key maps accumulate across chunk steps in the
output blocks, whose index maps ignore the chunk axis — Pallas keeps a
block VMEM-resident over consecutive grid steps with the same indices,
so the accumulation is free. Within a chunk every column shift is the
same static roll-by-one as before; only the chunk's base offset is a
dynamic roll. The sequential best/second update order (ascending d) is
preserved exactly, so outputs are bit-identical to the unrolled form.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ElasParams
from ...matching.elas.support import effective_stepsize

_KBIG = 1 << 24   # > max key (16320*512 + 255); python int, not a tracer
_GAP = 5          # window(3) + u_step(2): min margin to the image edge


def _support_kernel(q_ref, t_ref, l1_ref, l2_ref, r1_ref, r2_ref,
                    *, D, disp_min, TN, W, W_real, DCH, M=4):
    """One row-band x one d-chunk: dual best-two keyed WTA over
    d in [disp_min + dc*DCH, ...); state accumulates in the out refs.

    Roll elision (q-pairing): the SAD at disparity d+j decomposes as
      S_{d+j}(c) = sum_ch |q(c) - t(c-d-j)| = R_j(c-j),
      R_j(u) = sum_ch |q(u+j) - t_d(u)|,
    so with the j pre-rolled queries q_j = roll(q, -j) (built ONCE per
    chunk), one t alignment serves M consecutive disparities and the
    32-channel t roll runs once per M steps instead of every step. The
    residual roll-by-j of R_j is absorbed into the two cost taps
    (roll(S, +-2) -> roll(R_j, j +- 2)) at zero extra cost. Circular
    wrap is identical to the rolled-t form (both are mod-W), so outputs
    stay bit-exact; rolls were ~30% of the kernel's vector issues."""
    C = q_ref.shape[1]                      # 32 = 16 chans x {v-2, v+2}
    dc = pl.program_id(2)
    d0 = disp_min + dc * DCH                # dynamic chunk base
    qj = [[q_ref[0, c].astype(jnp.int32) for c in range(C)]]
    for j in range(1, M):
        qj.append([pltpu.roll(x, W - 1, 1) for x in qj[-1]])
    # one dynamic roll per channel re-bases the target at this chunk;
    # every per-macro-step shift below stays a static roll-by-M
    t = [pltpu.roll(t_ref[0, c].astype(jnp.int32), d0 % W, 1)
         for c in range(C)]
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1)

    @pl.when(dc == 0)
    def _init():
        big = jnp.full((TN, W), _KBIG, jnp.int32)
        l1_ref[0] = big
        l2_ref[0] = big
        r1_ref[0] = big
        r2_ref[0] = big

    l1, l2 = l1_ref[0], l2_ref[0]
    r1, r2 = r1_ref[0], r2_ref[0]

    for i0 in range(0, DCH, M):
        for j in range(min(M, DCH - i0)):
            d = d0 + i0 + j                 # dynamic scalar
            s = jnp.zeros((TN, W), jnp.int32)
            for c in range(C):
                s = s + jnp.abs(qj[j][c] - t[c])
            # cost(c) = S(c-2) + S(c+2), S = roll(R_j, j): merged taps
            cost = (pltpu.roll(s, j + 2, 1)
                    + pltpu.roll(s, (W + j - 2) % W, 1))
            live = d < D                    # partial-final-chunk mask

            # left image at column c matches right column c-d: c >= d+5
            key = jnp.where(live & (col >= d + _GAP), cost * 512 + d,
                            _KBIG)
            l2 = jnp.minimum(l2, jnp.maximum(l1, key))
            l1 = jnp.minimum(l1, key)

            # right image at column c matches left column c+d:
            # cost_R(c, d) = cost_L(c+d, d), valid c <= W_real - 5 - d
            cost_r = pltpu.roll(cost, (W - d) % W, 1)
            key_r = jnp.where(live & (col <= W_real - _GAP - d),
                              cost_r * 512 + d, _KBIG)
            r2 = jnp.minimum(r2, jnp.maximum(r1, key_r))
            r1 = jnp.minimum(r1, key_r)
        t = [pltpu.roll(x, M, 1) for x in t]

    l1_ref[0] = l1
    l2_ref[0] = l2
    r1_ref[0] = r1
    r2_ref[0] = r2


def _grid_row_blocks(desc: jnp.ndarray, step: int, ncv: int) -> jnp.ndarray:
    """[B, H, W, 16] -> [B, 32, nv, W] uint8: rows vs-2 and vs+2 stacked
    channel-major, vs = (1..ncv-1)*step. Strided static slices, no gather."""
    B, H, W, C = desc.shape
    nv = ncv - 1
    need = (ncv - 1) * step + 2 + 1
    if need > H:
        desc = jnp.pad(desc, ((0, 0), (0, need - H), (0, 0), (0, 0)),
                       constant_values=128)
    rm = desc[:, step - 2::step][:, :nv]     # rows vs-2
    rp = desc[:, step + 2::step][:, :nv]     # rows vs+2
    both = jnp.concatenate([rm, rp], axis=-1)        # [B, nv, W, 32]
    return jnp.moveaxis(both, -1, 1)                 # [B, 32, nv, W]


@functools.partial(jax.jit,
                   static_argnames=("params", "tile_n", "d_chunk"))
def support_candidates_pallas(
    desc1: jnp.ndarray, desc2: jnp.ndarray,
    params: ElasParams = ElasParams(), tile_n: int = 16,
    d_chunk: int = 32,
) -> jnp.ndarray:
    """Batched candidate grid [B, ncv, ncu] int16 — identical output to
    vmap(support_candidates) (matching/elas/support.py)."""
    B, H, W, _ = desc1.shape
    step = effective_stepsize(params)
    ncu = -(-W // step)
    ncv = -(-H // step)
    nv = ncv - 1
    D = params.disp_max + 1

    Q = _grid_row_blocks(desc1, step, ncv)
    T = _grid_row_blocks(desc2, step, ncv)

    TN = min(tile_n, nv)
    n_bands = -(-nv // TN)
    NVp = n_bands * TN
    Wp = -(-W // 128) * 128
    pad = ((0, 0), (0, 0), (0, NVp - nv), (0, Wp - W))
    Q = jnp.pad(Q, pad)
    T = jnp.pad(T, pad)

    DCH = min(d_chunk, D - params.disp_min)
    n_dchunks = -(-(D - params.disp_min) // DCH)
    kern = functools.partial(
        _support_kernel, D=D, disp_min=params.disp_min, TN=TN, W=Wp,
        W_real=W, DCH=DCH)
    io_spec = pl.BlockSpec((1, 32, TN, Wp), lambda b, i, dc: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TN, Wp), lambda b, i, dc: (b, i, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, NVp, Wp), jnp.int32)
    l1, l2, r1, r2 = pl.pallas_call(
        kern,
        grid=(B, n_bands, n_dchunks),
        in_specs=[io_spec, io_spec],
        out_specs=(out_spec,) * 4,
        out_shape=(shp,) * 4,
    )(Q, T)
    l1, l2 = l1[:, :nv, :W], l2[:, :nv, :W]
    r1, r2 = r1[:, :nv, :W], r2[:, :nv, :W]

    # ---- acceptance tests (identical to the jnp engine's epilogue) ----
    vs = jnp.arange(1, ncv) * step
    us = jnp.arange(1, ncu) * step
    u_all = jnp.arange(W)
    in_v = (vs >= _GAP) & (vs <= H - _GAP - 1)                     # [nv]
    tex1 = jnp.abs(desc1[:, vs].astype(jnp.int32) - 128).sum(-1)   # [B,nv,W]
    tex2 = jnp.abs(desc2[:, vs].astype(jnp.int32) - 128).sum(-1)

    thr = jnp.float32(params.support_threshold)

    def accept(k1, k2, tex, dmax_col, ok_col):
        cnt = jnp.maximum(dmax_col - params.disp_min + 1, 0)
        acc = (
            ok_col[None, None, :] & in_v[None, :, None]
            & (tex >= params.support_texture)
            & (cnt[None, None, :] >= 2)
            & (k1 < _KBIG)
            & ((k1 >> 9).astype(jnp.float32)
               < thr * (k2 >> 9).astype(jnp.float32))
        )
        return jnp.where(acc, k1 & 511, -1)

    dmaxL = jnp.minimum(params.disp_max, u_all - _GAP)
    okL = ((u_all >= _GAP) & (u_all <= W - _GAP - 1)
           & (dmaxL - params.disp_min >= 10))
    dL_all = accept(l1, l2, tex1, dmaxL, okL)                      # [B,nv,W]

    dmaxR = jnp.minimum(params.disp_max, W - u_all - _GAP)
    okR = ((u_all >= _GAP) & (u_all <= W - _GAP - 1)
           & (dmaxR - params.disp_min >= 10))
    dR_all = accept(r1, r2, tex2, dmaxR, okR)

    # forward-backward consistency on the grid columns
    dg = dL_all[:, :, us]                                          # [B,nv,nu]
    back_col = jnp.clip(us[None, None, :] - dg, 0, W - 1)
    d2 = jnp.take_along_axis(dR_all, back_col, axis=2)
    ok = (dg >= 0) & (d2 >= 0) & (jnp.abs(dg - d2) <= params.lr_threshold)
    dcan = jnp.where(ok, dg, -1).astype(jnp.int16)

    out = jnp.zeros((B, ncv, ncu), jnp.int16)    # calloc border semantics
    return out.at[:, 1:, 1:].set(dcan)
