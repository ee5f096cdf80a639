"""Pallas block-matching kernel: VMEM-resident SAD + dual streaming WTA.

The jnp BM engine materializes a [D, H, W] cost volume in HBM; at batch 32
that is ~2.5 GB of traffic per step and dominates runtime. This kernel
keeps everything in VMEM: each grid step DMAs one row-band (plus box-filter
halo) of the stereo pair, loops over disparities computing the box-filtered
SAD in registers, and tracks — for BOTH images in the same pass, using the
identity cost_R(u, d) = cost_L(u+d, d) —

  - the best key (cost*D + d  ->  WTA with smallest-d tie-break),
  - the costs at best_d-1 / best_d+1 (streaming capture) for parabolic
    sub-pixel,
  - the top-4 keys, from which the uniqueness "second best outside +/-1 of
    best" is exact (the 3 in-window disparities can occupy at most 3 slots),

writing only the two final float32 disparity maps. Output matches
matching.bm's WTA semantics bit-for-bit.

Mosaic notes: shifts are STATIC slices of zero-margined VMEM scratch
buffers or pltpu.roll (no jnp.pad/concat inside the kernel); lane-dim
DMA/store offsets are 128-aligned; the d loop is fully unrolled at trace
time, two disparities per iteration with their ADs packed into the lo/hi
int16 halves of one int32 so the box filter's unaligned lane slices (the
dominant cost) are paid once per pair.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import BMParams

_M = 128         # lane-dim margin: Mosaic needs 128-aligned DMA/store offsets


def _margin(D: int) -> int:
    """Lane-dim zero margin for shift-by-d slice reads: at least D (the
    largest static left-shift taken) rounded up to the 128 lane tiling.
    D <= 128 keeps the historical 128-lane margin; D = 256 (the reference's
    full ELAS search range, elas.h:93-94) gets a 256-lane margin."""
    return -(-max(D, _M) // _M) * _M


def _big(D: int) -> int:
    """Invalid-cost sentinel: larger than any real box-sum cost (255*25*2 <
    2^24) but small enough that the WTA key sentinel*D + d stays well under
    int32 overflow at the maximum D the kernel supports (mesh.py uses the
    same clamp for its sharded WTA)."""
    return min(1 << 24, ((1 << 30) // D) - 1)


class _WTA:
    """Streaming winner-take-all state over the unrolled d loop."""

    def __init__(self, shape, big):
        self.big = big
        self.best = jnp.full(shape, big, jnp.int32)
        self.cm = jnp.full(shape, big, jnp.int32)
        self.cp = jnp.full(shape, big, jnp.int32)
        self.take_cp = jnp.zeros(shape, jnp.bool_)
        self.t1 = jnp.full(shape, big, jnp.int32)
        self.t2 = jnp.full(shape, big, jnp.int32)
        self.t3 = jnp.full(shape, big, jnp.int32)
        self.prev = jnp.full(shape, big, jnp.int32)

    def update(self, cost, d, D):
        key = cost * D + d
        improved = key < self.best
        self.cm = jnp.where(improved, self.prev, self.cm)
        self.cp = jnp.where(self.take_cp, cost, self.cp)
        self.take_cp = improved
        # top-4: best tracked separately; t1..t3 = next three keys
        k0 = jnp.where(improved, self.best, key)   # loser of the best duel
        self.best = jnp.where(improved, key, self.best)
        m = k0 < self.t1
        self.t1, k0 = jnp.where(m, k0, self.t1), jnp.where(m, self.t1, k0)
        m = k0 < self.t2
        self.t2, k0 = jnp.where(m, k0, self.t2), jnp.where(m, self.t2, k0)
        m = k0 < self.t3
        self.t3 = jnp.where(m, k0, self.t3)
        self.prev = cost

    def finish(self, D, uniqueness):
        best_d = self.best % D
        best_c = self.best // D
        sec = jnp.where(
            jnp.abs(self.t1 % D - best_d) > 1, self.t1 // D,
            jnp.where(jnp.abs(self.t2 % D - best_d) > 1, self.t2 // D,
                      self.t3 // D))
        unique = best_c.astype(jnp.float32) < uniqueness * \
            sec.astype(jnp.float32)
        den = self.cm + self.cp - 2 * best_c
        offs = jnp.where(
            (best_d > 0) & (best_d < D - 1) & (den > 0),
            (self.cm - self.cp).astype(jnp.float32)
            / (2.0 * den.astype(jnp.float32)),
            0.0)
        return jnp.where(unique & (self.best < self.big),
                         best_d.astype(jnp.float32) + offs, -1.0)


def _bm_band_kernel(l_hbm, r_hbm, dl_ref, dr_ref,
                    l_vmem, r_vmem, r32_scr, ad_scr, dr_scr, sem,
                    *, D, r, TH, W, W_real, uniqueness, lr_threshold, M):
    assert D <= M
    BIG = _big(D)
    b = pl.program_id(0)
    i = pl.program_id(1)
    THH = TH + 2 * r
    # r_vmem [THH, M+W]: cols [0,M) zero -> shift-by-d reads are slices.
    # ad_scr [THH, M+W+M]: zero margins for the horizontal box.
    r_vmem[:, 0:M] = jnp.zeros((THH, M), jnp.uint8)
    ad_scr[:, 0:M] = jnp.zeros((THH, M), jnp.int32)
    ad_scr[:, M + W:] = jnp.zeros((THH, M), jnp.int32)

    copy_l = pltpu.make_async_copy(
        l_hbm.at[b, pl.ds(i * TH, THH), :], l_vmem, sem.at[0])
    copy_r = pltpu.make_async_copy(
        r_hbm.at[b, pl.ds(i * TH, THH), :], r_vmem.at[:, pl.ds(M, W)],
        sem.at[1])
    copy_l.start()
    copy_r.start()
    copy_l.wait()
    copy_r.wait()

    # widen R once: int32 slices per d beat unaligned u8 slices, which
    # Mosaic realigns through materialized copies
    r32_scr[:] = r_vmem[:].astype(jnp.int32)

    L = l_vmem[:].astype(jnp.int32)          # [THH, W]
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
    col_full = jax.lax.broadcasted_iota(jnp.int32, (THH, W), 1)
    padded = W_real < W   # trace-time: skip lane-pad masking when W is
    # already a 128 multiple (the 640-wide production case)

    wl = _WTA((TH, W), BIG)
    wr = _WTA((TH, W), BIG)

    # Two disparities per pass, packed into the lo/hi int16 halves of one
    # int32: a 5x5 box sum of 8-bit ADs is at most 255*25 < 2^15, so the
    # halves cannot carry into each other. This halves the unaligned lane
    # slices + adds of the box filter, the kernel's dominant cost.
    for d0 in range(0, D, 2):
        dual = d0 + 1 < D
        ad = jnp.abs(L - r32_scr[:, M - d0:M - d0 + W])
        if dual:
            ad = ad + (jnp.abs(
                L - r32_scr[:, M - d0 - 1:M - d0 - 1 + W]) << 16)
        # zero the AD over the lane-padding columns so the box filter sees
        # the same zero border as the unpadded jnp engine
        ad_scr[:, M:M + W] = \
            jnp.where(col_full < W_real, ad, 0) if padded else ad
        adp = ad_scr[:]
        h = adp[:, M - r:M - r + W]
        for k in range(1, 2 * r + 1):
            h = h + adp[:, M - r + k:M - r + k + W]
        hv = h[0:TH, :]
        for k in range(1, 2 * r + 1):
            hv = hv + h[k:k + TH, :]
        for d in range(d0, d0 + 2) if dual else (d0,):
            cost = (hv & 0xFFFF) if d == d0 else (hv >> 16)
            # validity: u-d >= 0, and u < W_real (lane padding is invalid)
            valid = (col >= d) & (col < W_real) if padded else col >= d
            if d > 0 or padded:
                cost = jnp.where(valid, cost, BIG)
            wl.update(cost, d, D)

            # right image: cost_R(u, d) = cost_L(u+d, d) — a lane roll with
            # the wrapped/out-of-range tail forced to BIG
            cost_r = pltpu.roll(cost, W - d, 1) if d > 0 else cost
            cost_r = jnp.where(col >= W_real - d, BIG, cost_r)
            wr.update(cost_r, d, D)

    dl = wl.finish(D, uniqueness)
    dr = wr.finish(D, uniqueness)

    # left/right consistency in-kernel: dr is already resident, and the
    # bounded per-pixel lookup dr[u - s] is a cheap shift-select in VMEM
    dr_scr[:, M:M + W] = dr
    uw = jnp.clip((col - dl).astype(jnp.int32), 0, W_real - 1)
    s = jnp.clip(col - uw, 0, D)
    other = jnp.full((TH, W), -2.0, jnp.float32)
    for k in range(D + 1):
        other = jnp.where(s == k, dr_scr[:, M - k:M - k + W], other)
    ok = (dl >= 0) & (other >= 0) & \
        (jnp.abs(other - dl) <= lr_threshold)
    dl_ref[0] = jnp.where(ok, dl, -1.0)
    dr_ref[0] = dr


@functools.partial(jax.jit, static_argnames=("params", "tile_h"))
def bm_match_pallas(
    left_u8: jnp.ndarray, right_u8: jnp.ndarray,
    params: BMParams = BMParams(), tile_h: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both WTA disparities [B, H, W] float32 (-1 invalid), one fused pass.

    tile_h 0 picks a row-band height by disparity range: the kernel's live
    vector state (WTA duels + the unrolled shift-select sweeps) scales with
    TH*D, and the Mosaic scoped-vmem stack limit (~16 MB) binds at D=256
    with the D=64 default of 40 rows."""
    B, H, W = left_u8.shape
    D = params.disp_num
    r = params.window // 2
    TH = tile_h if tile_h else max(8, ((40 * 64 // D) // 8) * 8)
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    # lane dim must be a multiple of the 128 tiling; right-pad with zeros
    # (identical to the box filter's zero border semantics)
    Wp = -(-W // 128) * 128
    lpad = jnp.pad(left_u8, ((0, 0), (r, Hp - H + r), (0, Wp - W)))
    rpad = jnp.pad(right_u8, ((0, 0), (r, Hp - H + r), (0, Wp - W)))

    M = _margin(D)
    kern = functools.partial(
        _bm_band_kernel, D=D, r=r, TH=TH, W=Wp, W_real=W,
        uniqueness=params.uniqueness, lr_threshold=params.lr_threshold, M=M)
    spec = pl.BlockSpec((1, TH, Wp), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    dl, dr = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * r, Wp), jnp.uint8),
            pltpu.VMEM((TH + 2 * r, M + Wp), jnp.uint8),
            pltpu.VMEM((TH + 2 * r, M + Wp), jnp.int32),
            pltpu.VMEM((TH + 2 * r, M + Wp + M), jnp.int32),
            pltpu.VMEM((TH, M + Wp + M), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(lpad, rpad)
    return dl[:, :H, :W], dr[:, :H, :W]


def bm_left_disparity_pallas(left_u8, right_u8, params=BMParams(),
                             tile_h: int = 48):
    """Back-compat wrapper returning only the left disparity."""
    return bm_match_pallas(left_u8, right_u8, params, tile_h)[0]
