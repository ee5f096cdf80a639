"""Pallas kernel for SGM path aggregation (the 8-path DP wavefront).

The jnp engine (matching/sgm.py) runs 8 sequential lax.scans, each step a
handful of tiny XLA ops on one row — latency-bound (~7 fps at 1280x960/64).
This kernel keeps the whole DP state in VMEM and walks rows inside ONE
fori_loop per direction, fusing up to three paths (vertical + the two
diagonals share a row order) per pass:

  - cost volume layout [B, H, D, W]: each row step works on a [D, W] slab —
    D on sublanes (min over d is a sublane reduction, d+/-1 neighbours are
    static sublane shifts), W on lanes (diagonal carry shifts are lane
    rolls);
  - double-buffered row DMA in, double-buffered row DMA out;
  - `reverse=True` walks rows bottom-up in place of flipping the 300 MB
    volume in HBM;
  - horizontal paths reuse the same kernel on a [B, W, D, H] transpose.

Output is bit-identical to matching.sgm.aggregate_paths (same recurrence,
same BIG clamps, same edge resets; reference semantics documented there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 24


def _sgm_dir_kernel(cost_hbm, out_hbm, ibuf, obuf, isem, osem,
                    *, H, D, W, W_real, p1, p2, shifts, reverse):
    b = pl.program_id(0)
    n_shift = len(shifts)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, W), 1)
    padded = W_real < W

    def row(i):
        return H - 1 - i if reverse else i

    def dma_in(slot, i):
        return pltpu.make_async_copy(
            cost_hbm.at[b, row(i)], ibuf.at[slot], isem.at[slot])

    def dma_out(slot, i):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[b, row(i)], osem.at[slot])

    dma_in(0, 0).start()
    dma_in(0, 0).wait()
    init = jnp.minimum(ibuf[0], _BIG)
    if padded:
        init = jnp.where(col < W_real, init, _BIG)
    obuf[0] = init * n_shift
    dma_out(0, 0).start()
    dma_in(1, 1).start()

    def step(i, carries):
        slot = i % 2
        dma_in(slot, i).wait()
        c = ibuf[slot]

        @pl.when(i + 1 < H)
        def _():
            dma_in((i + 1) % 2, i + 1).start()

        total = jnp.zeros((D, W), jnp.int32)
        new_carries = []
        for p, s in enumerate(shifts):
            prev = carries[p]
            if s:
                prev = pltpu.roll(prev, s if s > 0 else W + s, 1)
                edge = 0 if s == 1 else W_real - 1
                prev = jnp.where(col == edge, _BIG, prev)
            m = jnp.min(prev, axis=0, keepdims=True)            # [1, W]
            up = jnp.concatenate([prev[0:1] + _BIG, prev[0:D - 1]], axis=0)
            dn = jnp.concatenate([prev[1:D], prev[D - 1:D] + _BIG], axis=0)
            best = jnp.minimum(jnp.minimum(prev, m + p2),
                               jnp.minimum(up + p1, dn + p1))
            out = jnp.minimum(c + best - m, _BIG)
            if padded:
                out = jnp.where(col < W_real, out, _BIG)
            new_carries.append(out)
            total = total + out

        # output slot reuse: the DMA issued 2 rows ago must have retired
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()
        obuf[slot] = total
        dma_out(slot, i).start()
        return tuple(new_carries)

    carries = (init,) * n_shift
    carries = jax.lax.fori_loop(1, H, step, carries)
    dma_out((H - 2) % 2, H - 2).wait()
    dma_out((H - 1) % 2, H - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("p1", "p2", "shifts", "reverse"))
def sgm_paths_dir_pallas(cost_bhdw, p1, p2, shifts=(0,), reverse=False):
    """Sum of the DP paths with the given carry shifts, scanning axis 1 of
    [B, H, D, W] (downward, or upward with reverse=True). Returns the same
    layout. Bit-identical to summing matching.sgm._path_scan per shift."""
    B, H, D, W = cost_bhdw.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        cost_bhdw = jnp.pad(cost_bhdw, ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
                            constant_values=_BIG)
    kern = functools.partial(
        _sgm_dir_kernel, H=H, D=D, W=Wp, W_real=W, p1=p1, p2=p2,
        shifts=shifts, reverse=reverse)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, D, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, D, Wp), jnp.int32),
            pltpu.VMEM((2, D, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(cost_bhdw)
    return out[..., :W] if Wp != W else out


def aggregate_paths_pallas_bhdw(cost_bdhw: jnp.ndarray, params
                                ) -> jnp.ndarray:
    """8-path (or 4-path) SGM aggregation, Pallas wavefront engine,
    returning the aggregated volume in [B, H, D, W] layout (the layout the
    WTA kernel consumes — skips a 300 MB moveaxis at 1280x960).

    Vertical+diagonal paths fuse into one down pass and one up pass;
    horizontal paths run on a [B, W, D, H] transpose."""
    p1, p2 = params.p1, params.p2
    c = jnp.moveaxis(cost_bdhw, 1, 2)            # [B, H, D, W]
    shifts = (0, 1, -1) if params.num_paths >= 8 else (0,)
    S = sgm_paths_dir_pallas(c, p1, p2, shifts, False)
    S = S + sgm_paths_dir_pallas(c, p1, p2, shifts, True)
    ct = jnp.transpose(c, (0, 3, 2, 1))          # [B, W, D, H]
    Sh = sgm_paths_dir_pallas(ct, p1, p2, (0,), False)
    Sh = Sh + sgm_paths_dir_pallas(ct, p1, p2, (0,), True)
    return S + jnp.transpose(Sh, (0, 3, 2, 1))   # [B, H, D, W]


def aggregate_paths_pallas(cost_bdhw: jnp.ndarray, params) -> jnp.ndarray:
    """As aggregate_paths_pallas_bhdw but in the reference [B, D, H, W]
    layout, equal to vmap(matching.sgm.aggregate_paths)."""
    return jnp.moveaxis(aggregate_paths_pallas_bhdw(cost_bdhw, params),
                        2, 1)


# ---------------------------------------------------------------------------
# WTA maps kernel: one pass over the aggregated volume
# ---------------------------------------------------------------------------

_INV = 1 << 20


def _wta_maps_kernel(S_hbm, out_hbm, ibuf, obuf, isem, osem,
                     *, H, D, W, W_real):
    """Per image row: the five per-pixel WTA statistics (best cost, best
    disparity, second-best outside +/-1, and the two neighbour costs) for
    BOTH the left view and the right view derived in-register.

    Key identity: SR[d, v, u] = S[d, v, u+d] — the right-view column of a
    pixel lies in the SAME image row, so one [D, W] row slab serves both
    WTAs and the whole volume is read exactly once. The per-row-constant
    left shift by d is applied with log2(D) masked lane rolls. All ops are
    integer min/compare — the float uniqueness/sub-pixel/L-R epilogue
    stays in jnp (matching.sgm), shared verbatim with the scan engine."""
    b = pl.program_id(0)
    ds = jax.lax.broadcasted_iota(jnp.int32, (D, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, W), 1)
    BIG = jnp.int32(_BIG)

    def dma_in(slot, i):
        return pltpu.make_async_copy(
            S_hbm.at[b, i], ibuf.at[slot], isem.at[slot])

    def dma_out(slot, i):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[b, i], osem.at[slot])

    def wta5(s, out, base):
        best = jnp.min(s, axis=0, keepdims=True)                  # [1, W]
        bd = jnp.min(jnp.where(s == best, ds, D), axis=0,
                     keepdims=True)                               # argmin
        near = jnp.abs(ds - bd) <= 1
        second = jnp.min(jnp.where(near, BIG, s), axis=0, keepdims=True)
        cm = jnp.min(jnp.where(ds == bd - 1, s, BIG), axis=0,
                     keepdims=True)
        cp = jnp.min(jnp.where(ds == bd + 1, s, BIG), axis=0,
                     keepdims=True)
        out[base + 0] = best[0]
        out[base + 1] = bd[0]
        out[base + 2] = second[0]
        out[base + 3] = cm[0]
        out[base + 4] = cp[0]

    def step(i, _):
        slot = i % 2
        dma_in(slot, i).wait()
        s = ibuf[slot]

        @pl.when(i + 1 < H)
        def _():
            dma_in((i + 1) % 2, i + 1).start()

        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        wta5(s, obuf.at[slot], 0)
        # right-view slab: roll row d left by d (log-decomposed — the
        # shift is row-constant so masked uniform rolls compose exactly)
        sr = s
        k = 1
        while k < D:
            sr = jnp.where((ds & k) != 0, pltpu.roll(sr, W - k, 1), sr)
            k <<= 1
        sr = jnp.where(col >= W_real - ds, jnp.int32(_INV), sr)
        wta5(sr, obuf.at[slot], 5)
        dma_out(slot, i).start()
        return 0

    dma_in(0, 0).start()
    jax.lax.fori_loop(0, H, step, 0)
    dma_out((H - 2) % 2, H - 2).wait()
    dma_out((H - 1) % 2, H - 1).wait()


@jax.jit
def sgm_wta_maps_pallas(S_bhdw: jnp.ndarray) -> jnp.ndarray:
    """[B, H, D, W] aggregated volume -> [B, H, 10, W] int32 WTA maps:
    (best, best_d, second, cost_minus, cost_plus) for the left view then
    the right view. One volume read total. (The row stack is padded to 16
    in VMEM/HBM — Mosaic requires sublane extents aligned to the tile of
    8 — and sliced back here.)"""
    B, H, D, W = S_bhdw.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        S_bhdw = jnp.pad(S_bhdw, ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
                         constant_values=_INV)
    kern = functools.partial(_wta_maps_kernel, H=H, D=D, W=Wp, W_real=W)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, 16, Wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, D, Wp), jnp.int32),
            pltpu.VMEM((2, 16, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(S_bhdw)
    out = out[:, :, :10]
    return out[..., :W] if Wp != W else out
