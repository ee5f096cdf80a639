"""Diagnostic: which part of the BM Pallas kernel dominates. Not a test.

Clones the production pallas_call wiring exactly; `mode` only gates which
per-d compute runs inside the loop.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jackal_tpu.ops.pallas import bm_kernel as bk

_BIG = 1 << 24
_M = 128


def diag_kernel(l_hbm, r_hbm, dl_ref, dr_ref,
                l_vmem, r_vmem, r32_scr, ad_scr, cost_scr, dr_scr, sem,
                *, D, r, TH, W, W_real, uniqueness, lr_threshold, mode):
    b = pl.program_id(0)
    i = pl.program_id(1)
    THH = TH + 2 * r
    r_vmem[:, 0:_M] = jnp.zeros((THH, _M), jnp.uint8)
    ad_scr[:, 0:_M] = jnp.zeros((THH, _M), jnp.int32)
    ad_scr[:, _M + W:] = jnp.zeros((THH, _M), jnp.int32)
    cost_scr[:, _M + W:] = jnp.full((TH, _M), _BIG, jnp.int32)

    copy_l = pltpu.make_async_copy(
        l_hbm.at[b, pl.ds(i * TH, THH), :], l_vmem, sem.at[0])
    copy_r = pltpu.make_async_copy(
        r_hbm.at[b, pl.ds(i * TH, THH), :], r_vmem.at[:, pl.ds(_M, W)],
        sem.at[1])
    copy_l.start()
    copy_r.start()
    copy_l.wait()
    copy_r.wait()

    r32_scr[:] = r_vmem[:].astype(jnp.int32)
    L = l_vmem[:].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)

    wl = bk._WTA((TH, W))
    wr = bk._WTA((TH, W))
    acc = jnp.zeros((TH, W), jnp.int32)

    for d in range(D):
        Rs = r32_scr[:, _M - d:_M - d + W]
        ad_scr[:, _M:_M + W] = jnp.abs(L - Rs)
        adp = ad_scr[:]
        if mode != "nobox":
            h = adp[:, _M - r:_M - r + W]
            for k in range(1, 2 * r + 1):
                h = h + adp[:, _M - r + k:_M - r + k + W]
            cost = h[0:TH, :]
            for k in range(1, 2 * r + 1):
                cost = cost + h[k:k + TH, :]
        else:
            cost = adp[0:TH, _M:_M + W]
        if mode == "boxonly":
            acc = acc + cost
            continue
        if d > 0:
            cost = jnp.where(col >= d, cost, _BIG)
        wl.update(cost, d, D)
        if mode == "onewta":
            continue
        cost_scr[:, _M:_M + W] = cost
        cost_r = cost_scr[:, _M + d:_M + d + W]
        wr.update(cost_r, d, D)

    if mode == "boxonly":
        dl_ref[0] = acc.astype(jnp.float32)
        dr_ref[0] = acc.astype(jnp.float32)
        return
    dl = wl.finish(D, uniqueness)
    dr = dl if mode == "onewta" else wr.finish(D, uniqueness)
    dl_ref[0] = dl
    dr_ref[0] = dr


def run(mode, lb, rb, params, tile_h=24):
    B, H, W = lb.shape
    D = params.disp_num
    r = params.window // 2
    TH = tile_h
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    Wp = -(-W // 128) * 128

    @jax.jit
    def go(left_u8, right_u8):
        lpad = jnp.pad(left_u8, ((0, 0), (r, Hp - H + r), (0, Wp - W)))
        rpad = jnp.pad(right_u8, ((0, 0), (r, Hp - H + r), (0, Wp - W)))
        kern = functools.partial(
            diag_kernel, D=D, r=r, TH=TH, W=Wp, W_real=W,
            uniqueness=params.uniqueness, lr_threshold=params.lr_threshold,
            mode=mode)
        spec = pl.BlockSpec((1, TH, Wp), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
        dl, dr = pl.pallas_call(
            kern,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((TH + 2 * r, Wp), jnp.uint8),
                pltpu.VMEM((TH + 2 * r, _M + Wp), jnp.uint8),
                pltpu.VMEM((TH + 2 * r, _M + Wp), jnp.int32),
                pltpu.VMEM((TH + 2 * r, _M + Wp + _M), jnp.int32),
                pltpu.VMEM((TH, _M + Wp + _M), jnp.int32),
                pltpu.VMEM((TH, _M + Wp + _M), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(lpad, rpad)
        return dl, dr

    out = go(lb, rb)
    float(out[0].sum())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [go(lb, rb) for _ in range(8)]
        float(outs[-1][0].sum())
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    print(f"{mode:10s} {best*1e3:8.3f} ms/batch", flush=True)


def main():
    from jackal_tpu.config import BMParams
    B, H, W = 64, 480, 640
    params = BMParams(disp_num=64)
    rng = np.random.default_rng(0)
    lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    for mode in sys.argv[1:] or ("full", "onewta", "boxonly", "nobox"):
        run(mode, lb, rb, params)


if __name__ == "__main__":
    main()
