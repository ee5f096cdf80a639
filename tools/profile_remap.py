"""Remap gather-strategy shootout (TPU). Not a test."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from jackal_tpu.config import PipelineParams
from jackal_tpu.pipeline.default import default_calibration
from jackal_tpu.pipeline.frame_pipeline import StereoPipeline
from jackal_tpu.geometry.remap import remap_bilinear_batch

B, H, W = 64, 480, 640
calib = default_calibration()
params = PipelineParams(calib_im_size=(640, 360), im_width=W, im_height=H,
                        crop_im_width=W, crop_im_height=H)
pipe = StereoPipeline(calib, params, engine="bm")
mapx, mapy = pipe.lmap

rng = np.random.default_rng(0)
imgs = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))


def bench(name, fn, *args):
    out = fn(*args)
    float(out.sum().astype(jnp.float32))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(8)]
        float(outs[-1].sum().astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    print(f"{name:24s} {best*1e3:8.3f} ms/batch", flush=True)
    return out


@jax.jit
def current(imgs):
    return remap_bilinear_batch(imgs, mapx, mapy)


def _coeffs():
    x0 = jnp.floor(mapx); y0 = jnp.floor(mapy)
    fx = mapx - x0; fy = mapy - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), fx, fy


@jax.jit
def pair_gather(imgs):
    """Two gathers with trailing slice of 2 along x (taps adjacent in x)."""
    x0, y0, fx, fy = _coeffs()
    Ho, Wo = mapx.shape
    flat = jnp.moveaxis(imgs, 0, -1).reshape(H * W, B)   # [H*W, B]
    # clamp/validity as in remap_bilinear (BORDER_CONSTANT 0)
    def row(yi):
        valid_y = (yi >= 0) & (yi < H)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(x0, 0, W - 1)
        idx = (yc * W + xc).reshape(-1, 1)
        g = jax.lax.gather(
            flat, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2, B), mode="clip")          # [N, 2, B]
        g = g.reshape(Ho, Wo, 2, B).astype(jnp.float32)
        vx0 = (x0 >= 0) & (x0 < W)
        vx1 = (x0 + 1 >= 0) & (x0 + 1 < W)
        a = jnp.where((valid_y & vx0)[..., None], g[:, :, 0, :], 0.0)
        b = jnp.where((valid_y & vx1)[..., None], g[:, :, 1, :], 0.0)
        return a * (1 - fx)[..., None] + b * fx[..., None]
    r0 = row(y0)
    r1 = row(y0 + 1)
    out = r0 * (1 - fy)[..., None] + r1 * fy[..., None]
    out = jnp.round(out).astype(jnp.uint8)
    return jnp.moveaxis(out, -1, 0)


@jax.jit
def quad_gather(imgs):
    """One gather with a (2, 2, B) window from [H, W, B]."""
    x0, y0, fx, fy = _coeffs()
    Ho, Wo = mapx.shape
    src = jnp.moveaxis(imgs, 0, -1)                      # [H, W, B]
    yc = jnp.clip(y0, 0, H - 1)
    xc = jnp.clip(x0, 0, W - 1)
    idx = jnp.stack([yc.ravel(), xc.ravel()], axis=1)    # [N, 2]
    g = jax.lax.gather(
        src, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2, B), mode="clip")              # [N, 2, 2, B]
    g = g.reshape(Ho, Wo, 2, 2, B).astype(jnp.float32)
    vy0 = (y0 >= 0) & (y0 < H); vy1 = (y0 + 1 >= 0) & (y0 + 1 < H)
    vx0 = (x0 >= 0) & (x0 < W); vx1 = (x0 + 1 >= 0) & (x0 + 1 < W)
    w00 = ((1 - fx) * (1 - fy) * (vy0 & vx0))[..., None]
    w01 = (fx * (1 - fy) * (vy0 & vx1))[..., None]
    w10 = ((1 - fx) * fy * (vy1 & vx0))[..., None]
    w11 = (fx * fy * (vy1 & vx1))[..., None]
    out = (g[:, :, 0, 0] * w00 + g[:, :, 0, 1] * w01 +
           g[:, :, 1, 0] * w10 + g[:, :, 1, 1] * w11)
    out = jnp.round(out).astype(jnp.uint8)
    return jnp.moveaxis(out, -1, 0)


a = bench("current (4 gathers)", current, imgs)
b = bench("pair (2 gathers, sz2)", pair_gather, imgs)
c = bench("quad (1 gather, 2x2)", quad_gather, imgs)
print("pair == current:", bool(jnp.all(a == b)),
      " quad == current:", bool(jnp.all(a == c)))
