"""Per-stage profile of the fused bench path (TPU). Not a test."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from jackal_tpu.config import BMParams, PipelineParams
from jackal_tpu.pipeline.default import default_calibration
from jackal_tpu.pipeline.frame_pipeline import StereoPipeline
from jackal_tpu.geometry.remap import remap_bilinear_batch
from jackal_tpu.matching.bm import bm_texture_gate
from jackal_tpu.ops.pallas.bm_kernel import bm_match_pallas

B, H, W = 64, 480, 640
calib = default_calibration()
params = PipelineParams(calib_im_size=(640, 360), im_width=W, im_height=H,
                        crop_im_width=W, crop_im_height=H)
pipe = StereoPipeline(calib, params, engine="bm",
                      bm_params=BMParams(disp_num=64))

rng = np.random.default_rng(0)
lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))


def bench(name, fn, *args, iters=16):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        accs = []
        for _ in range(iters):
            accs.append(fn(*args))
        for o in accs:
            pass
        _sync(accs[-1])
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best*1e3:8.3f} ms/batch  {best*1e3/B:7.4f} ms/frame")
    return fn(*args)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].sum().astype(jnp.float32))


@jax.jit
def stage_remap(lb, rb):
    l = remap_bilinear_batch(lb, *pipe.lmap)
    r = remap_bilinear_batch(rb, *pipe.rmap)
    return l, r


@jax.jit
def stage_kernel(l, r):
    dL, _ = bm_match_pallas(l, r, pipe.bm_params)
    return dL


@jax.jit
def stage_gate(l, dL):
    d = bm_texture_gate(l, dL, pipe.bm_params)
    return jnp.clip(jnp.round(d), 0, 255).astype(jnp.uint8)


@jax.jit
def stage_scan(dmaps):
    return jax.vmap(pipe._scan_stage)(dmaps)


l, r = bench("remap+crop (f32 out)", stage_remap, lb, rb)
dL = bench("bm_match_pallas", stage_kernel, l, r)
dm = bench("texture gate + u8", stage_gate, l, dL)
bench("scan stage", stage_scan, dm)
bench("FULL fused", pipe.process_batch_fused, lb, rb)
