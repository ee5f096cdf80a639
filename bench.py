"""Headline benchmark: stereo frames/sec/chip, 640x480 pair -> obstacle scan.

End-to-end fused path (rectify -> dense disparity -> obstacle scan) on the
default calibration, batch-32 streaming (BASELINE config 5). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numeric fps (BASELINE.md); the rebuild
target is >= 500 stereo fps/chip at 640x480 on v5e-1, so vs_baseline is
fps/500.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import PipelineParams, SGMParams
    from jackal_tpu.pipeline.default import default_calibration
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    B = 32
    H, W = 480, 640
    calib = default_calibration()
    params = PipelineParams(
        calib_im_size=(640, 360), im_width=W, im_height=H,
        crop_im_width=W, crop_im_height=H)
    pipe = StereoPipeline(calib, params, engine="sgm",
                          sgm_params=SGMParams(disp_num=64))

    rng = np.random.default_rng(0)
    # structured synthetic frames (noise defeats jpeg-ish compressibility
    # but not compute; content does not affect runtime)
    lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))

    step = jax.jit(pipe.process_batch_fused)
    # warmup / compile
    out = step(lb, rb)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(lb, rb)
    jax.block_until_ready(out)
    t1 = time.perf_counter()

    fps = B * iters / (t1 - t0)
    print(json.dumps({
        "metric": "stereo_fps_per_chip_640x480_rect_disp_scan",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
