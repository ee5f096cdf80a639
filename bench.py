"""Headline benchmark: stereo frames/sec/chip over the FULL reference path.

Measures the fused batched step rect -> dense disparity -> 3D point cloud
(robot frame, packed RGB channel) -> obstacle scan — the complete
point_cloud.cpp per-frame pipeline including the gen-pcl cloud export
(point_cloud.cpp:298-404) — at 640x480, batch 32 (BASELINE config 5).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numeric fps (BASELINE.md); the rebuild
target is >= 500 stereo fps/chip at 640x480 on v5e-1, so vs_baseline is
fps/500. Secondary numbers (ELAS engine, SGM 1280x960, BM at the full
D=256 search range) are tracked in docs/results.md and measured by
tools/profile_round2.py.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from jackal_tpu.config import BMParams, PipelineParams
    from jackal_tpu.pipeline.default import default_calibration
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    B = 32
    H, W = 480, 640
    calib = default_calibration()
    params = PipelineParams(
        calib_im_size=(640, 360), im_width=W, im_height=H,
        crop_im_width=W, crop_im_height=H, gen_pcl=True)
    pipe = StereoPipeline(calib, params, engine="bm",
                          bm_params=BMParams(disp_num=64))

    rng = np.random.default_rng(0)
    lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))

    # warmup / compile; sync via value fetch (block_until_ready does not
    # reliably block on the experimental axon platform)
    dm, cloud, sc = pipe.process_batch_fused_pcl(lb, rb)
    float(dm.sum())

    best_dt = None
    for _ in range(3):
        iters = 16
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            dm, cloud, sc = pipe.process_batch_fused_pcl(lb, rb)
            x = (dm.sum().astype(jnp.float32) + sc.scan.sum()
                 + cloud[0][..., 0].sum())
            acc = x if acc is None else acc + x
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        best_dt = dt if best_dt is None else min(best_dt, dt)

    fps = B / best_dt
    print(json.dumps({
        "metric": "stereo_fps_per_chip_640x480_rect_disp_cloud_scan",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
