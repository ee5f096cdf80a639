"""Round-2 perf measurements on real TPU: ELAS e2e, SGM 1280x960,
fused gen-pcl path, BM at D=256."""
import sys
import time

import numpy as np


def _timeit(fn, sync, iters=8, repeats=3):
    fn(); sync()  # warm
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main(which):
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import (BMParams, ElasParams, PipelineParams,
                                   SGMParams)
    from jackal_tpu.pipeline.default import default_calibration
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    rng = np.random.default_rng(0)
    calib = default_calibration()

    if which == "elas":
        from jackal_tpu.matching.elas.pipeline import elas_match_batch_device
        B, H, W = 32, 480, 640
        # realistic textured scene (random noise is adversarial for the
        # support stage: every 5th pixel matches -> ~12K support points vs
        # the ~1.5-4K of real imagery)
        z = np.load("tests/fixtures/elas_golden_s640_boxes.npz")
        lb = jnp.asarray(np.broadcast_to(z["left"], (B, H, W)).copy())
        rb = jnp.asarray(np.broadcast_to(z["right"], (B, H, W)).copy())
        p = ElasParams()
        acc = [None]

        def run():
            D1, _ = elas_match_batch_device(lb, rb, p, chunk=4)
            acc[0] = D1

        def sync():
            float(acc[0].sum())

        dt = _timeit(run, sync, iters=4, repeats=3)
        print(f"ELAS e2e batched B={B} 640x480: {dt*1000/B:.2f} ms/frame "
              f"= {B/dt:.1f} fps")

    elif which == "sgm":
        B, H, W = 4, 960, 1280
        params = PipelineParams(calib_im_size=(640, 360), im_width=W,
                                im_height=H, crop_im_width=W,
                                crop_im_height=H)
        pipe = StereoPipeline(calib, params, engine="sgm",
                              sgm_params=SGMParams(disp_num=64))
        lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        out = [None]

        def run():
            dm, sc = pipe.process_batch_fused(lb, rb)
            out[0] = dm

        def sync():
            float(out[0].sum())

        dt = _timeit(run, sync, iters=4, repeats=3)
        print(f"SGM fused B={B} 1280x960/64: {dt*1000/B:.2f} ms/frame "
              f"= {B/dt:.1f} fps")

    elif which == "pcl":
        B, H, W = 32, 480, 640
        params = PipelineParams(calib_im_size=(640, 360), im_width=W,
                                im_height=H, crop_im_width=W,
                                crop_im_height=H, gen_pcl=True)
        pipe = StereoPipeline(calib, params, engine="bm",
                              bm_params=BMParams(disp_num=64))
        lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        out = [None]

        def run():
            dm, cloud, sc = pipe.process_batch_fused_pcl(lb, rb)
            out[0] = (dm, sc.scan)

        def sync():
            float(out[0][0].sum() + out[0][1].sum())

        dt = _timeit(run, sync, iters=8, repeats=3)
        print(f"BM fused+PCL B={B} 640x480/64: {dt*1000/B:.3f} ms/frame "
              f"= {B/dt:.1f} fps")

    elif which == "bm256":
        B, H, W = 16, 480, 640
        params = PipelineParams(calib_im_size=(640, 360), im_width=W,
                                im_height=H, crop_im_width=W,
                                crop_im_height=H)
        pipe = StereoPipeline(calib, params, engine="bm",
                              bm_params=BMParams(disp_num=256))
        lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
        out = [None]

        def run():
            dm, sc = pipe.process_batch_fused(lb, rb)
            out[0] = dm

        def sync():
            float(out[0].sum())

        dt = _timeit(run, sync, iters=8, repeats=3)
        print(f"BM fused B={B} 640x480/D=256: {dt*1000/B:.3f} ms/frame "
              f"= {B/dt:.1f} fps")


if __name__ == "__main__":
    main(sys.argv[1])
