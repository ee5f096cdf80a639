"""Headline benchmark: stereo frames/sec/chip over the FULL reference path.

Measures the fused batched step rect -> dense disparity -> 3D point cloud
(robot frame, packed RGB channel) -> obstacle scan — the complete
point_cloud.cpp per-frame pipeline including the gen-pcl cloud export
(point_cloud.cpp:298-404) — at 640x480, batch 32 (BASELINE config 5).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline number plus a "metrics" array tracking the secondary engines so
regressions are visible to the driver record every round:

  - ELAS (the reference's actual engine, disparity 0-255) e2e fps at
    640x480 on the fixture scene, plus its RMSE vs the golden produced by
    an instrumented reference libelas build;
  - SGM 1280x960 / D=64 fused fps;
  - BM at the full reference search range D=256, fused fps.

Baseline: the reference publishes no numeric fps (BASELINE.md); the rebuild
target is >= 500 stereo fps/chip at 640x480 on v5e-1, so vs_baseline is
fps/500.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def _timeit(run, sync, iters, repeats):
    run()
    sync()
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        sync()
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def _fixture_batch(jnp, B, H, W):
    """MIXED-content stereo batch: the synthetic boxes scene and the
    photographic pair interleaved (VERDICT r3 weak #4 — ELAS wall clock
    is content-dependent by design via the dead d-chunk skip, so a
    content-identical batch flatters the number). Returns the two golden
    records, device batches, and the per-frame scene index."""
    zs = [np.load(os.path.join(ROOT, "tests/fixtures", f))
          for f in ("elas_golden_s640_boxes.npz", "elas_golden_photo.npz")]
    scene = np.arange(B) % len(zs)
    lb = jnp.asarray(np.stack([zs[s]["left"] for s in scene]))
    rb = jnp.asarray(np.stack([zs[s]["right"] for s in scene]))
    return zs, scene, lb, rb


def bench_headline(jnp, calib, B=32):
    """Full reference path at batch B. B=32 is the headline (BASELINE
    config 5 specifies 32-frame batches); B=64 is reported as an extra
    metric — dispatch/RTT amortization is worth ~20% on this tunnel."""
    from jackal_tpu.config import BMParams, PipelineParams
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    H, W = 480, 640
    params = PipelineParams(
        calib_im_size=(640, 360), im_width=W, im_height=H,
        crop_im_width=W, crop_im_height=H, gen_pcl=True)
    pipe = StereoPipeline(calib, params, engine="bm",
                          bm_params=BMParams(disp_num=64))
    _, _, lb, rb = _fixture_batch(jnp, B, H, W)
    out = [None]

    def run():
        dm, cloud, sc = pipe.process_batch_fused_pcl(lb, rb)
        out[0] = (dm.sum().astype(jnp.float32) + sc.scan.sum()
                  + cloud[0][..., 0].sum())

    def sync():
        float(out[0])

    dt = _timeit(run, sync, iters=16, repeats=3)
    return B / dt


def _stream_fps(pairs_fn, p, B, NB):
    """Steady-state fps of elas_match_stream over NB batches (first two
    are pipeline fill, excluded), best of two passes; returns the last
    batch's D1 as well."""
    from jackal_tpu.matching.elas.pipeline import elas_match_stream

    best = None
    D1 = None
    for _ in range(2):
        t_start = None
        n_done = 0
        for i, (D1, D2) in enumerate(
                elas_match_stream(pairs_fn(), p, chunk=4)):
            float(D1.sum())               # consume like a real subscriber
            if i == 1:
                t_start = time.perf_counter()
            elif i > 1:
                n_done += 1
        dt = (time.perf_counter() - t_start) / n_done
        best = dt if best is None else min(best, dt)
    return B / best, D1


def bench_elas(jnp):
    """ELAS steady-state streaming throughput on a MIXED-content batch
    (the production shape: point_cloud.cpp consumes a camera stream,
    elas.cpp:32-151 runs per frame). Two numbers:

      - device-resident inputs, matching the other configs (the axon
        tunnel's ~50 MB/s host link is a dev-harness artifact, not TPU
        I/O);
      - host-ingest: numpy batches uploaded per batch inside the stream
        (the reference ingests host bytes, point_cloud.cpp:431-448) —
        tunnel-bound on this rig, tracked so the caveat is a number
        (VERDICT r3 missing #3).

    Accuracy is checked on EVERY frame of the last batch against its
    scene's libelas golden (VERDICT r3 weak #6)."""
    from jackal_tpu.config import ElasParams

    B, H, W = 32, 480, 640
    NB = 10
    zs, scene, lb, rb = _fixture_batch(jnp, B, H, W)
    p = ElasParams()

    fps_dev, D1 = _stream_fps(lambda: ((lb, rb) for _ in range(NB)), p,
                              B, NB)

    lh, rh = np.asarray(lb), np.asarray(rb)
    fps_host, _ = _stream_fps(lambda: ((lh.copy(), rh.copy())
                                       for _ in range(NB)), p, B, NB)

    D1h = np.asarray(D1)
    ses, maxes, agrees = [], [], []
    for b in range(B):
        ref = zs[scene[b]]["D1"]
        both = (D1h[b] >= 0) & (ref >= 0)
        err = D1h[b][both] - ref[both]
        ses.append((err ** 2).sum())
        maxes.append(both.sum())
        agrees.append(np.mean((D1h[b] >= 0) == (ref >= 0)))
    rmse = float(np.sqrt(np.sum(ses) / max(np.sum(maxes), 1)))
    mask_agree = float(np.mean(agrees))
    return fps_dev, fps_host, rmse, mask_agree


def bench_engine_accuracy(jnp):
    """BM/SGM disparity RMSE + valid-mask agreement vs the libelas goldens,
    pooled over the boxes and photographic scenes (VERDICT r3 item 2: the
    composed >=500 fps / <=0.5 px target must be evaluated on one path).
    BM-64 is the headline-bench engine config; SGM at D=128 covers the
    scenes' full disparity range. Per-scene numbers: docs/results.md."""
    from jackal_tpu.config import BMParams, SGMParams
    from jackal_tpu.matching.bm import bm_match_batch
    from jackal_tpu.matching.sgm import sgm_match_batch

    zs = [np.load(os.path.join(ROOT, "tests/fixtures", f))
          for f in ("elas_golden_s640_boxes.npz", "elas_golden_photo.npz")]

    def pooled(fn):
        se, n, agree, tot = 0.0, 0, 0.0, 0
        for z in zs:
            D = np.asarray(fn(jnp.asarray(z["left"][None]),
                              jnp.asarray(z["right"][None]))[0][0])
            ref = z["D1"]
            both = (D >= 0) & (ref >= 0)
            err = D[both] - ref[both]
            se += float((err ** 2).sum())
            n += int(both.sum())
            agree += float(((D >= 0) == (ref >= 0)).sum())
            tot += ref.size
        return float(np.sqrt(se / max(n, 1))), agree / tot

    bm_rmse, bm_agree = pooled(
        lambda a, b: bm_match_batch(a, b, BMParams(disp_num=64)))
    sgm_rmse, sgm_agree = pooled(
        lambda a, b: sgm_match_batch(a, b, SGMParams(disp_num=128)))
    return bm_rmse, bm_agree, sgm_rmse, sgm_agree


def bench_elas_cli(jnp):
    """The NODE as the measured path (VERDICT r4 next #2): runs the
    point_cloud CLI loop itself — StreamingRunner over elas_match_stream
    with per-frame bus publishing — on an NPZ replay source at 640x480
    through an identity rectification (zero-distortion calib whose maps
    are exactly the identity, so the ELAS content matches the fixture
    scenes). Host-ingest semantics: raw frames upload per batch and every
    frame's depth map downloads for publishing, so the comparable bench
    number is elas_e2e_fps_host_ingest (the tunnel's ~50 MB/s host link
    bounds both; on PCIe hosts both transfers hide under device time).
    Reported warm (second run; the first compiles)."""
    import contextlib
    import io
    import re as _re
    import tempfile

    import numpy as np
    from jackal_tpu.calib import StereoCalibration, save_calibration
    from jackal_tpu.pipeline.default import default_calibration

    W, H = 640, 480
    f = 400.0
    K = np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1.0]])
    dc = default_calibration()
    calib = StereoCalibration(K, K, np.zeros(5), np.zeros(5), np.eye(3),
                              np.array([-0.094, 0, 0]), XR=dc.XR, XT=dc.XT)
    zs = [np.load(os.path.join(ROOT, "tests/fixtures", fn))
          for fn in ("elas_golden_s640_boxes.npz", "elas_golden_photo.npz")]
    scene = np.arange(32) % len(zs)
    with tempfile.TemporaryDirectory() as td:
        yml = os.path.join(td, "ident.yml")
        npz = os.path.join(td, "replay.npz")
        save_calibration(yml, calib)
        np.savez(npz, left=np.stack([zs[s]["left"] for s in scene]),
                 right=np.stack([zs[s]["right"] for s in scene]))
        from jackal_tpu.cli.point_cloud import main as cli_main

        def run(n):
            args = ["--engine", "elas", "--batch", "32", "--size",
                    f"{W}x{H}", "--source", npz, "--loop", "--frames",
                    str(n), "-c", yml]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                cli_main(args)
            m = _re.search(r"-> ([0-9.]+) fps", buf.getvalue())
            return float(m.group(1))

        run(64)            # compile + warm
        return run(320)    # steady state


def bench_sgm(jnp, calib):
    from jackal_tpu.config import PipelineParams, SGMParams
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    B, H, W = 4, 960, 1280
    params = PipelineParams(calib_im_size=(640, 360), im_width=W,
                            im_height=H, crop_im_width=W, crop_im_height=H)
    pipe = StereoPipeline(calib, params, engine="sgm",
                          sgm_params=SGMParams(disp_num=64))
    rng = np.random.default_rng(0)
    lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    out = [None]

    def run():
        dm, sc = pipe.process_batch_fused(lb, rb)
        out[0] = dm

    def sync():
        float(out[0].sum())

    dt = _timeit(run, sync, iters=4, repeats=2)
    return B / dt


def bench_bm256(jnp, calib):
    from jackal_tpu.config import BMParams, PipelineParams
    from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

    B, H, W = 16, 480, 640
    params = PipelineParams(calib_im_size=(640, 360), im_width=W,
                            im_height=H, crop_im_width=W, crop_im_height=H)
    pipe = StereoPipeline(calib, params, engine="bm",
                          bm_params=BMParams(disp_num=256))
    _, _, lb, rb = _fixture_batch(jnp, B, H, W)
    out = [None]

    def run():
        dm, sc = pipe.process_batch_fused(lb, rb)
        out[0] = dm

    def sync():
        float(out[0].sum())

    dt = _timeit(run, sync, iters=8, repeats=2)
    return B / dt


def main():
    import jax.numpy as jnp
    from jackal_tpu.pipeline.default import default_calibration

    calib = default_calibration()

    fps = bench_headline(jnp, calib)
    fps64 = bench_headline(jnp, calib, B=64)
    elas_fps, elas_host_fps, elas_rmse, elas_mask = bench_elas(jnp)
    elas_cli_fps = bench_elas_cli(jnp)
    sgm_fps = bench_sgm(jnp, calib)
    bm256_fps = bench_bm256(jnp, calib)
    bm_rmse, bm_agree, sgm_rmse, sgm_agree = bench_engine_accuracy(jnp)

    # composed north-star metric (VERDICT r4 next #4): the fastest engine
    # configuration that ALSO meets the accuracy clause (RMSE <= 0.5 px vs
    # libelas). Today that is ELAS (bit-equal); BM-64 at 2.3 px and SGM at
    # 5 px fail the clause, so the BM headline above tracks raw fused
    # throughput while this line prices the actual target.
    composed = elas_fps if elas_rmse <= 0.5 else 0.0

    record = {
        "metric": "stereo_fps_per_chip_640x480_rect_disp_cloud_scan",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
        "metrics": [
            {"metric": "composed_target_fps_rmse_le_0.5px",
             "value": round(composed, 2), "unit": "frames/s",
             "vs_baseline": round(composed / 500.0, 3)},
            {"metric": "headline_b64_fps", "value": round(fps64, 2),
             "unit": "frames/s", "vs_baseline": round(fps64 / 500.0, 3)},
            {"metric": "elas_e2e_fps_640x480_d255", "value": round(elas_fps, 2),
             "unit": "frames/s", "vs_baseline": round(elas_fps / 500.0, 3)},
            {"metric": "elas_rmse_vs_libelas_px", "value": round(elas_rmse, 4),
             "unit": "px", "vs_baseline": round(elas_rmse / 0.5, 4)},
            {"metric": "elas_valid_mask_agreement",
             "value": round(elas_mask, 5), "unit": "frac", "vs_baseline": 1.0},
            {"metric": "elas_e2e_fps_host_ingest",
             "value": round(elas_host_fps, 2), "unit": "frames/s",
             "vs_baseline": round(elas_host_fps / 500.0, 3)},
            {"metric": "elas_cli_node_fps_host_ingest",
             "value": round(elas_cli_fps, 2), "unit": "frames/s",
             "vs_baseline": round(elas_cli_fps / 500.0, 3)},
            {"metric": "bm_rmse_vs_libelas_px", "value": round(bm_rmse, 3),
             "unit": "px", "vs_baseline": round(bm_rmse / 0.5, 3)},
            {"metric": "bm_valid_mask_agreement_vs_libelas",
             "value": round(bm_agree, 4), "unit": "frac", "vs_baseline": 1.0},
            {"metric": "sgm_rmse_vs_libelas_px", "value": round(sgm_rmse, 3),
             "unit": "px", "vs_baseline": round(sgm_rmse / 0.5, 3)},
            {"metric": "sgm_valid_mask_agreement_vs_libelas",
             "value": round(sgm_agree, 4), "unit": "frac",
             "vs_baseline": 1.0},
            {"metric": "sgm_fused_fps_1280x960_d64", "value": round(sgm_fps, 2),
             "unit": "frames/s", "vs_baseline": round(sgm_fps / 500.0, 3)},
            {"metric": "bm_fused_fps_640x480_d256",
             "value": round(bm256_fps, 2), "unit": "frames/s",
             "vs_baseline": round(bm256_fps / 500.0, 3)},
        ],
    }
    print(json.dumps(record))

    # keep README's measured numbers in sync with the bench that just ran
    # (VERDICT r4 weak #4: README rot — regeneration must be hooked to the
    # END of a round, i.e. to every bench run, not a manual step). Writes
    # only the repo README; any failure is non-fatal and the JSON line
    # above is already out. Disable with JACKAL_BENCH_NO_README=1.
    if not os.environ.get("JACKAL_BENCH_NO_README"):
        try:
            import contextlib
            import io
            import tempfile
            sys.path.insert(0, os.path.join(ROOT, "tools"))
            import update_readme
            with tempfile.NamedTemporaryFile("w", suffix=".json",
                                             delete=False) as f:
                json.dump(record, f)
                tmp = f.name
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                sys.argv = ["update_readme", "--bench-json", tmp]
                update_readme.main()
            os.unlink(tmp)
            print("README.md regenerated from this run", file=sys.stderr)
        except Exception as e:  # pragma: no cover - best effort
            print(f"README regen skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
