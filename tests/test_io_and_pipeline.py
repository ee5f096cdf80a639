"""Topic bus, time logs, PGM, replay, pipeline engines, parallel step."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax

from jackal_tpu.calib import load_calibration
from jackal_tpu.config import BMParams, PipelineParams, SGMParams
from jackal_tpu.io_bus.bus import TopicBus
from jackal_tpu.io_bus.pgm import load_pgm, save_pgm
from jackal_tpu.io_bus.replay import StereoReplaySource
from jackal_tpu.io_bus.timelog import TimeLogWriter
from jackal_tpu.pipeline.default import DEFAULT_CALIB, make_pipeline
from jackal_tpu.pipeline.frame_pipeline import StereoPipeline

REF_CALIB = "/root/reference/calibration/amrl_jackal_webcam_stereo.yml"


def test_topic_bus_pubsub_and_backpressure():
    bus = TopicBus()
    got = []
    bus.subscribe("/t", got.append)
    sub = bus.subscribe_queue("/t", maxlen=1)
    pub = bus.advertise("/t")
    pub.publish(1)
    pub.publish(2)
    assert got == [1, 2]
    assert len(sub) == 1 and sub.pop() == 2  # drop-stale queue-size-1
    assert sub.pop() is None
    assert bus.latest("/t") == 2


def test_timelog_format_matches_plot_scripts(tmp_path):
    f = tmp_path / "dmap.txt"
    with TimeLogWriter(dmap_file=str(f)) as w:
        w.log("dmap", 0.015)
        w.log("dmap", 0.017)
    lines = f.read_text().splitlines()
    # the exact format scripts/plot-component.py consumes: float(line)
    times = [float(x.strip()) for x in lines]
    assert times == [0.015, 0.017]


def test_pgm_roundtrip(tmp_path):
    img = np.arange(40, dtype=np.uint8).reshape(5, 8)
    p = str(tmp_path / "x.pgm")
    save_pgm(p, img)
    np.testing.assert_array_equal(load_pgm(p), img)
    img16 = (np.arange(40, dtype=np.uint16) * 500).reshape(5, 8)
    save_pgm(p, img16)
    np.testing.assert_array_equal(load_pgm(p), img16)


def test_replay_npz(tmp_path):
    z = str(tmp_path / "s.npz")
    np.savez(z, left=np.zeros((2, 4, 6), np.uint8),
             right=np.ones((2, 4, 6), np.uint8))
    src = StereoReplaySource(z)
    pairs = list(src)
    assert len(pairs) == 2 and pairs[0][1].max() == 1


def test_default_calibration_bundled():
    c = load_calibration(DEFAULT_CALIB)
    ref = load_calibration(REF_CALIB)
    np.testing.assert_array_equal(c.K1, ref.K1)
    np.testing.assert_array_equal(c.XR, ref.XR)


@pytest.mark.parametrize("engine", ["bm", "sgm"])
def test_pipeline_fused_engines(engine):
    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    pipe = make_pipeline(None, engine)
    # feed pre-rectified synthetic frames as if raw 640x360 (resize by tile)
    rng = np.random.default_rng(0)
    lraw = (rng.random((360, 640)) * 255).astype(np.uint8)
    rraw = (rng.random((360, 640)) * 255).astype(np.uint8)
    fr = pipe.process_frame(lraw, rraw)
    assert fr.dmap.shape == (180, 320) and fr.dmap.dtype == np.uint8
    assert np.asarray(fr.scan.scan).shape == (90,)
    dm, sc = pipe.process_batch_fused(np.stack([lraw] * 2),
                                      np.stack([rraw] * 2))
    assert dm.shape == (2, 180, 320)


def test_pipeline_elas_engine_on_fixture():
    """ELAS engine through the pipeline on true stereo content."""
    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    c = load_calibration(REF_CALIB)
    pipe = StereoPipeline(c, PipelineParams(), engine="elas")
    # bypass rectification (fixture is already epipolar-aligned):
    import jax.numpy as jnp
    from jackal_tpu.matching.elas.pipeline import elas_match
    D1, _ = elas_match(g["left"][:180, :320], g["right"][:180, :320])
    dmap = np.clip(np.round(D1), 0, 255).astype(np.uint8)
    from jackal_tpu.scan.obstacle import obstacle_scan_from_disparity
    res = obstacle_scan_from_disparity(
        jnp.asarray(dmap), pipe.valid_disp, pipe.Q32, pipe.XR32, pipe.XT32)
    assert np.asarray(res.scan).shape == (90,)


def test_live_extrinsic_update_changes_scan():
    """update_extrinsics (dynamic_reconfigure analogue) must take effect on
    the already-jitted scan stage: recomposed XR/XT + refreshed valid-disp
    cache change the scan output mid-run (point_cloud.cpp:305-311)."""
    pipe = make_pipeline(None, "bm")
    rng = np.random.default_rng(7)
    lraw = (rng.random((360, 640)) * 255).astype(np.uint8)
    rraw = np.roll(lraw, 5, axis=1)
    fr1 = pipe.process_frame(lraw, rraw)
    fb1, _ = pipe.process_batch_fused(lraw[None], rraw[None])
    # tilt the camera->robot rotation hard: scans must differ
    pipe.update_extrinsics((0.6, -2.5, 1.0), (0.0, 0.0, 0.5))
    fr2 = pipe.process_frame(lraw, rraw)
    _, sc2 = pipe.process_batch_fused(lraw[None], rraw[None])
    s1, s2 = np.asarray(fr1.scan.scan), np.asarray(fr2.scan.scan)
    assert not np.array_equal(s1, s2)
    # the fused batch path must see the update too (regression: jit closure
    # capture of XR32 would freeze the old extrinsics)
    np.testing.assert_array_equal(np.asarray(sc2.scan[0]), s2)


def test_cli_reconfig_poll_applies_live(tmp_path):
    """--reconfig JSON edits apply between frames in -m mode."""
    import json
    import subprocess
    import sys as _sys
    cfg = tmp_path / "ext.json"
    cfg.write_text(json.dumps(
        {"phi": [1.3, -3.14, 1.57], "trans": [0.0, 0.0, 0.28]}))
    env = dict(os.environ, JACKAL_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [_sys.executable, "-m", "jackal_tpu.cli.point_cloud",
         "--engine", "bm", "--frames", "2", "--source", "synthetic",
         "-m", "--reconfig", str(cfg)],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "Rotation matrix" in out.stdout


def test_partial_height_mode():
    pipe = make_pipeline(None, "bm",
                         PipelineParams(crop_im_height=60))
    rng = np.random.default_rng(1)
    fr = pipe.process_frame(
        (rng.random((360, 640)) * 255).astype(np.uint8),
        (rng.random((360, 640)) * 255).astype(np.uint8))
    assert fr.dmap.shape == (60, 320)


def test_multichip_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


def test_graft_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()


def test_cli_point_cloud_elas_on_fixture(tmp_path):
    """Full CLI run with the ELAS engine on real stereo content via NPZ
    replay: raw 640x360 frames -> rectified 320x180 -> ELAS -> scan."""
    import jax.numpy as jnp
    from jackal_tpu.cli.point_cloud import main

    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    # embed the rectified-size fixture into a raw-size frame (the pipeline
    # rectifies + crops to 320x180; content is synthetic either way)
    raw_l = np.zeros((2, 360, 640), np.uint8)
    raw_r = np.zeros((2, 360, 640), np.uint8)
    hh, ww = g["left"].shape
    raw_l[:, :hh, :ww] = g["left"]
    raw_r[:, :hh, :ww] = g["right"]
    src = str(tmp_path / "frames.npz")
    np.savez(src, left=raw_l, right=raw_r)
    out = str(tmp_path / "out.npz")
    rc = main(["--engine", "elas", "--source", src, "--frames", "2",
               "--out", out, "-l",
               "-d", str(tmp_path / "d.txt"), "-s", str(tmp_path / "s.txt")])
    assert rc == 0
    z = np.load(out)
    assert z["dmaps"].shape == (2, 180, 320)
    assert z["scans"].shape == (2, 90)
    # plot-compatible time logs written
    assert len(open(tmp_path / "d.txt").read().splitlines()) == 2


def test_pipeline_batch_elas_matches_per_frame():
    """process_batch (engine-agnostic throughput path) == process_frame
    for the ELAS engine: same rectification, disparity u8 and scan."""
    from jackal_tpu.pipeline.default import make_pipeline

    pipe = make_pipeline(None, "elas")
    rng = np.random.default_rng(5)
    lraw = (rng.random((360, 640)) * 255).astype(np.uint8)
    rraw = np.roll(lraw, 4, axis=1)
    dm_b, sc_b = pipe.process_batch(np.stack([lraw] * 2),
                                    np.stack([rraw] * 2))
    fr = pipe.process_frame(lraw, rraw)
    np.testing.assert_array_equal(np.asarray(dm_b)[0], fr.dmap)
    np.testing.assert_array_equal(np.asarray(dm_b)[1], fr.dmap)
    np.testing.assert_allclose(np.asarray(sc_b.scan)[0],
                               np.asarray(fr.scan.scan), rtol=1e-6)
