"""Feature-matching and confidence-check experiment modules."""
import numpy as np

from jackal_tpu.calib import load_calibration
from jackal_tpu.experiments.confidence import (
    cache_waypoint_coords,
    confidence_check,
    desc_cost,
)
from jackal_tpu.experiments.feature_matching import match_features
from jackal_tpu.geometry.rectify import stereo_rectify

REF_CALIB = "/root/reference/calibration/amrl_jackal_webcam_stereo.yml"


def test_feature_matching_on_shifted_scene():
    """A purely-translated stereo pair must match with consistent disparity."""
    z = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    left, right = z["left"], z["right"]
    pl, pr = match_features(left, right, max_corners=300)
    assert len(pl) > 30
    d = pl[:, 0] - pr[:, 0]
    dv = np.abs(pl[:, 1] - pr[:, 1])
    # epipolar: v must agree; disparity positive and in scene range
    good = (dv <= 1) & (d > 0) & (d < 80)
    assert good.mean() > 0.7


def test_waypoint_projection_in_image():
    c = load_calibration(REF_CALIB)
    r = stereo_rectify(c.K1, c.D1, c.K2, c.D2, (640, 360), c.R, c.T,
                       True, 0.0, (320, 180))
    pl, pr = cache_waypoint_coords(c.XR, c.XT, r.P1, r.P2)
    assert pl.shape == pr.shape and pl.shape[1] == 2
    inb = ((pl[:, 0] >= 0) & (pl[:, 0] < 320)
           & (pl[:, 1] >= 0) & (pl[:, 1] < 180))
    assert inb.mean() > 0.5  # ground grid ahead mostly visible


def test_confidence_check_flags_mismatches():
    z = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    left, right = z["left"], z["right"]
    H, W = left.shape
    rng = np.random.default_rng(0)
    n = 50
    pts_l = np.stack([rng.integers(20, W - 20, n),
                      rng.integers(20, H - 20, n)], axis=-1)
    d_true = z["d_true"][pts_l[:, 1], pts_l[:, 0]].round().astype(int)
    pts_r_good = pts_l - np.stack([d_true, np.zeros(n, int)], axis=-1)
    pts_r_bad = pts_l - np.stack([d_true + 25, np.zeros(n, int)], axis=-1)
    flags_good = confidence_check(left, right, pts_l, pts_r_good)
    flags_bad = confidence_check(left, right, pts_l, pts_r_bad)
    assert flags_good.mean() < 0.3          # correct matches: low cost
    assert flags_bad.mean() > flags_good.mean() + 0.3
