"""Geometry layer vs OpenCV (cv2 used as oracle only)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from jackal_tpu.calib import load_calibration, save_calibration, StereoCalibration
from jackal_tpu.geometry.rectify import (
    init_undistort_rectify_map,
    rodrigues,
    stereo_rectify,
    undistort_points,
)
from jackal_tpu.geometry.remap import remap_bilinear
from jackal_tpu.geometry.reproject import (
    compose_rotation_cam_to_robot,
    reproject_disparity_to_robot,
    robot_to_cam_pixel,
)

REF_CALIB = "/root/reference/calibration/amrl_jackal_webcam_stereo.yml"


@pytest.fixture(scope="module")
def calib():
    return load_calibration(REF_CALIB)


def test_load_calibration(calib):
    fs = cv2.FileStorage(REF_CALIB, cv2.FILE_STORAGE_READ)
    for name in ["K1", "K2", "D1", "D2", "R", "XR", "XT"]:
        ref = fs.getNode(name).mat()
        mine = getattr(calib, name)
        assert np.allclose(ref.reshape(mine.shape), mine, atol=0), name
    np.testing.assert_allclose(np.linalg.norm(calib.T), 0.0940632, atol=1e-6)


def test_save_roundtrip(calib, tmp_path):
    p = str(tmp_path / "c.yml")
    save_calibration(p, calib)
    c2 = load_calibration(p)
    for name in ["K1", "K2", "D1", "D2", "R", "T", "XR", "XT"]:
        np.testing.assert_array_equal(getattr(calib, name), getattr(c2, name))
    # cv2 can read what we write
    fs = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
    np.testing.assert_allclose(fs.getNode("K1").mat(), calib.K1)


def test_rodrigues_roundtrip(rng):
    for _ in range(20):
        rv = rng.normal(size=3)
        R = rodrigues(rv)
        Rcv, _ = cv2.Rodrigues(rv)
        np.testing.assert_allclose(R, Rcv, atol=1e-12)
        rv2 = rodrigues(R)
        np.testing.assert_allclose(rv2, cv2.Rodrigues(R)[0].ravel(), atol=1e-10)


def test_undistort_points_matches_cv2(calib, rng):
    pts = rng.random((50, 2)) * np.array([640, 360])
    res = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        True, 0.0, (320, 180),
    )
    mine = undistort_points(pts, calib.K1, calib.D1, R=res.R1, P=res.P1)
    ref = cv2.undistortPoints(
        pts.reshape(-1, 1, 2), calib.K1, calib.D1, R=res.R1, P=res.P1
    ).reshape(-1, 2)
    np.testing.assert_allclose(mine, ref, atol=1e-9)


def test_stereo_rectify_matches_cv2(calib):
    mine = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        zero_disparity=True, alpha=0.0, new_image_size=(320, 180),
    )
    R1, R2, P1, P2, Q = cv2.stereoRectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R,
        calib.T.reshape(3, 1), flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        newImageSize=(320, 180),
    )[:5]
    np.testing.assert_allclose(mine.R1, R1, atol=1e-12)
    np.testing.assert_allclose(mine.R2, R2, atol=1e-12)
    # principal points exact; focal within 1.5% (OpenCV 5 changed the
    # alpha=0 inner-rectangle heuristic; we match the classic algorithm)
    np.testing.assert_allclose(mine.P1[:2, 2], P1[:2, 2], atol=1e-5)
    np.testing.assert_allclose(mine.P1[0, 0], P1[0, 0], rtol=0.015)
    np.testing.assert_allclose(
        mine.P2[0, 3] / mine.P2[0, 0], P2[0, 3] / P2[0, 0], rtol=1e-6
    )
    np.testing.assert_allclose(mine.Q[3, 2], Q[3, 2], rtol=1e-9)


def test_stereo_rectify_no_alpha_matches_cv2_exactly(calib):
    """With alpha=-1 (no scaling) everything must match tightly."""
    mine = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        zero_disparity=True, alpha=-1.0, new_image_size=(320, 180),
    )
    R1, R2, P1, P2, Q = cv2.stereoRectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R,
        calib.T.reshape(3, 1), flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1,
        newImageSize=(320, 180),
    )[:5]
    np.testing.assert_allclose(mine.P1, P1, atol=1e-4)
    np.testing.assert_allclose(mine.P2, P2, atol=1e-4)
    np.testing.assert_allclose(mine.Q, Q, atol=1e-4)


def test_rectify_random_calibrations():
    """Fuzz vs cv2 across random stereo rigs (alpha=-1, exact path)."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        K = np.array([[450 + rng.random() * 50, 0, 310 + rng.random() * 20],
                      [0, 450 + rng.random() * 50, 170 + rng.random() * 20],
                      [0, 0, 1.0]])
        K2 = K + np.diag(rng.random(3))
        D1 = rng.normal(scale=0.05, size=5)
        D2 = rng.normal(scale=0.05, size=5)
        R = cv2.Rodrigues(rng.normal(scale=0.02, size=3))[0]
        T = np.array([-0.1, 0.002, 0.001]) + rng.normal(scale=0.002, size=3)
        mine = stereo_rectify(K, D1, K2, D2, (640, 360), R, T, True, -1.0)
        ref = cv2.stereoRectify(
            K, D1, K2, D2, (640, 360), R, T.reshape(3, 1),
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1,
        )
        np.testing.assert_allclose(mine.R1, ref[0], atol=1e-10)
        np.testing.assert_allclose(mine.R2, ref[1], atol=1e-10)
        np.testing.assert_allclose(mine.P1, ref[2], atol=1e-4)
        np.testing.assert_allclose(mine.P2, ref[3], atol=1e-4)


def test_init_undistort_rectify_map_matches_cv2(calib):
    res = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        True, 0.0, (320, 180),
    )
    for K, D, R, P in [
        (calib.K1, calib.D1, res.R1, res.P1),
        (calib.K2, calib.D2, res.R2, res.P2),
    ]:
        mx, my = init_undistort_rectify_map(K, D, R, P, (320, 180))
        cmx, cmy = cv2.initUndistortRectifyMap(
            K, D, R, P, (320, 180), cv2.CV_32FC1
        )
        np.testing.assert_allclose(mx, cmx, atol=2e-4)
        np.testing.assert_allclose(my, cmy, atol=2e-4)


def test_remap_matches_cv2(calib, rng):
    img = (rng.random((360, 640)) * 255).astype(np.uint8)
    res = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        True, 0.0, (320, 180),
    )
    mx, my = init_undistort_rectify_map(calib.K1, calib.D1, res.R1, res.P1,
                                        (320, 180))
    mine = np.asarray(remap_bilinear(img, mx, my))
    ref = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
    # OpenCV uses 5-bit fixed-point interpolation; allow quantization slack
    diff = np.abs(mine.astype(int) - ref.astype(int))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.01


def test_reproject_matches_reference_loop(calib):
    """reproject_disparity_to_robot vs a literal port of the C++ loop."""
    res = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        True, 0.0, (320, 180),
    )
    Q, XR, XT = res.Q, calib.XR, calib.XT
    H, W = 12, 16
    rs = np.random.RandomState(0)
    dmap = rs.randint(3, 255, size=(H, W)).astype(np.float64)
    X, Y, Z = reproject_disparity_to_robot(
        dmap.astype(np.float32), Q.astype(np.float32),
        XR.astype(np.float32), XT.astype(np.float32), 2, 3)
    for i in range(W):
        for j in range(H):
            V = np.array([i + 2, j + 3, dmap[j, i], 1.0])
            pos = Q @ V
            p = pos[:3] / pos[3]
            pr = XR @ p + XT
            np.testing.assert_allclose(
                [X[j, i], Y[j, i], Z[j, i]], pr, rtol=2e-5)


def test_compose_rotation(calib):
    R = compose_rotation_cam_to_robot(1.3, -3.14, 1.57)
    # orthonormal and equals Z*Y*X elementary product
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    # spot value vs direct computation
    import math
    cz, sz = math.cos(np.float32(1.57)), math.sin(np.float32(1.57))
    assert abs(R[1, 0] - sz * math.cos(np.float32(-3.14))) < 1e-9


def test_robot_to_cam_projection_roundtrip(calib):
    res = stereo_rectify(
        calib.K1, calib.D1, calib.K2, calib.D2, (640, 360), calib.R, calib.T,
        True, 0.0, (320, 180),
    )
    pts = np.array([[1.0, 0.0, 0.0], [1.5, 0.2, 0.1]])
    px = robot_to_cam_pixel(pts, calib.XR, calib.XT, res.P1)
    assert px.shape == (2, 2)
    # a point straight ahead at ground level should project inside the image
    assert 0 <= px[0, 0] < 320 and 0 <= px[0, 1] < 180
