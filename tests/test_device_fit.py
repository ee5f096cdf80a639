"""Device (softfloat) plane fit must equal the native C++ fit bitwise."""
import numpy as np
import pytest

from jackal_tpu.config import ElasParams
from jackal_tpu.matching.elas.device_fit import fit_planes_device

native = pytest.importorskip("jackal_tpu.native")
if not native.available():
    pytest.skip("native engine unavailable", allow_module_level=True)

from jackal_tpu.matching.elas.native_prior import (  # noqa: E402
    collect_support_points_native, fit_planes_native)
from jackal_tpu.matching.elas.prior import delaunay  # noqa: E402


def _fixture_support():
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    z = np.load(os.path.join(here, "fixtures", "elas_golden_s640_boxes.npz"))
    import jax.numpy as jnp
    from jackal_tpu.ops.descriptor import create_descriptor
    from jackal_tpu.matching.elas.support import support_candidates
    p = ElasParams()
    d1 = create_descriptor(jnp.asarray(z["left"]), False)
    d2 = create_descriptor(jnp.asarray(z["right"]), False)
    dcan = np.asarray(support_candidates(d1, d2, p))
    return collect_support_points_native(dcan, p, 640, 480)


def test_fit_planes_device_matches_native_fixture():
    support = _fixture_support()
    for right_pts in (False, True):
        pts = support[:, :2].astype(np.float32)
        if right_pts:
            pts = np.stack([support[:, 0] - support[:, 2],
                            support[:, 1]], -1).astype(np.float32)
        tri = delaunay(pts)
        want = fit_planes_native(support, tri)
        got = np.asarray(fit_planes_device(support, tri))
        np.testing.assert_array_equal(got.view(np.int32),
                                      want.view(np.int32))


def test_fit_planes_device_degenerate_and_ties():
    # collinear triangles (singular), repeated coordinates (pivot ties),
    # zero-disparity planes
    support = np.array([
        [100, 100, 10],
        [200, 100, 10],
        [300, 100, 10],    # collinear row
        [100, 200, 20],
        [100, 300, 30],    # collinear col with 0
        [200, 200, 15],
        [200, 300, 15],
        [640, 480, 255],
        [0, 0, 0],
        [5, 7, 3],
    ], np.int32)
    tri = np.array([
        [0, 1, 2],         # collinear row: f64 pivot ~3.5e-18 survives the
                           # 1e-20 gate -> garbage coeffs (matched bitwise;
                           # the |a|<0.7 plane gate rejects them later)
        [0, 3, 4],
        [0, 1, 3],
        [1, 5, 6],
        [0, 5, 7],
        [8, 9, 7],
        [0, 3, 5],         # u repeats across corners (pivot ties)
        [3, 4, 0],
        [0, 0, 1],         # repeated vertex: exact zero pivot -> singular
    ], np.int32)
    want = fit_planes_native(support, tri)
    got = np.asarray(fit_planes_device(support, tri))
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))
    assert np.all(want[8] == 0.0)


def test_fit_planes_device_random(rng):
    n = 500
    support = np.stack([
        rng.integers(0, 640, n),
        rng.integers(0, 480, n),
        rng.integers(0, 256, n),
    ], -1).astype(np.int32)
    tri = rng.integers(0, n, (4000, 3)).astype(np.int32)
    want = fit_planes_native(support, tri)
    got = np.asarray(fit_planes_device(support, tri))
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))
