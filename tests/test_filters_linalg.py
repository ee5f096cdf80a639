"""L2 surface: filter.cpp's remaining kernels + the Matrix linalg surface.

Filter goldens come from a compiled reference build
(tools/make_filter_fixtures.py); comparisons cover the well-defined region
(the reference leaves borders uninitialized and its last SSE window reads
past the buffer — ops/filters.py documents the conventions)."""
import numpy as np
import pytest

from jackal_tpu.ops.filters import (
    blob5x5, checkerboard5x5, integral_image, sobel5x5)
from jackal_tpu.ops.linalg import gauss_jordan_solve, lu, svd

FIX = "tests/fixtures"


@pytest.fixture(scope="module")
def golden():
    return np.load(f"{FIX}/filters_golden.npz")


def _defined_mask(H, W):
    m = np.zeros(H * W, bool)
    m[2:H * W - 20] = True          # flat head uninit / tail reads OOB
    m = m.reshape(H, W)
    m[:2] = m[H - 2:] = False       # column passes write rows [2, H-2)
    return m


def test_integral_image_exact(golden):
    got = np.asarray(integral_image(golden["img"]))
    np.testing.assert_array_equal(got, golden["ii"])


def test_sobel5x5_exact(golden):
    img = golden["img"]
    du, dv = map(np.asarray, sobel5x5(img))
    m = _defined_mask(*img.shape)
    np.testing.assert_array_equal(du[m], golden["du"][m])
    np.testing.assert_array_equal(dv[m], golden["dv"][m])


def test_checkerboard5x5_exact(golden):
    img = golden["img"]
    cb = np.asarray(checkerboard5x5(img))
    m = _defined_mask(*img.shape)
    np.testing.assert_array_equal(cb[m], golden["cb"][m])


def test_blob5x5_exact(golden):
    img = golden["img"]
    H, W = img.shape
    bl = np.asarray(blob5x5(img))
    m = np.zeros(H * W, bool)
    m[3 + 3 * W:H * W - 2 - 2 * W] = True
    m = m.reshape(H, W)
    np.testing.assert_array_equal(bl[m], golden["bl"][m])


def test_gauss_jordan_solve_batched():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 3, 3))
    B = rng.standard_normal((64, 3, 2))
    Ainv, X, ok = map(np.asarray, gauss_jordan_solve(A, B))
    assert ok.all()
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), rtol=1e-4, atol=1e-5)


def test_gauss_jordan_singular_flag():
    A = np.zeros((2, 3, 3))
    A[0] = np.eye(3)
    A[1] = np.outer([1.0, 2.0, 3.0], [1.0, 0.0, 1.0])   # rank 1
    B = np.ones((2, 3, 1))
    _, X, ok = map(np.asarray, gauss_jordan_solve(A, B))
    assert ok[0] and not ok[1]
    np.testing.assert_allclose(X[0], np.ones((3, 1)), atol=1e-6)
    assert (X[1] == 0).all()


def test_lu_reconstructs():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((8, 4, 4))
    LU, idx, d, ok = map(np.asarray, lu(A))
    assert ok.all()
    for b in range(8):
        L = np.tril(LU[b], -1) + np.eye(4)
        U = np.triu(LU[b])
        PA = A[b].copy()
        for j in range(4):          # replay the recorded row swaps
            PA[[j, idx[b, j]]] = PA[[idx[b, j], j]]
        np.testing.assert_allclose(L @ U, PA, rtol=1e-4, atol=1e-5)
        det = d[b] * np.prod(np.diag(LU[b]))
        np.testing.assert_allclose(det, np.linalg.det(A[b]), rtol=1e-4)


def test_svd_convention():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((5, 4))
    U, w, V = map(np.asarray, svd(A))
    np.testing.assert_allclose(U @ np.diag(w) @ V.T, A, rtol=1e-4,
                               atol=1e-5)
