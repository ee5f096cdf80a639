"""First-party Delaunay triangulator vs the reference triangulator.

Golden fixtures (tests/fixtures/delaunay_golden.npz) are ordered triangle
lists produced by a standalone build of the reference's Shewchuk
triangulator with the production switches "zQB" (elas.cpp:487-488), over
inputs covering its degenerate regimes: co-circular 5-px support lattices,
pythagorean co-circular rings, collinear runs, random integer points and
real ELAS support sets. Regenerate with tools/make_delaunay_goldens.py.

The native engine (native/delaunay_engine.cpp) must reproduce the golden
triangle SETS exactly — co-circular diagonal ties included. For inputs with
duplicate points the surviving index may differ (the reference's randomized
quicksort picks an arbitrary survivor; we keep the lowest original index),
so the comparison canonicalizes indices onto first occurrences.
"""
import ctypes
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "delaunay_golden.npz")

try:
    from jackal_tpu.native import load as _load_native
    _lib = _load_native()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native engine unavailable")


def tri_native(pts: np.ndarray, alternate: int = 1) -> np.ndarray:
    pts = np.ascontiguousarray(pts, np.float32)
    max_tri = 3 * len(pts) + 16
    out = np.zeros((max_tri, 3), np.int32)
    n = _lib.delaunay_exact(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_tri,
        alternate)
    assert n >= 0
    return out[:n]


def _tri_set(tri):
    return set(tuple(sorted(t)) for t in np.asarray(tri))


def _canon_set(tri, pts):
    first = {}
    canon = np.zeros(len(pts), np.int32)
    for i, p in enumerate(map(tuple, np.asarray(pts))):
        if p not in first:
            first[p] = i
        canon[i] = first[p]
    return set(tuple(sorted(canon[t])) for t in np.asarray(tri))


def _cases():
    z = np.load(FIXTURE)
    return sorted(set(k[:-4] for k in z.files if k.endswith("_pts")))


@pytest.mark.parametrize("name", _cases())
def test_matches_reference_triangulator(name):
    z = np.load(FIXTURE)
    pts, gold = z[name + "_pts"], z[name + "_tri"]
    mine = tri_native(pts)
    assert len(mine) == len(gold)
    has_dupes = len(np.unique(pts, axis=0)) != len(pts)
    if has_dupes:
        assert _canon_set(mine, pts) == _canon_set(gold, pts)
    else:
        assert _tri_set(mine) == _tri_set(gold)


def test_delaunay_property_random():
    """Empty-circumcircle property on random integer points: no other point
    strictly inside any triangle's circumcircle (exact integer check)."""
    rng = np.random.default_rng(7)
    pts = np.unique(rng.integers(0, 200, (120, 2)), axis=0).astype(np.float32)
    tri = tri_native(pts)
    P = pts.astype(object)  # python ints -> exact arithmetic

    def incircle(a, b, c, d):
        m = []
        for p in (a, b, c):
            dx, dy = int(p[0]) - int(d[0]), int(p[1]) - int(d[1])
            m.append((dx, dy, dx * dx + dy * dy))
        (adx, ady, al), (bdx, bdy, bl), (cdx, cdy, cl) = m
        return (al * (bdx * cdy - bdy * cdx) + bl * (cdx * ady - cdy * adx)
                + cl * (adx * bdy - ady * bdx))

    for t in tri[:200]:
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        # orient ccw
        o = (int(b[0]) - int(a[0])) * (int(c[1]) - int(a[1])) - \
            (int(b[1]) - int(a[1])) * (int(c[0]) - int(a[0]))
        assert o != 0
        if o < 0:
            b, c = c, b
        for j in range(len(pts)):
            if j in t:
                continue
            assert incircle(a, b, c, P[j]) <= 0


def test_small_degenerate_inputs():
    assert len(tri_native(np.zeros((0, 2), np.float32))) == 0
    assert len(tri_native(np.array([[1, 1]], np.float32))) == 0
    assert len(tri_native(np.array([[1, 1], [2, 2]], np.float32))) == 0
    # all collinear -> no triangles
    col = np.array([[0, 0], [3, 3], [7, 7], [11, 11]], np.float32)
    assert len(tri_native(col)) == 0
    # non-integral coords -> rejected (-1), caller falls back to Qhull
    pts = np.array([[0.5, 0], [1, 0], [0, 1]], np.float32)
    out = np.zeros((16, 3), np.int32)
    n = _lib.delaunay_exact(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 16, 1)
    assert n == -1


def test_python_wrapper_uses_native():
    from jackal_tpu.matching.elas.prior import delaunay

    z = np.load(FIXTURE)
    pts, gold = z["lattice5_pts"], z["lattice5_tri"]
    assert _tri_set(delaunay(pts)) == _tri_set(gold)
    # non-integral input silently falls back to Qhull and still triangulates
    jit = pts + np.float32(0.25)
    tri = delaunay(jit)
    assert len(tri) > 0


def test_final_elas_map_bit_exact_with_native_delaunay():
    """With the first-party triangulator the FULL ELAS pipeline output is
    bit-identical to the reference build's on the golden pairs — the
    round-1 Qhull co-circular divergence is gone."""
    import jax

    if jax.default_backend() not in ("cpu",):
        pytest.skip("CPU-determinism test")
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.pipeline import elas_match

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "elas_golden_s320_boxes.npz")
    z = np.load(fix)
    D1, _ = elas_match(z["left"], z["right"], ElasParams())
    assert np.array_equal(D1, z["D1"])
