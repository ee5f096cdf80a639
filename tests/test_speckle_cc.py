"""Device speckle segmentation vs the reference BFS, bit-for-bit.

The batched ELAS path runs removeSmallSegments (elas.cpp:981-1099) ON
DEVICE as packed-key cummin run-min scans to a fixed point
(post._connected_component_labels) — these tests pin its equality to the
native sequential BFS on adversarial component shapes, including the
serpentine spiral that defeats naive neighbor propagation and the
large-frame key-packing fallback."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from jackal_tpu.config import ElasParams
from jackal_tpu.matching.elas.post import remove_small_segments

try:
    from jackal_tpu.matching.elas.native_prior import (
        remove_small_segments_native)
    from jackal_tpu.native import available as _native_available
    _HAVE_NATIVE = _native_available()
except Exception:  # pragma: no cover
    _HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(
    not _HAVE_NATIVE, reason="native BFS engine unavailable")

PARAMS = ElasParams()


def _check(d: np.ndarray):
    dev = np.asarray(remove_small_segments(jnp.asarray(d), PARAMS))
    ref = remove_small_segments_native(d.copy(), PARAMS)
    np.testing.assert_array_equal(dev, ref)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_speckle_fields(seed):
    rng = np.random.default_rng(seed)
    d = rng.integers(-1, 8, (240, 320)).astype(np.float32)
    d[d < 0] = -10.0
    _check(d)


def test_serpentine_spiral_component():
    """One long spiral snake: its component diameter is ~O(H*W), which
    naive neighbor-min propagation would need thousands of iterations to
    flood; the run-scan sweep converges in iterations ~ number of bends
    and must still count the full component exactly."""
    d = np.full((100, 100), -10.0, np.float32)
    x, y, dx, dy = 0, 0, 1, 0
    for i, s in enumerate([99 - q // 2 for q in range(150)]):
        if s <= 0:
            break
        for _ in range(s):
            d[y, x] = 7.0
            x += dx
            y += dy
        dx, dy = -dy, dx
    _check(d)


def test_large_frame_fallback_path():
    """1280x960 exceeds the int32 key packing budget -> the tuple-scan
    fallback must produce the same segmentation."""
    rng = np.random.default_rng(3)
    d = rng.integers(-1, 8, (960, 1280)).astype(np.float32)
    d[d < 0] = -10.0
    _check(d)


def test_similarity_threshold_edges():
    """Components joined/split exactly at |d_i - d_j| == threshold."""
    d = np.full((40, 200), -10.0, np.float32)
    d[10, :] = np.round(np.linspace(5, 25, 200))  # steps of ~0.1 -> runs
    d[20, 0:150] = 7.0                            # big enough to survive
    d[20, 150] = 7.0 + PARAMS.speckle_sim_threshold   # joined edge
    d[22, 0:10] = 3.0                             # small -> killed
    _check(d)


def test_batched_speckle_kill_matches_per_frame():
    """remove_small_segments_batch (run-compaction + batch-level cond) vs
    the per-frame sort path, on mixed-content batches — both the compact
    branch (smooth fields) and structured labels."""
    import jax.numpy as jnp
    from jackal_tpu.matching.elas import post as PP
    from jackal_tpu.config import ElasParams

    p = ElasParams()
    rng = np.random.default_rng(7)
    B, H, W = 3, 64, 96
    D = rng.integers(0, 40, (B, H, W)).astype(np.float32)
    D[rng.random((B, H, W)) < 0.3] = -10.0
    D[1, :, :] = 12.0                      # one huge component
    D[2, ::3, :] = -10.0                   # striped
    got = np.asarray(PP.remove_small_segments_batch(jnp.asarray(D), p))
    for b in range(B):
        ref = np.asarray(PP.remove_small_segments(jnp.asarray(D[b]), p))
        np.testing.assert_array_equal(got[b], ref)


def test_batched_speckle_kill_fallback_many_runs():
    """Rows with more than _RUN_CAP runs must take the cond fallback and
    still match the per-frame path exactly."""
    import jax.numpy as jnp
    from jackal_tpu.matching.elas import post as PP
    from jackal_tpu.config import ElasParams

    p = ElasParams()
    D = np.full((1, 8, 400), -10.0, np.float32)
    # alternating single-pixel runs with |dd| > sim threshold: 200 runs/row
    D[0, :, ::2] = (np.arange(200)[None, :] * 3 % 37).astype(np.float32)
    got = np.asarray(PP.remove_small_segments_batch(jnp.asarray(D), p))
    ref = np.asarray(PP.remove_small_segments(jnp.asarray(D[0]), p))
    np.testing.assert_array_equal(got[0], ref)


def test_postprocess_batch_matches_vmapped():
    import jax.numpy as jnp
    from jackal_tpu.matching.elas import post as PP
    from jackal_tpu.config import ElasParams

    for p in (ElasParams(), ElasParams.middlebury()):
        rng = np.random.default_rng(11)
        B, H, W = 2, 48, 80
        D1 = rng.integers(-1, 30, (B, H, W)).astype(np.float32)
        D2 = rng.integers(-1, 30, (B, H, W)).astype(np.float32)
        a1, a2 = PP.postprocess_batch(jnp.asarray(D1), jnp.asarray(D2), p)
        for b in range(B):
            r1, r2 = PP.postprocess(jnp.asarray(D1[b]), jnp.asarray(D2[b]), p)
            np.testing.assert_array_equal(np.asarray(a1[b]), np.asarray(r1))
            np.testing.assert_array_equal(np.asarray(a2[b]), np.asarray(r2))


def test_lr_check_static_sweep_bound():
    """left_right_consistency_check with a live-range smax >= max scene
    disparity must equal the full-range sweep bit-for-bit."""
    import jax.numpy as jnp
    from jackal_tpu.matching.elas import post as PP
    from jackal_tpu.config import ElasParams

    p = ElasParams()
    rng = np.random.default_rng(3)
    H, W = 48, 160
    D1 = rng.integers(-1, 60, (H, W)).astype(np.float32)
    D2 = rng.integers(-1, 60, (H, W)).astype(np.float32)
    full = PP.left_right_consistency_check(jnp.asarray(D1), jnp.asarray(D2), p)
    lad = PP.left_right_consistency_check(jnp.asarray(D1), jnp.asarray(D2),
                                          p, 64)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(lad[0]))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(lad[1]))
