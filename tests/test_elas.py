"""ELAS engine vs instrumented-reference stage fixtures and golden outputs.

Fixtures come from tools/make_stage_fixtures.py / make_golden_fixtures.py
(reference libelas compiled out-of-tree). Every device stage must be
bit-identical; end-to-end with our own Delaunay must be far inside the
0.5 px RMSE budget.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from jackal_tpu.config import ElasParams
from jackal_tpu.ops.descriptor import create_descriptor
from jackal_tpu.matching.elas.support import (
    support_candidates,
    collect_support_points,
)
from jackal_tpu.matching.elas.prior import (
    create_grid,
    grid_mask_to_reference_lists,
    compute_disparity_planes,
    rasterize_planes,
)
from jackal_tpu.matching.elas.dense import dense_match, prior_table
from jackal_tpu.matching.elas.post import (
    adaptive_mean,
    gap_interpolation,
    left_right_consistency_check,
    remove_small_segments,
)
from jackal_tpu.matching.elas.pipeline import elas_match

FIX = "tests/fixtures"


@pytest.fixture(scope="module")
def st160():
    return np.load(f"{FIX}/elas_stages_st160.npz")


@pytest.fixture(scope="module")
def st320():
    return np.load(f"{FIX}/elas_stages_st320.npz")


def test_descriptor_bit_exact(st160):
    for img, ref in [("left", "desc1"), ("right", "desc2")]:
        mine = np.asarray(create_descriptor(jnp.asarray(st160[img])))
        np.testing.assert_array_equal(mine, st160[ref])


def test_support_points_bit_exact(st160):
    d1 = create_descriptor(jnp.asarray(st160["left"]))
    d2 = create_descriptor(jnp.asarray(st160["right"]))
    dcan = np.asarray(support_candidates(d1, d2))
    sp = collect_support_points(dcan)
    np.testing.assert_array_equal(sp, st160["support"])


def test_grid_bit_exact(st160):
    sp = st160["support"]
    H, W = st160["left"].shape
    for name, right in [("grid1", False), ("grid2", True)]:
        mask = create_grid(sp, W, H, right)
        np.testing.assert_array_equal(
            grid_mask_to_reference_lists(mask), st160[name])


def test_planes_match(st160):
    for tname, pname in [("tri1", "planes1"), ("tri2", "planes2")]:
        mine = compute_disparity_planes(st160["support"], st160[tname])
        np.testing.assert_allclose(mine, st160[pname], atol=1e-4)


@pytest.mark.parametrize("right", [False, True])
def test_dense_match_bit_exact(st160, right):
    z = st160
    sp = z["support"]
    H, W = z["left"].shape
    d1 = create_descriptor(jnp.asarray(z["left"]))
    d2 = create_descriptor(jnp.asarray(z["right"]))
    tri = z["tri2" if right else "tri1"]
    planes = z["planes2" if right else "planes1"]
    maps = rasterize_planes(sp, tri, planes, W, H, right)
    g = create_grid(sp, W, H, right)
    D = np.asarray(dense_match(
        d1, d2, jnp.asarray(maps.d_plane), jnp.asarray(maps.valid),
        jnp.asarray(maps.tri_id >= 0), jnp.asarray(g),
        right_image=right))
    np.testing.assert_array_equal(D, z["dense_D2" if right else "dense_D1"])


def test_postprocessing_bit_exact(st160):
    z = st160
    L1, L2 = left_right_consistency_check(
        jnp.asarray(z["dense_D1"]), jnp.asarray(z["dense_D2"]))
    np.testing.assert_array_equal(np.asarray(L1), z["lr_D1"])
    np.testing.assert_array_equal(np.asarray(L2), z["lr_D2"])
    S1 = remove_small_segments(jnp.asarray(z["lr_D1"]))
    np.testing.assert_array_equal(np.asarray(S1), z["speckle_D1"])
    G1 = gap_interpolation(jnp.asarray(z["speckle_D1"]))
    np.testing.assert_array_equal(np.asarray(G1), z["gap_D1"])
    A1 = adaptive_mean(jnp.asarray(z["gap_D1"]))
    np.testing.assert_array_equal(np.asarray(A1), z["final_D1"])


def test_end_to_end_bit_exact_with_reference_triangulation(st320):
    z = st320
    D1, _ = elas_match(z["left"], z["right"],
                       tri_left=z["tri1"], tri_right=z["tri2"])
    np.testing.assert_array_equal(D1, z["final_D1"])


@pytest.mark.parametrize("fix", ["s320_flat", "s320_boxes", "s640_boxes"])
def test_golden_bit_exact(fix):
    """End-to-end BIT equality vs the reference build on every golden,
    with OUR OWN (first-party exact) Delaunay engine on the default path —
    the README's headline claim, asserted (far inside the 0.5 px
    north-star budget, BASELINE.md)."""
    g = np.load(f"{FIX}/elas_golden_{fix}.npz")
    D1, D2 = elas_match(g["left"], g["right"])
    np.testing.assert_array_equal(D1, g["D1"])
    np.testing.assert_array_equal(D2, g["D2"])


def test_golden_middlebury_preset():
    g = np.load(f"{FIX}/elas_golden_s320_mb.npz")
    D1, D2 = elas_match(g["left"], g["right"],
                        params=ElasParams.middlebury())
    np.testing.assert_array_equal(D1, g["D1"])
    np.testing.assert_array_equal(D2, g["D2"])


def test_golden_photographic_pair_bit_exact():
    """Natural-imagery end-to-end bit equality: a real 640x480 crop of the
    reference repo's fisheye stereo photographs (saturated gradients,
    occlusion boundaries, real speckle structure — only ~31% of pixels
    survive the reference pipeline here, exercising the sparse paths the
    synthetic smooth-disparity scenes never hit)."""
    g = np.load(f"{FIX}/elas_golden_photo.npz")
    D1, D2 = elas_match(g["left"], g["right"])
    np.testing.assert_array_equal(D1, g["D1"])
    np.testing.assert_array_equal(D2, g["D2"])


@pytest.mark.parametrize("use_native", [True, False])
def test_batch_matches_per_frame(use_native):
    """elas_match_batch (packed-wire pipelined path) == per-frame
    elas_match, including a degenerate all-flat frame in the batch."""
    from jackal_tpu.matching.elas.pipeline import (
        _HAVE_NATIVE, elas_match, elas_match_batch)
    if use_native and not _HAVE_NATIVE:
        pytest.skip("native engine unavailable")
    g = np.load(f"{FIX}/elas_golden_s320_flat.npz")
    l0, r0 = g["left"][:96, :160], g["right"][:96, :160]
    flat = np.full_like(l0, 100)
    lb = np.stack([l0, flat])
    rb = np.stack([r0, flat])
    B1, B2 = elas_match_batch(lb, rb, use_native=use_native, chunk=1)
    for b, (l, r) in enumerate([(l0, r0), (flat, flat)]):
        D1, D2 = elas_match(l, r, use_native=use_native)
        np.testing.assert_array_equal(B1[b], D1)
        np.testing.assert_array_equal(B2[b], D2)


def test_batch_matches_per_frame_alt_params():
    """Batch path == per-frame path under a non-default parameterization
    (halved disparity range, finer candidate grid) — exercises the chunk
    wire, slab raster and candidate grids at different static shapes."""
    import dataclasses
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.pipeline import (elas_match,
                                                   elas_match_batch)
    prm = dataclasses.replace(ElasParams(), disp_max=127, grid_size=10)
    g = np.load(f"{FIX}/elas_golden_s320_flat.npz")
    l0, r0 = g["left"][:96, :160], g["right"][:96, :160]
    lb = np.stack([l0, np.roll(l0, 4, axis=1)])
    rb = np.stack([r0, np.roll(r0, 4, axis=1)])
    B1, B2 = elas_match_batch(lb, rb, prm, chunk=1)
    for b in range(2):
        D1, D2 = elas_match(lb[b], rb[b], prm)
        np.testing.assert_array_equal(B1[b], D1)
        np.testing.assert_array_equal(B2[b], D2)


def test_batch_content_permutation_matches_per_frame():
    """The content-homogeneous chunk scheduler (_content_perm) reorders
    interleaved mixed-content frames into sorted chunks and restores
    arrival order on output; per-frame results must be bit-identical to
    the unscheduled per-frame path (pad-invariance)."""
    from jackal_tpu.matching.elas.pipeline import (_content_perm,
                                                   elas_match,
                                                   elas_match_batch)
    g = np.load(f"{FIX}/elas_golden_s320_flat.npz")
    l0, r0 = g["left"][:96, :160], g["right"][:96, :160]
    flat = np.full_like(l0, 100)     # textureless: zero candidates
    lb = np.stack([l0, flat, l0, flat])
    rb = np.stack([r0, flat, r0, flat])
    # the scheduler must actually permute this arrangement
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.pipeline import _front, _Static, _use_pallas
    import jax.numpy as _jnp
    fr = _front(_jnp.asarray(lb), _jnp.asarray(rb),
                _Static(ElasParams(), _use_pallas()))
    perm, inv, perm_id = _content_perm(np.asarray(fr[2]), 4, 2)
    assert not perm_id
    assert np.array_equal(np.sort(perm), np.arange(4))
    assert np.array_equal(perm[inv], np.arange(4))
    B1, B2 = elas_match_batch(lb, rb, chunk=2)
    for b in range(4):
        D1, D2 = elas_match(lb[b], rb[b])
        np.testing.assert_array_equal(B1[b], D1)
        np.testing.assert_array_equal(B2[b], D2)


def test_stream_matches_batch():
    """elas_match_stream (pipelined double-buffered scheduling) is
    bit-identical to the one-shot batch path, per batch, in order."""
    from jackal_tpu.matching.elas.pipeline import (elas_match_batch,
                                                   elas_match_stream)
    g = np.load(f"{FIX}/elas_golden_s320_flat.npz")
    l0, r0 = g["left"][:96, :160], g["right"][:96, :160]
    flat = np.full_like(l0, 100)
    batches = [(np.stack([l0, flat]), np.stack([r0, flat])),
               (np.stack([flat, l0]), np.stack([flat, r0])),
               (np.stack([l0, l0]), np.stack([r0, r0]))]
    outs = list(elas_match_stream(iter(batches), chunk=1))
    assert len(outs) == len(batches)
    for (lb, rb), (S1, S2) in zip(batches, outs):
        B1, B2 = elas_match_batch(lb, rb, chunk=1)
        np.testing.assert_array_equal(np.asarray(S1), B1)
        np.testing.assert_array_equal(np.asarray(S2), B2)


def test_degenerate_inputs():
    """Flat textureless images -> no support points -> all invalid."""
    flat = np.full((60, 80), 100, np.uint8)
    D1, D2 = elas_match(flat, flat)
    assert (D1 < 0).all() and (D2 < 0).all()


def test_subsampling_bit_exact_with_reference_triangulation():
    """ELAS subsampling mode (elas.h:82-84): half-res descriptors, step-6
    support grid, W/2 x H/2 output, subsampled postprocessing."""
    import dataclasses
    z = np.load(f"{FIX}/elas_stages_sub320.npz")
    params = dataclasses.replace(ElasParams(), subsampling=True)
    D1, _ = elas_match(z["left"], z["right"], params=params,
                       tri_left=z["tri1"], tri_right=z["tri2"])
    assert D1.shape == z["final_D1"].shape
    np.testing.assert_array_equal(D1, z["final_D1"])


def test_subsampling_stage_fixtures():
    import dataclasses
    from jackal_tpu.matching.elas.support import (
        support_candidates as sc, collect_support_points as csp)
    z = np.load(f"{FIX}/elas_stages_sub320.npz")
    params = dataclasses.replace(ElasParams(), subsampling=True)
    d1 = create_descriptor(jnp.asarray(z["left"]), True)
    d2 = create_descriptor(jnp.asarray(z["right"]), True)
    np.testing.assert_array_equal(np.asarray(d1), z["desc1"])
    sp = csp(np.asarray(sc(d1, d2, params)), params)
    np.testing.assert_array_equal(sp, z["support"])


def test_subsampling_golden_rmse():
    import dataclasses
    g = np.load(f"{FIX}/elas_golden_sub320.npz")
    params = dataclasses.replace(ElasParams(), subsampling=True)
    D1, _ = elas_match(g["left"], g["right"], params=params)
    ref = g["D1"]
    both = (ref >= 0) & (D1 >= 0)
    rmse = float(np.sqrt(((D1[both] - ref[both]) ** 2).mean()))
    assert rmse <= 0.05
    assert ((ref >= 0) == (D1 >= 0)).mean() > 0.995
