"""Pallas kernels vs their jnp reference engines (interpret mode on CPU)."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jackal_tpu.config import BMParams
from jackal_tpu.matching.bm import bm_match, bm_texture_gate


@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def test_bm_pallas_matches_jnp_engine(interpret_pallas):
    import jackal_tpu.ops.pallas.bm_kernel as bk
    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    l = g["left"][:96, :320][None]
    r = g["right"][:96, :320][None]
    prm = BMParams()
    dl_j, dr_j = bm_match(jnp.asarray(l[0]), jnp.asarray(r[0]), prm)
    dl_p, dr_p = bk.bm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    dl_p = bm_texture_gate(jnp.asarray(l), dl_p, prm)
    np.testing.assert_allclose(np.asarray(dr_p)[0], np.asarray(dr_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dl_p)[0], np.asarray(dl_j),
                               atol=1e-5)


def test_bm_pallas_batch_and_offsizes(interpret_pallas):
    import jackal_tpu.ops.pallas.bm_kernel as bk
    rng = np.random.default_rng(0)
    # H not a tile multiple, W not a 128 multiple, batch > 1
    l = (rng.random((2, 37, 200)) * 255).astype(np.uint8)
    r = (rng.random((2, 37, 200)) * 255).astype(np.uint8)
    prm = BMParams(disp_num=32)
    dl_p, dr_p = bk.bm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    assert dl_p.shape == (2, 37, 200)
    for b in range(2):
        dl_j, dr_j = bm_match(jnp.asarray(l[b]), jnp.asarray(r[b]), prm)
        np.testing.assert_allclose(np.asarray(dr_p)[b], np.asarray(dr_j),
                                   atol=1e-5)


def test_bm_pallas_odd_disp_num(interpret_pallas):
    """Odd D exercises the single-disparity tail of the packed-pair loop."""
    import jackal_tpu.ops.pallas.bm_kernel as bk
    rng = np.random.default_rng(1)
    l = (rng.random((1, 40, 160)) * 255).astype(np.uint8)
    r = (rng.random((1, 40, 160)) * 255).astype(np.uint8)
    prm = BMParams(disp_num=33)
    dl_p, dr_p = bk.bm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    dl_p = bm_texture_gate(jnp.asarray(l), dl_p, prm)
    dl_j, dr_j = bm_match(jnp.asarray(l[0]), jnp.asarray(r[0]), prm)
    np.testing.assert_allclose(np.asarray(dl_p)[0], np.asarray(dl_j),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr_p)[0], np.asarray(dr_j),
                               atol=1e-5)


def test_census_pallas_matches_jnp(interpret_pallas):
    """Row-band census kernel == census5x5, incl. edge-replicate borders
    and non-128-multiple widths."""
    import jax
    import jax.numpy as jnp
    from jackal_tpu.matching.sgm import census5x5
    from jackal_tpu.ops.pallas.sgm_kernel import census5x5_pallas

    rng = np.random.default_rng(7)
    for B, H, W in ((2, 37, 61), (1, 128, 128), (3, 130, 257), (1, 5, 640)):
        img = rng.integers(0, 256, (B, H, W)).astype(np.uint8)
        ref = jax.vmap(census5x5)(jnp.asarray(img))
        got = census5x5_pallas(jnp.asarray(img))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_sgm_paths_pallas_matches_jnp(interpret_pallas):
    """Wavefront DP kernel == the lax.scan path aggregation, all 8 paths."""
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching.sgm import (
        aggregate_paths, census5x5, census_cost_volume)
    from jackal_tpu.ops.pallas.sgm_kernel import aggregate_paths_pallas

    rng = np.random.default_rng(2)
    B, H, W, D = 2, 24, 130, 16   # W not a 128 multiple: exercises padding
    prm = SGMParams(disp_num=D)
    l = (rng.random((B, H, W)) * 255).astype(np.uint8)
    r = (rng.random((B, H, W)) * 255).astype(np.uint8)
    cl = jax.vmap(census5x5)(jnp.asarray(l))
    cr = jax.vmap(census5x5)(jnp.asarray(r))
    cost = jax.vmap(lambda a, b: census_cost_volume(a, b, D))(cl, cr)
    ref = jax.vmap(lambda c: aggregate_paths(c, prm))(cost)
    got = aggregate_paths_pallas(cost, prm)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sgm_paths_pallas_four_paths(interpret_pallas):
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching.sgm import (
        aggregate_paths, census5x5, census_cost_volume)
    from jackal_tpu.ops.pallas.sgm_kernel import aggregate_paths_pallas

    rng = np.random.default_rng(3)
    prm = SGMParams(disp_num=16, num_paths=4)
    l = (rng.random((1, 16, 128)) * 255).astype(np.uint8)
    r = (rng.random((1, 16, 128)) * 255).astype(np.uint8)
    cl = jax.vmap(census5x5)(jnp.asarray(l))
    cr = jax.vmap(census5x5)(jnp.asarray(r))
    cost = jax.vmap(lambda a, b: census_cost_volume(a, b, 16))(cl, cr)
    ref = jax.vmap(lambda c: aggregate_paths(c, prm))(cost)
    got = aggregate_paths_pallas(cost, prm)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_support_pallas_matches_jnp(interpret_pallas):
    """Support-matching kernel == jnp support_candidates (tiny shapes)."""
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.support import support_candidates
    from jackal_tpu.ops.descriptor import create_descriptor
    from jackal_tpu.ops.pallas.support_kernel import support_candidates_pallas

    rng = np.random.default_rng(4)
    H, W = 60, 160
    params = ElasParams(disp_max=47)
    l = (rng.random((2, H, W)) * 255).astype(np.uint8)
    r = np.stack([np.roll(l[0], 9, axis=1),
                  (rng.random((H, W)) * 255).astype(np.uint8)])
    d1 = jax.vmap(create_descriptor)(jnp.asarray(l))
    d2 = jax.vmap(create_descriptor)(jnp.asarray(r))
    ref = jax.vmap(lambda a, b: support_candidates(a, b, params))(d1, d2)
    got = support_candidates_pallas(d1, d2, params)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_elas_dense_pallas_matches_jnp(interpret_pallas):
    """Tiny-shape interpret-mode equivalence vs the jnp dense matcher."""
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.dense import dense_match
    from jackal_tpu.ops.pallas.elas_dense_kernel import elas_dense_pallas
    from jackal_tpu.ops.descriptor import create_descriptor

    rng = np.random.default_rng(0)
    H, W = 40, 128
    params = ElasParams(disp_max=63)
    left = (rng.random((H, W)) * 255).astype(np.uint8)
    right = np.roll(left, 7, axis=1)
    d1 = create_descriptor(jnp.asarray(left))
    d2 = create_descriptor(jnp.asarray(right))
    d_plane = rng.integers(0, 40, (H, W)).astype(np.int32)
    valid = rng.random((H, W)) < 0.7
    covered = rng.random((H, W)) < 0.9
    gh, gw = -(-H // 20), -(-W // 20)
    grid = rng.random((gh, gw, params.disp_num)) < 0.1

    for right_image in (False, True):
        ref = np.asarray(dense_match(
            d1, d2, jnp.asarray(d_plane), jnp.asarray(valid),
            jnp.asarray(covered), jnp.asarray(grid), params, right_image))
        got = np.asarray(elas_dense_pallas(
            d1[None], d2[None], jnp.asarray(d_plane)[None],
            jnp.asarray(valid)[None], jnp.asarray(covered)[None],
            jnp.asarray(grid)[None], params, right_image))[0]
        np.testing.assert_array_equal(got, ref)


def test_sgm_wta_maps_pallas_full_match(interpret_pallas):
    """Pallas single-pass WTA-maps finalize == the lax.scan engine's
    finalize, end to end (uniqueness, sub-pixel, L/R check)."""
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching.sgm import sgm_match, sgm_match_pallas

    rng = np.random.default_rng(4)
    B, H, W, D = 2, 20, 130, 16   # W not a 128 multiple: padding path
    prm = SGMParams(disp_num=D)
    l = (rng.random((B, H, W)) * 255).astype(np.uint8)
    r = np.roll(l, 3, axis=2)
    dl_p, dr_p = sgm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    for b in range(B):
        dl_j, dr_j = sgm_match(jnp.asarray(l[b]), jnp.asarray(r[b]), prm)
        np.testing.assert_array_equal(np.asarray(dl_p)[b], np.asarray(dl_j))
        np.testing.assert_array_equal(np.asarray(dr_p)[b], np.asarray(dr_j))


@pytest.mark.parametrize("shape", [
    (1, 16, 128, 24),    # W a lane multiple, non-pow2 D
    (2, 23, 150, 16),    # odd H, padded W, B > 1
    (1, 40, 96, 48),     # W < 128 (fully padded lane dim), D > W/2
])
def test_sgm_pallas_shape_fuzz(interpret_pallas, shape):
    """Engine equality across awkward shapes: odd heights, sub-128 and
    non-128-multiple widths, non-power-of-two disparity counts."""
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching.sgm import sgm_match, sgm_match_pallas

    B, H, W, D = shape
    rng = np.random.default_rng(H * W)
    prm = SGMParams(disp_num=D)
    l = (rng.random((B, H, W)) * 255).astype(np.uint8)
    r = np.roll(l, 5, axis=2)
    dl_p, dr_p = sgm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    for b in range(B):
        dl_j, dr_j = sgm_match(jnp.asarray(l[b]), jnp.asarray(r[b]), prm)
        np.testing.assert_array_equal(np.asarray(dl_p)[b], np.asarray(dl_j))
        np.testing.assert_array_equal(np.asarray(dr_p)[b], np.asarray(dr_j))


def test_sgm_true_right_pallas_matches_jnp(interpret_pallas):
    """true_right mode: the Pallas path (own 8-path DP over cost_R + direct
    WTA maps of that volume) == the lax.scan engine bit for bit."""
    import dataclasses
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching.sgm import sgm_match, sgm_match_pallas

    rng = np.random.default_rng(5)
    B, H, W, D = 1, 18, 130, 16
    prm = dataclasses.replace(SGMParams(disp_num=D), true_right=True)
    l = (rng.random((B, H, W)) * 255).astype(np.uint8)
    r = np.roll(l, 3, axis=2)
    dl_p, dr_p = sgm_match_pallas(jnp.asarray(l), jnp.asarray(r), prm)
    dl_j, dr_j = sgm_match(jnp.asarray(l[0]), jnp.asarray(r[0]), prm)
    np.testing.assert_array_equal(np.asarray(dl_p)[0], np.asarray(dl_j))
    np.testing.assert_array_equal(np.asarray(dr_p)[0], np.asarray(dr_j))
