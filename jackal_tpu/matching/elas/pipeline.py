"""ELAS end-to-end matching pipeline (Elas::process equivalent).

Mirrors elas.cpp:32-151 stage for stage, with the TPU-idiomatic split:
descriptors, support cost volumes, dense matching and all postprocessing run
on device as fixed-shape batched ops; support pruning, Delaunay
triangulation, plane fitting and rasterization run on host — in the C++
native engine when available (jackal_tpu/native, milliseconds per frame),
else the numpy reference implementation. Every device stage is verified
bit-identical to an instrumented reference build; the one source of
divergence is Qhull-vs-Shewchuk Delaunay diagonal choices on co-circular
support quads.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import ElasParams
from ...ops.descriptor import create_descriptor
from .support import support_candidates, collect_support_points
from .prior import build_priors
from .dense import dense_match
from .post import left_right_consistency_check, post_tail, postprocess

try:
    from ...native import available as _native_available
    from .native_prior import (
        build_priors_native,
        collect_support_points_native,
        remove_small_segments_native,
    )
    _HAVE_NATIVE = _native_available()
except Exception:  # pragma: no cover - toolchain-less environments
    _HAVE_NATIVE = False


def _dense_both(desc1_b, desc2_b, m1_args, m2_args, params):
    """Batched dense matching, Pallas on TPU / jnp elsewhere.

    m*_args = (d_plane [B,H,W] i32, valid [B,H,W] bool, covered, grid)."""
    import jax

    if jax.default_backend() == "tpu" and not params.subsampling:
        from ...ops.pallas.elas_dense_kernel import elas_dense_pallas
        D1 = elas_dense_pallas(desc1_b, desc2_b, *m1_args, params, False)
        D2 = elas_dense_pallas(desc1_b, desc2_b, *m2_args, params, True)
        return D1, D2
    dm = jax.vmap(lambda a, b, dp, pv, cv, gm: dense_match(
        a, b, dp, pv, cv, gm, params, False))
    dm_r = jax.vmap(lambda a, b, dp, pv, cv, gm: dense_match(
        a, b, dp, pv, cv, gm, params, True))
    return dm(desc1_b, desc2_b, *m1_args), dm_r(desc1_b, desc2_b, *m2_args)


def _postprocess_hybrid(D1, D2, params, use_native):
    """L/R check (device) -> speckle (native BFS, exact) -> tail (device).

    The device speckle (label propagation to fixed point) is correct but
    gather-bound; the C++ BFS is the production path."""
    if not use_native:
        return postprocess(D1, D2, params)
    D1, D2 = left_right_consistency_check(D1, D2, params)
    # disparities are integers at this stage; int16 round-trips halve the
    # host<->device traffic (dominant on tunnel-attached TPUs)
    D1h = np.asarray(D1.astype(jnp.int16), np.float32)
    D1 = jnp.asarray(remove_small_segments_native(D1h, params)
                     .astype(np.int16))
    D1 = D1.astype(jnp.float32)
    if not params.postprocess_only_left:
        D2h = np.asarray(D2.astype(jnp.int16), np.float32)
        D2 = jnp.asarray(remove_small_segments_native(D2h, params)
                         .astype(np.int16)).astype(jnp.float32)
    return post_tail(D1, D2, params)


@dataclasses.dataclass
class ElasDebug:
    support: np.ndarray
    dense_D1: np.ndarray
    dense_D2: np.ndarray


def _host_prior(dcan, params, W, H, tri_left, tri_right, use_native):
    if use_native:
        support = collect_support_points_native(dcan, params, W, H)
    else:
        support = collect_support_points(dcan, params, W, H)
    if len(support) < 3:
        return support, None
    builder = build_priors_native if use_native else build_priors
    priors = builder(support, W, H, params,
                     tri_left=tri_left, tri_right=tri_right)
    return support, priors


def elas_match(
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    params: ElasParams = ElasParams(),
    tri_left: Optional[np.ndarray] = None,
    tri_right: Optional[np.ndarray] = None,
    return_debug: bool = False,
    use_native: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense stereo: two uint8 [H, W] images -> two float32 disparity maps.

    Invalid pixels are negative (-1 / -10), matching libelas encodings.
    tri_left/tri_right override the Delaunay triangulation (tests).
    use_native: force/forbid the C++ host prior engine (default: auto).
    """
    if left_u8.shape != right_u8.shape:
        raise ValueError(
            f"left/right shape mismatch: {left_u8.shape} vs {right_u8.shape}")
    if use_native is None:
        use_native = _HAVE_NATIVE
    H, W = left_u8.shape
    left = jnp.asarray(left_u8)
    right = jnp.asarray(right_u8)

    desc1 = create_descriptor(left, params.subsampling)
    desc2 = create_descriptor(right, params.subsampling)

    dcan = np.asarray(support_candidates(desc1, desc2, params))
    support, priors = _host_prior(
        dcan, params, W, H, tri_left, tri_right, use_native)
    if priors is None:
        bad = np.full((H, W), -10.0, np.float32)
        return bad, bad.copy()
    maps1, maps2, grid1, grid2 = priors

    D1, D2 = _dense_both(
        desc1[None], desc2[None],
        (jnp.asarray(maps1.d_plane)[None], jnp.asarray(maps1.valid)[None],
         jnp.asarray(maps1.tri_id >= 0)[None], jnp.asarray(grid1)[None]),
        (jnp.asarray(maps2.d_plane)[None], jnp.asarray(maps2.valid)[None],
         jnp.asarray(maps2.tri_id >= 0)[None], jnp.asarray(grid2)[None]),
        params)
    D1, D2 = D1[0], D2[0]
    if params.subsampling:
        # only even pixels are matched; outputs are W/2 x H/2
        # (elas.cpp:793-795, 877-881)
        D1 = D1[0::2, 0::2][:H // 2, :W // 2]
        D2 = D2[0::2, 0::2][:H // 2, :W // 2]

    if return_debug:
        dbg = ElasDebug(support, np.asarray(D1), np.asarray(D2))

    D1, D2 = _postprocess_hybrid(D1, D2, params, use_native)

    if return_debug:
        return np.asarray(D1), np.asarray(D2), dbg
    return np.asarray(D1), np.asarray(D2)


def elas_match_batch(
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched ELAS: [B, H, W] pairs -> [B, H, W] disparity maps.

    Device stages run batched (one dispatch per stage for the whole batch);
    the host prior engine loops frames (native C++: ~30 ms each at 640x480,
    overlapped with nothing yet — future work: thread pool)."""
    import jax

    if use_native is None:
        use_native = _HAVE_NATIVE
    B, H, W = left_u8.shape
    left = jnp.asarray(left_u8)
    right = jnp.asarray(right_u8)

    desc1 = jax.vmap(create_descriptor)(left)
    desc2 = jax.vmap(create_descriptor)(right)
    dcan_b = np.asarray(
        jax.vmap(lambda a, b: support_candidates(a, b, params))(desc1, desc2))

    d_plane1 = np.zeros((B, H, W), np.int16)
    d_plane2 = np.zeros((B, H, W), np.int16)
    valid1 = np.zeros((B, H, W), bool)
    valid2 = np.zeros((B, H, W), bool)
    cov1 = np.zeros((B, H, W), bool)
    cov2 = np.zeros((B, H, W), bool)
    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    g1 = np.zeros((B, gh, gw, params.disp_num), bool)
    g2 = np.zeros((B, gh, gw, params.disp_num), bool)
    def one_frame(b):
        _, priors = _host_prior(dcan_b[b], params, W, H, None, None,
                                use_native)
        if priors is None:
            return
        m1, m2, gg1, gg2 = priors
        d_plane1[b], valid1[b], cov1[b] = m1.d_plane, m1.valid, m1.tri_id >= 0
        d_plane2[b], valid2[b], cov2[b] = m2.d_plane, m2.valid, m2.tri_id >= 0
        g1[b], g2[b] = gg1, gg2

    # the native engine releases the GIL during C calls -> thread pool
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(B, 8)) as ex:
        list(ex.map(one_frame, range(B)))

    D1, D2 = _dense_both(
        desc1, desc2,
        (jnp.asarray(d_plane1), jnp.asarray(valid1), jnp.asarray(cov1),
         jnp.asarray(g1)),
        (jnp.asarray(d_plane2), jnp.asarray(valid2), jnp.asarray(cov2),
         jnp.asarray(g2)),
        params)
    if use_native:
        vlr = jax.vmap(
            lambda a, b: left_right_consistency_check(a, b, params))
        D1, D2 = vlr(D1, D2)
        D1h = np.asarray(D1.astype(jnp.int16)).astype(np.float32)
        D1 = jnp.asarray(np.stack([
            remove_small_segments_native(D1h[b], params)
            for b in range(B)]).astype(np.int16)).astype(jnp.float32)
        if not params.postprocess_only_left:
            D2h = np.asarray(D2.astype(jnp.int16)).astype(np.float32)
            D2 = jnp.asarray(np.stack([
                remove_small_segments_native(D2h[b], params)
                for b in range(B)]).astype(np.int16)).astype(jnp.float32)
        D1, D2 = jax.vmap(lambda a, b: post_tail(a, b, params))(D1, D2)
    else:
        D1, D2 = jax.vmap(lambda a, b: postprocess(a, b, params))(D1, D2)
    return np.asarray(D1), np.asarray(D2)
