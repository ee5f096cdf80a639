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
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import ElasParams
from ...ops.descriptor import create_descriptor
from .support import support_candidates, collect_support_points
from .prior import build_priors, delaunay
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


def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# device segments of the batched path (each ONE jit dispatch)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _Static:
    """Hashable jit-static bundle."""
    params: ElasParams
    use_pallas: bool


def _front(left_b, right_b, static: _Static):
    """Descriptors + support candidate grid, one fused dispatch."""
    import jax

    return _front_jit(left_b, right_b, static)


def _front_impl(lb, rb, st: _Static):
    import jax

    p = st.params
    d1 = jax.vmap(lambda x: create_descriptor(x, p.subsampling))(lb)
    d2 = jax.vmap(lambda x: create_descriptor(x, p.subsampling))(rb)
    if st.use_pallas:
        from ...ops.pallas.support_kernel import support_candidates_pallas
        dcan = support_candidates_pallas(d1, d2, p)
    else:
        dcan = jax.vmap(lambda a, b: support_candidates(a, b, p))(d1, d2)
    return d1, d2, dcan


def _unpackbits_dev(packed, width):
    """[..., Wb] uint8 -> [..., width] bool (little bit order)."""
    import jax.numpy as jnp

    bits = (packed[..., :, None].astype(jnp.int32)
            >> jnp.arange(8, dtype=jnp.int32)) & 1
    out = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return out[..., :width].astype(bool)


def _dense_post_impl(d1, d2, dp1, va1, cv1, g1, dp2, va2, cv2, g2,
                     st: _Static):
    """Dense match from DEVICE-computed prior maps (device_prior.py) +
    the FULL device postprocess chain (L/R check, speckle CC, gaps,
    adaptive mean, median) in one dispatch. The device speckle
    (post.remove_small_segments) is bit-identical to the reference BFS,
    so no disparity wire ever leaves the device."""
    import jax

    p = st.params
    D = p.disp_max + 1
    m1 = (dp1, va1, cv1, _unpackbits_dev(g1, D))
    m2 = (dp2, va2, cv2, _unpackbits_dev(g2, D))
    if st.use_pallas and not p.subsampling:
        from ...ops.pallas.elas_dense_kernel import elas_dense_pallas
        D1 = elas_dense_pallas(d1, d2, *m1, p, False)
        D2 = elas_dense_pallas(d1, d2, *m2, p, True)
    else:
        dm = jax.vmap(lambda a, b, dp, pv, cv, gm: dense_match(
            a, b, dp, pv, cv, gm, p, False))
        dm_r = jax.vmap(lambda a, b, dp, pv, cv, gm: dense_match(
            a, b, dp, pv, cv, gm, p, True))
        D1, D2 = dm(d1, d2, *m1), dm_r(d1, d2, *m2)
    return jax.vmap(lambda a, b: postprocess(a, b, p))(D1, D2)


def _make_jits():
    """Module-level jit wrappers (ONE cache for the process — defining the
    jit inside the calling function would retrace the full Pallas program
    on every batch)."""
    import jax
    from functools import partial

    front = partial(jax.jit, static_argnames=("st",))(_front_impl)
    dense_post = partial(jax.jit, static_argnames=("st",))(_dense_post_impl)
    return front, dense_post


_front_jit, _dense_post = _make_jits()


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

    if _use_pallas():
        from ...ops.pallas.support_kernel import support_candidates_pallas
        dcan = np.asarray(
            support_candidates_pallas(desc1[None], desc2[None], params)[0])
    else:
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


def _prior_coeff_job(dcan_b, params, W, H, use_native):
    """Host prior for one frame -> per-TRIANGLE coefficient wire + bitpacked
    candidate grids. The device rasterizes the plane maps itself
    (device_prior.py), so the upload is ~45 B/triangle instead of
    ~2.6 B/pixel — the decisive cut on tunnel-attached TPUs where the
    host->device wire (~28 MB/s) bounds ELAS throughput."""
    from .device_prior import prior_coeff_wire, sort_wire_rows
    from .prior import create_grid

    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Db = params.disp_max + 1
    if use_native:
        support = collect_support_points_native(dcan_b, params, W, H)
    else:
        support = collect_support_points(dcan_b, params, W, H)
    no_tri = np.zeros((0, 3), np.int32)
    if len(support) < 3:
        # reference bail-out semantics (elas.cpp:66-71): uncovered
        # everywhere -> the dense matcher emits all -10
        sp3 = np.zeros((3, 3), np.int32)
        empty = prior_coeff_wire(sp3, no_tri, False)
        zg = np.zeros((gh, gw, Db // 8), np.uint8)
        return empty, empty, zg, zg.copy()
    left_pts = support[:, :2].astype(np.float32)
    right_pts = np.stack(
        [support[:, 0] - support[:, 2], support[:, 1]], -1
    ).astype(np.float32)
    t1 = delaunay(left_pts)
    t2 = delaunay(right_pts)
    if use_native:
        from .native_prior import build_grid_native, fit_planes_native
        w1 = prior_coeff_wire(support, t1, False, fit_planes_native)
        w2 = prior_coeff_wire(support, t2, True, fit_planes_native)
        g1 = build_grid_native(support, W, H, False, params)
        g2 = build_grid_native(support, W, H, True, params)
    else:
        w1 = prior_coeff_wire(support, t1, False)
        w2 = prior_coeff_wire(support, t2, True)
        g1 = create_grid(support, W, H, False, params)
        g2 = create_grid(support, W, H, True, params)
    g1p = np.packbits(g1, axis=-1, bitorder="little")
    g2p = np.packbits(g2, axis=-1, bitorder="little")
    # top-row sort: lets the device raster paint short row slabs
    # (paint_idx preserves winner-takes-last order independence)
    return sort_wire_rows(w1), sort_wire_rows(w2), g1p, g2p


def _chunk_pad_T(wires) -> int:
    """Triangle-count pad for a chunk, laddered to bound retraces."""
    Tm = max(max(len(w[0].corners_u), len(w[1].corners_u), 1)
             for w in wires)
    return -(-Tm // 512) * 512


def _flatten_chunk_wire(wires, Tp) -> np.ndarray:
    """ONE int32 buffer for a whole chunk: both sides' padded coefficient
    arrays + the bitpacked candidate grids, in a fixed slice order the
    device unflattens (_raster_chunk). On tunnel-attached TPUs every
    host->device transfer pays ~25 ms RTT and ~15-30 MB/s, so BOTH
    transfer count and bytes bound ELAS throughput; this is one upload of
    ~35 B/triangle + grids per chunk."""
    from .device_prior import pad_coeff_wire

    parts = []
    for side in (0, 1):
        ws = [pad_coeff_wire(w[side], Tp) for w in wires]
        parts.append(np.stack([x.corners_u for x in ws])
                     .reshape(-1).view(np.int32))           # int16 pairs
        parts.append(np.stack([x.corners_v for x in ws])
                     .reshape(-1).view(np.int32))
        parts.append(np.stack([x.slope_bits for x in ws]).ravel())
        parts.append(np.stack([x.plane_bits for x in ws]).ravel())
        parts.append(np.stack([x.pvalid for x in ws])
                     .reshape(-1).view(np.int32))           # uint8 quads
        parts.append(np.stack([x.paint_idx for x in ws])
                     .reshape(-1).view(np.int32))           # int16 pairs
    for gi in (2, 3):
        g = np.stack([w[gi] for w in wires])    # [CH, gh, gw, Db//8] u8
        parts.append(np.ascontiguousarray(g).reshape(-1).view(np.int32))
    return np.concatenate(parts).astype(np.int32, copy=False)


_RASTER_JITS = {}


def _raster_chunk(flat_dev, CH, Tp, gh, gw, Db, W, H):
    """Unflatten one chunk wire on device and rasterize both sides' prior
    maps (device_prior._prior_maps_impl, bit-exact plain f32). Returns
    ((dp, valid, covered) x2, grid u8 x2) — all device arrays."""
    import jax

    key = (CH, Tp, gh, gw, Db, W, H)
    if key not in _RASTER_JITS:
        import jax.numpy as jnp
        from functools import partial
        from .device_prior import _raster_add_impl, _raster_mul_impl

        def unflat(flat):
            pos = [0]

            def take(n, dtype=None):
                x = jax.lax.slice_in_dim(flat, pos[0], pos[0] + n)
                pos[0] += n
                if dtype is not None:
                    x = jax.lax.bitcast_convert_type(x, dtype)
                return x

            sides = []
            for _ in range(2):
                cu = take(CH * Tp * 3 // 2, jnp.int16).reshape(CH, Tp, 3)
                cv = take(CH * Tp, jnp.int16).reshape(CH, Tp, 2)
                sb = take(CH * Tp * 3).reshape(CH, Tp, 3)
                pb = take(CH * Tp * 3).reshape(CH, Tp, 3)
                pv = take(CH * Tp // 4, jnp.uint8).reshape(CH, Tp) \
                    .astype(bool)
                pidx = take(CH * Tp // 2, jnp.int16).reshape(CH, Tp)
                sides.append((cu, cv, sb, pb, pv, pidx))
            grids = []
            for _ in range(2):
                u8 = take(CH * gh * gw * (Db // 8) // 4, jnp.uint8)
                grids.append(u8.reshape(CH, gh, gw, Db // 8))
            return sides, grids

        # two dispatches — multiplies and adds must not share an
        # executable or XLA:CPU contracts them into single-rounding FMAs
        # (see device_prior._raster_mul_impl)
        def muls(flat):
            sides, _ = unflat(flat)
            mul = jax.vmap(partial(_raster_mul_impl, W=W, H=H))
            return (mul(sides[0][0], sides[0][2], sides[0][3]),
                    mul(sides[1][0], sides[1][2], sides[1][3]))

        def adds(flat, prods):
            sides, grids = unflat(flat)
            impl = partial(_raster_add_impl, W=W, H=H)

            # lax.map, NOT vmap: the raster's short-slab/full-height
            # lax.cond stays a real branch per frame (vmap would execute
            # both branches for every frame)
            def add(side, pr):
                cu, cv, sb, pb, pv, pidx = side
                return jax.lax.map(
                    lambda a: impl(a[0], a[1], a[2], a[3], a[4], *a[5:]),
                    (cu, cv, pb, pv, pidx, *pr))

            return (add(sides[0], prods[0]), add(sides[1], prods[1]),
                    grids[0], grids[1])

        _RASTER_JITS[key] = (jax.jit(muls), jax.jit(adds))
    mul_jit, add_jit = _RASTER_JITS[key]
    return add_jit(flat_dev, mul_jit(flat_dev))


def elas_match_batch_device(
    left_b,
    right_b,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
):
    """Batched ELAS returning DEVICE arrays [B, H, W] float32.

    Tunnel-minimal design: per batch there is ONE download (the support
    candidate grids, ~24 KB/frame) and ONE upload per chunk (the flat
    per-triangle coefficient wire, ~0.4 MB/frame); the prior maps are
    rasterized on device with bit-exact softfloat (device_prior.py) and
    the ENTIRE postprocess chain — including the speckle connected
    components the reference does as a host BFS — runs on device, so no
    disparity data ever crosses the wire. Host work (support pruning,
    Delaunay, plane fit — all O(support)) is pipelined: while the device
    rasterizes + matches chunk k, the host (one core here) prepares the
    coefficients of chunk k+1.
    """
    from concurrent.futures import ThreadPoolExecutor

    if params.subsampling:
        raise ValueError(
            "batched path does not support subsampling; use elas_match")
    if use_native is None:
        use_native = _HAVE_NATIVE
    left = jnp.asarray(left_b)
    right = jnp.asarray(right_b)
    B, H, W = left.shape
    if chunk is None or chunk >= B:
        chunk = B
    if B % chunk:
        raise ValueError(f"chunk {chunk} must divide batch {B}")
    static = _Static(params, _use_pallas())
    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Db = params.disp_max + 1

    d1, d2, dcan_dev = _front(left, right, static)
    dcan = np.asarray(dcan_dev)          # ~24 KB/frame download

    def upload_chunk(prior_futs, c0):
        """Pool job: flatten + upload one chunk's wire as soon as its
        frames' host priors are done — the transfer (GIL-released) then
        overlaps the host prior work of later chunks on this 1-core box."""
        wires = [prior_futs[b].result() for b in range(c0, c0 + chunk)]
        Tp = _chunk_pad_T(wires)
        return jnp.asarray(_flatten_chunk_wire(wires, Tp)), Tp

    outs = []
    with ThreadPoolExecutor(max_workers=3) as pool:
        prior_futs = [
            pool.submit(_prior_coeff_job, dcan[b], params, W, H, use_native)
            for b in range(B)]
        # upload jobs are queued AFTER every prior job, so pool workers
        # always have runnable priors ahead of a blocking result() wait
        up_futs = [pool.submit(upload_chunk, prior_futs, c0)
                   for c0 in range(0, B, chunk)]
        for c0, uf in zip(range(0, B, chunk), up_futs):
            flat, Tp = uf.result()
            m1, m2, g1, g2 = _raster_chunk(flat, chunk, Tp, gh, gw, Db,
                                           W, H)
            sl = slice(c0, c0 + chunk)
            outs.append(
                _dense_post(d1[sl], d2[sl], *m1, g1, *m2, g2, static))

    if len(outs) == 1:
        return outs[0]
    D1 = jnp.concatenate([o[0] for o in outs])
    D2 = jnp.concatenate([o[1] for o in outs])
    return D1, D2


def elas_match_batch(
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched ELAS: [B, H, W] pairs -> [B, H, W] disparity maps (host)."""
    D1, D2 = elas_match_batch_device(
        left_u8, right_u8, params, use_native, chunk)
    return np.asarray(D1), np.asarray(D2)
