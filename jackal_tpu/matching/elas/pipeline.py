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
    # static L/R sweep bound (post.left_right_consistency_check): the
    # host-known scene disparity ceiling, laddered to multiples of 32 to
    # bound retraces. -1 = full disp_max sweep.
    lr_smax: int = -1


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


def _dense_post_impl(d1, d2, dp1, va1, cv1, g1, dp2, va2, cv2, g2,
                     st: _Static):
    """Dense match from DEVICE-computed prior maps (device_prior.py) +
    the FULL device postprocess chain (L/R check, speckle CC, gaps,
    adaptive mean, median) in one dispatch. The device speckle
    (post.remove_small_segments) is bit-identical to the reference BFS,
    so no disparity wire ever leaves the device. Grids g1/g2 arrive as
    device bool [B, gh, gw, D] (computed on device, device_prior._grid_impl)."""
    import jax

    p = st.params
    m1 = (dp1, va1, cv1, g1)
    m2 = (dp2, va2, cv2, g2)
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
    from .post import postprocess_batch
    return postprocess_batch(D1, D2, p, st.lr_smax)


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


def _content_perm(dcan, B: int, chunk: int):
    """Frame order for content-homogeneous chunks, plus its inverse.

    Chunk pads (Np/Tp/Ts) and the speckle fixed-point iteration count are
    per-chunk MAXIMA, so a mixed chunk bills every frame at the most
    complex frame's cost (a sparse-support frame pays a dense frame's
    triangle pad ~7x over, and the CC while_loop runs the worst frame's
    sweep count for the whole chunk). Sorting frames by support-candidate
    count — the standard serving move, cf. sequence-length bucketing —
    makes chunks homogeneous; outputs are restored to arrival order with
    one batch-axis take per side. Bit-free: per-frame results are
    pad-invariant (padded rows are masked everywhere; the L/R ladder
    elides provably-dead shifts), asserted by tests/test_elas.py's
    batch == per-frame suite on shuffled content.

    The key is the candidate count in the downloaded grid (available
    BEFORE the host priors run); ties keep arrival order (stable sort).
    """
    counts = np.asarray([(dcan[b] >= 0).sum() for b in range(B)])
    perm = np.argsort(counts, kind="stable")
    inv = np.empty(B, np.int64)
    inv[perm] = np.arange(B)
    return perm, inv, bool(np.all(perm == np.arange(B)))


def _prior_tri_job(dcan_b, params, W, H, use_native):
    """Host prior for one frame, v3: support collection + the two Delaunay
    triangulations + slab binning ONLY. Everything the old coefficient
    wire computed on host (f64 plane fit, corner sort, slope divisions,
    candidate grids) now runs on device in bit-exact softfloat
    (device_prior._tri_coeffs_impl / _grid_impl), so the wire is just
    (support, vertex indices, slab selection): ~65 KB/frame instead of
    ~320 KB — the upload was the ELAS throughput bound on tunnel-attached
    TPUs (~10 ms/MB)."""
    from .device_prior import (_RASTER_CTILE, _RASTER_SLAB, slab_select,
                               tri_wire)

    if use_native:
        support = collect_support_points_native(dcan_b, params, W, H)
    else:
        support = collect_support_points(dcan_b, params, W, H)
    if len(support) < 3:
        # reference bail-out semantics (elas.cpp:66-71): no triangles ->
        # uncovered everywhere -> the dense matcher emits all -10
        e3 = np.zeros((0, 3), np.int16)
        e1 = np.zeros((0,), np.int16)
        S = -(-H // _RASTER_SLAB) * -(-W // _RASTER_CTILE)
        es = np.full((S, 1), -1, np.int32)
        return (np.zeros((0, 3), np.int16), e3, e1, e3.copy(), e1.copy(),
                es, es.copy())
    left_pts = support[:, :2].astype(np.float32)
    right_pts = np.stack(
        [support[:, 0] - support[:, 2], support[:, 1]], -1
    ).astype(np.float32)
    sp16 = support.astype(np.int16)
    if use_native:
        from .native_prior import tri_wire_and_bin_native
        t1, p1, sel1 = tri_wire_and_bin_native(
            sp16, delaunay(left_pts), W, H, _RASTER_SLAB, _RASTER_CTILE)
        t2, p2, sel2 = tri_wire_and_bin_native(
            sp16, delaunay(right_pts), W, H, _RASTER_SLAB, _RASTER_CTILE,
            right=True)
    else:
        t1, p1 = tri_wire(support, delaunay(left_pts))
        t2, p2 = tri_wire(support, delaunay(right_pts))
        sel1 = slab_select(support, t1, W, H, _RASTER_SLAB, _RASTER_CTILE)
        sel2 = slab_select(support, t2, W, H, _RASTER_SLAB, _RASTER_CTILE,
                           right=True)
    return sp16, t1, p1, t2, p2, sel1, sel2


def _pad_up(n: int, step: int = 512) -> int:
    return -(-max(n, 1) // step) * step


def _lr_ladder(wires, params: ElasParams) -> int:
    """Static L/R sweep bound for a chunk: max support disparity + 2
    (the provable ceiling of every dense output — grid candidates reach
    max support d + 1, plane windows d_plane + plane_radius = 2) plus one
    ladder margin, rounded up to 32 so at most disp_max/32 variants of the
    dense+post program ever compile."""
    maxd = -1
    for w in wires:
        if len(w[0]):
            maxd = max(maxd, int(w[0][:, 2].max()))
    if maxd < 0:
        return 32
    return min(params.disp_max, -(-(maxd + 3) // 32) * 32)


def _chunk_pads(wires):
    """(Np, Tp, Ts) pads for a chunk, laddered to bound retraces. Tp is
    padded past the largest triangle count so index Tp-1 is always a
    degenerate (empty-span, paint -1) row — the slab selections pad with
    it."""
    Np = _pad_up(max(len(w[0]) for w in wires))
    Tp = _pad_up(max(max(len(w[1]), len(w[3])) for w in wires) + 1)
    # per-tile triangle lists are short (column tiling): a fine ladder
    # keeps the padded raster tensor small (pad waste is the dominant
    # raster cost at 32-column tiles)
    Ts = _pad_up(max(max(w[5].shape[1], w[6].shape[1]) for w in wires), 16)
    return Np, Tp, Ts


def _flatten_chunk_wire(wires, Np, Tp, Ts) -> np.ndarray:
    """ONE int32 buffer for a whole chunk: padded support triples, both
    sides' padded (triangle, paint) index arrays, then both sides' slab
    selections, all int16. On tunnel-attached TPUs every host->device
    transfer pays ~25 ms RTT, so both transfer COUNT and bytes matter;
    this is one upload of ~65 KB/frame. Padded support rows carry d = -1
    (grid-masked); padded triangle rows index support[0] thrice (empty
    raster span); padded selection slots index the degenerate row Tp-1.

    Production path is the C++ single-pass (wire_engine.cpp
    flatten_chunk_wire, ~0.05 ms/chunk); the numpy twin below remains as
    the toolchain-less fallback and the test oracle
    (tests/test_device_prior.py asserts byte equality)."""
    if _HAVE_NATIVE:
        return _flatten_chunk_wire_native(wires, Np, Tp, Ts)
    return _flatten_chunk_wire_np(wires, Np, Tp, Ts)


def _flatten_chunk_wire_native(wires, Np, Tp, Ts) -> np.ndarray:
    import ctypes
    from ...native import load as _load_native

    lib = _load_native()
    CH = len(wires)
    SC = wires[0][5].shape[0]
    # contiguity guards are no-ops on the native wire path's outputs
    keep = [[np.ascontiguousarray(w[k], np.int16) for k in range(7)]
            for w in wires]
    i64 = np.int64
    sp_ptrs = np.array([f[0].ctypes.data for f in keep], i64)
    sp_lens = np.array([len(f[0]) for f in keep], np.int32)
    tri_ptrs = np.array([f[1].ctypes.data for f in keep]
                        + [f[3].ctypes.data for f in keep], i64)
    paint_ptrs = np.array([f[2].ctypes.data for f in keep]
                          + [f[4].ctypes.data for f in keep], i64)
    tri_lens = np.array([len(f[1]) for f in keep]
                        + [len(f[3]) for f in keep], np.int32)
    sel_ptrs = np.array([f[5].ctypes.data for f in keep]
                        + [f[6].ctypes.data for f in keep], i64)
    sel_ts = np.array([f[5].shape[1] for f in keep]
                      + [f[6].shape[1] for f in keep], np.int32)
    L16 = CH * Np * 3 + 2 * (CH * Tp * 3 + CH * Tp) + 2 * (CH * SC * Ts)
    out = np.empty(L16, np.int16)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.flatten_chunk_wire(
        p(sp_ptrs, ctypes.c_int64), p(sp_lens, ctypes.c_int32),
        p(tri_ptrs, ctypes.c_int64), p(paint_ptrs, ctypes.c_int64),
        p(tri_lens, ctypes.c_int32),
        p(sel_ptrs, ctypes.c_int64), p(sel_ts, ctypes.c_int32),
        CH, Np, Tp, Ts, SC, p(out, ctypes.c_int16))
    return out.view(np.int32)


def _flatten_chunk_wire_np(wires, Np, Tp, Ts) -> np.ndarray:
    from .device_prior import pad_tri_wire

    parts = []
    sp = np.zeros((len(wires), Np, 3), np.int16)
    sp[:, :, 2] = -1
    for i, w in enumerate(wires):
        sp[i, :len(w[0])] = w[0]
    parts.append(sp.reshape(-1).view(np.int32))
    for ti, pi in ((1, 2), (3, 4)):
        tris = np.zeros((len(wires), Tp, 3), np.int16)
        paints = np.zeros((len(wires), Tp), np.int16)
        for i, w in enumerate(wires):
            t, p = pad_tri_wire(w[ti], w[pi], Tp)
            tris[i], paints[i] = t, p
        parts.append(tris.reshape(-1).view(np.int32))
        parts.append(paints.reshape(-1).view(np.int32))
    for si in (5, 6):
        S = wires[0][si].shape[0]
        sels = np.full((len(wires), S, Ts), Tp - 1, np.int16)
        for i, w in enumerate(wires):
            s = w[si]
            sels[i, :, :s.shape[1]] = np.where(s < 0, Tp - 1, s)
        parts.append(sels.reshape(-1).view(np.int32))
    return np.concatenate(parts).astype(np.int32, copy=False)


_RASTER_JITS = {}


def _raster_chunk(flat_dev, CH, Np, Tp, Ts, gh, gw, Db, W, H, gs):
    """Unflatten one chunk wire on device, compute the per-triangle
    coefficients (softfloat f64 plane fit + correctly-rounded f32 slopes),
    build the candidate grids, and rasterize both sides' prior maps —
    bit-exact to the host engine. Returns ((dp, valid, covered) x2,
    grid bool x2), all device arrays. THREE dispatches: coeffs+grids
    (traced under x64 for the softfloat int64 lanes), slab-raster
    multiplies, slab-raster adds — the mul/add split forbids FMA
    contraction on XLA:CPU (see device_prior._raster_mul_impl); on TPU
    the last two fuse into one executable (no contraction there,
    verified bitwise on hardware).

    The raster is the slab form (device_prior._slab_raster_impl):
    host-binned row bands, packed-key winner max, ONE parallel reduce —
    the old per-64-triangle fori/cond scanline loop spent ~5x its ALU
    cost on sequential-loop overhead."""
    import jax

    key = (CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    if key not in _RASTER_JITS:
        import jax.numpy as jnp
        from functools import partial
        from .device_prior import (_RASTER_CTILE, _RASTER_SLAB, _grid_impl,
                                   _slab_products_impl, _slab_raster_impl,
                                   _tri_coeffs_impl)

        S = -(-H // _RASTER_SLAB)
        C = -(-W // _RASTER_CTILE)

        def unflat(flat):
            pos = [0]

            def take(n):
                x = jax.lax.slice_in_dim(flat, pos[0], pos[0] + n)
                pos[0] += n
                return jax.lax.bitcast_convert_type(x, jnp.int16)

            sp = take(CH * Np * 3 // 2).reshape(CH, Np, 3) \
                .astype(jnp.int32)
            sides = []
            for _ in range(2):
                tri = take(CH * Tp * 3 // 2).reshape(CH, Tp, 3) \
                    .astype(jnp.int32)
                paint = take(CH * Tp // 2).reshape(CH, Tp)
                sides.append([tri, paint])
            for s in sides:
                s.append(take(CH * S * C * Ts // 2).reshape(CH, S * C, Ts)
                         .astype(jnp.int32))
            return sp, sides

        def coeffs(flat):
            with jax.enable_x64(True):
                sp, sides = unflat(flat)
                # flatten the frame axis for the per-triangle math: a
                # vmapped support[tri] gather (batched gather) runs off
                # the TPU fast path (~10 ms/chunk measured); one flat
                # gather with frame-offset indices is ~50x cheaper
                sp_flat = sp.reshape(CH * Np, 3)
                offs = (jnp.arange(CH, dtype=jnp.int32)
                        * Np)[:, None, None]
                toffs = (jnp.arange(CH, dtype=jnp.int32)
                         * Tp)[:, None, None]
                # BOTH sides' triangle lists in ONE double-width call:
                # the softfloat fit / slope chains are ~100 tiny
                # [T]-shaped ops whose per-op overhead dominates at this
                # size, so one 2T-wide call halves it
                K = CH * Tp
                tri_cat = jnp.concatenate(
                    [(sides[0][0] + offs).reshape(K, 3),
                     (sides[1][0] + offs).reshape(K, 3)])
                rflags = jnp.concatenate(
                    [jnp.zeros((K,), bool), jnp.ones((K,), bool)])
                cu2, cv2, sb2, pb2, pv2 = _tri_coeffs_impl(
                    sp_flat, tri_cat, rflags)
                # both sides' candidate grids in one 2*CH vmap
                sp2 = jnp.concatenate([sp, sp])
                r2 = jnp.concatenate([jnp.zeros((CH,), bool),
                                      jnp.ones((CH,), bool)])
                grid2 = jax.vmap(partial(
                    _grid_impl, gs=gs, gh=gh, gw=gw,
                    disp_max=Db - 1))(sp2, r2)
                out = []
                for i, (tri, paint, sel) in enumerate(sides):
                    sl = slice(i * K, (i + 1) * K)
                    sel_flat = (sel + toffs).reshape(CH * S * C * Ts)
                    out.append((cu2[sl].astype(jnp.int16),
                                cv2[sl].astype(jnp.int16),
                                sb2[sl], pb2[sl], pv2[sl],
                                paint.reshape(CH * Tp),
                                grid2[i * CH:(i + 1) * CH], sel_flat))
                return tuple(out)

        def _tile0():
            band = jnp.arange(S * C, dtype=jnp.int32)[None, :, None]
            row0 = (band // C) * _RASTER_SLAB
            col0 = (band % C) * _RASTER_CTILE
            shape = (CH, S * C, Ts)
            return (jnp.broadcast_to(row0, shape).reshape(-1),
                    jnp.broadcast_to(col0, shape).reshape(-1))

        def muls(side):
            cu, cv, sb, pb, pv, paint, grid, sel = side
            row0, col0 = _tile0()
            return _slab_products_impl(
                sel, row0, col0, cu.astype(jnp.int32), sb, pb,
                CT=_RASTER_CTILE, slab=_RASTER_SLAB)

        def adds(side, pr):
            cu, cv, sb, pb, pv, paint, grid, sel = side
            row0, col0 = _tile0()
            return _slab_raster_impl(
                sel, row0, col0, cu.astype(jnp.int32),
                cv.astype(jnp.int32), pb, pv, paint, *pr,
                CH=CH, S=S, C=C, Ts=Ts, W=W, H=H, slab=_RASTER_SLAB,
                CT=_RASTER_CTILE)

        def rasters(s1, s2, pr1, pr2):
            return adds(s1, pr1), adds(s2, pr2)

        def rasters_fused(s1, s2):
            # TPU only: one executable for muls+adds. The mul/add split
            # exists to forbid FMA contraction on XLA:CPU; the target TPU
            # keeps mul and add as separate RNE ops in one executable
            # (measured — device_prior._raster_mul_impl), so fusing there
            # is bit-safe and keeps the products out of HBM.
            return adds(s1, muls(s1)), adds(s2, muls(s2))

        def raster_kernel(s1, s2):
            # TPU production path: the Pallas slab-raster kernel
            # (ops/pallas/raster_kernel.py) — VMEM winner accumulation,
            # image-layout output rows, per-tile live-count skip. Same
            # f32 op sequence (no FMA on the TPU VPU); bit-identical to
            # rasters_fused (tests/test_device_prior.py).
            from ...ops.pallas.raster_kernel import (decode_win,
                                                     pack_table,
                                                     raster_pallas)

            outs = []
            for cu, cv, sb, pb, pv, paint, grid, sel in (s1, s2):
                tab = pack_table(cu, cv, sb, pb, pv, paint, sel,
                                 CH, S, C, Ts)
                local = sel.reshape(CH, S, C, Ts) % jnp.int32(Tp)
                cnt = jnp.sum(local != Tp - 1, axis=-1, dtype=jnp.int32)
                win = raster_pallas(cnt[:, :, None, :], tab, CH=CH, S=S,
                                    C=C, Ts=Ts, slab=_RASTER_SLAB, W=W,
                                    H=H, CT=_RASTER_CTILE)
                outs.append(decode_win(win))
            return tuple(outs)

        _RASTER_JITS[key] = (jax.jit(coeffs), jax.jit(muls),
                             jax.jit(rasters), jax.jit(rasters_fused),
                             jax.jit(raster_kernel), raster_kernel,
                             coeffs)
    (coeff_jit, mul_jit, add_jit, fused_jit, kernel_jit,
     kernel_fn) = _RASTER_JITS[key][:6]
    with jax.enable_x64(True):
        s1, s2 = coeff_jit(flat_dev)
    if jax.default_backend() == "tpu":
        m1, m2 = kernel_jit(s1, s2)
    else:
        m1, m2 = add_jit(s1, s2, mul_jit(s1), mul_jit(s2))
    return m1, m2, s1[6], s2[6]


_TAIL_JITS = {}


def _raster_dense_post(flat_dev, d1c, d2c, CH, Np, Tp, Ts, gh, gw, Db,
                       W, H, gs, st: "_Static"):
    """One chunk's full device tail. TPU: ONE dispatch — coeffs+grids
    (softfloat, traced under a local x64 scope) + the Pallas raster
    kernel + dense matching + the whole postprocess in a single
    executable (each dispatch costs ~1 ms of command-channel time on the
    tunnel-attached rig, and on any host it is one fewer host->device
    argument marshal). CPU keeps the three-dispatch form: the slab
    raster's mul/add split must stay in separate executables there to
    forbid FMA contraction; the coeff x64 scope exits before the dense
    trace so the postprocess literals stay 32-bit (bitwise-verified on
    hardware against the split form, round 5)."""
    import jax

    key = (CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    if key not in _RASTER_JITS:
        # populate the cache (and handle the CPU path) in one place
        return None, _raster_chunk(flat_dev, CH, Np, Tp, Ts, gh, gw, Db,
                                   W, H, gs)
    if jax.default_backend() != "tpu":
        return None, _raster_chunk(flat_dev, CH, Np, Tp, Ts, gh, gw, Db,
                                   W, H, gs)
    coeffs_fn = _RASTER_JITS[key][6]
    kernel_fn = _RASTER_JITS[key][5]
    tkey = key + (st,)
    if tkey not in _TAIL_JITS:
        def tail(flat, d1, d2):
            s1, s2 = coeffs_fn(flat)     # opens its own x64 scope
            with jax.enable_x64(False):
                # the raster + dense + post trace must stay 32-bit
                # (weak literals under x64 would retype the whole chain)
                m1, m2 = kernel_fn(s1, s2)
                return _dense_post_impl(d1, d2, *m1, s1[6], *m2, s2[6],
                                        st)
        _TAIL_JITS[tkey] = jax.jit(tail)
    # trace AND lower under x64: the softfloat segment's ops (argmax
    # included) must see the same flag at lowering as at trace time, or
    # the lowered module fails type verification
    with jax.enable_x64(True):
        return _TAIL_JITS[tkey](flat_dev, d1c, d2c), None


def elas_match_batch_device(
    left_b,
    right_b,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
):
    """Batched ELAS returning DEVICE arrays [B, H, W] float32.

    Tunnel-minimal design: per batch there is ONE download (the support
    candidate grids, ~24 KB/frame) and ONE upload per chunk (support
    triples + triangle vertex indices, ~55 KB/frame); the plane fit,
    slope divisions, candidate grids and prior rasterization all run on
    device in bit-exact softfloat/f32 (device_prior.py) and the ENTIRE
    postprocess chain — including the speckle connected components the
    reference does as a host BFS — runs on device, so no disparity data
    ever crosses the wire. Host work (support pruning + Delaunay, the
    only stages left) is pipelined: while the device processes chunk k,
    the host (one core here) triangulates chunk k+1.
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
    perm, inv, perm_id = _content_perm(dcan, B, chunk)
    if not perm_id:
        pj = jnp.asarray(perm)
        d1 = jnp.take(d1, pj, axis=0)
        d2 = jnp.take(d2, pj, axis=0)

    def upload_chunk(prior_futs, c0):
        """Pool job: flatten + upload one chunk's wire as soon as its
        frames' host priors are done — the transfer (GIL-released) then
        overlaps the host prior work of later chunks on this 1-core box."""
        wires = [prior_futs[b].result() for b in range(c0, c0 + chunk)]
        Np, Tp, Ts = _chunk_pads(wires)
        return (jnp.asarray(_flatten_chunk_wire(wires, Np, Tp, Ts)),
                Np, Tp, Ts, _lr_ladder(wires, params))

    outs = []
    with ThreadPoolExecutor(max_workers=3) as pool:
        prior_futs = [
            pool.submit(_prior_tri_job, dcan[perm[b]], params, W, H,
                        use_native)
            for b in range(B)]
        # upload jobs are queued AFTER every prior job, so pool workers
        # always have runnable priors ahead of a blocking result() wait
        up_futs = [pool.submit(upload_chunk, prior_futs, c0)
                   for c0 in range(0, B, chunk)]
        for c0, uf in zip(range(0, B, chunk), up_futs):
            flat, Np, Tp, Ts, lad = uf.result()
            sl = slice(c0, c0 + chunk)
            st = dataclasses.replace(static, lr_smax=lad)
            fused, fallback = _raster_dense_post(
                flat, d1[sl], d2[sl], chunk, Np, Tp, Ts, gh, gw, Db,
                W, H, gs, st)
            if fused is None:
                m1, m2, g1, g2 = fallback
                fused = _dense_post(d1[sl], d2[sl], *m1, g1, *m2, g2, st)
            outs.append(fused)

    if len(outs) == 1:
        D1, D2 = outs[0]
    else:
        D1 = jnp.concatenate([o[0] for o in outs])
        D2 = jnp.concatenate([o[1] for o in outs])
    if not perm_id:
        ij = jnp.asarray(inv)
        D1 = jnp.take(D1, ij, axis=0)
        D2 = jnp.take(D2, ij, axis=0)
    return D1, D2


def elas_match_stream(
    pairs,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
    depth: int = 2,
):
    """Pipelined batched ELAS over a STREAM of (left, right) batch pairs.

    Yields (D1, D2) device arrays per input batch, in order. Same numeric
    contract as elas_match_batch_device (bit-exact stages); the difference
    is scheduling: batch k+1's front segment is dispatched to the device
    queue BEFORE batch k's raster/dense chain, so its candidate-grid
    download and host prior work (support pruning + Delaunay, the serial
    1-core stages) overlap batch k's device tail instead of stalling the
    device. Steady-state throughput is max(device, host) per batch rather
    than their sum — this is the production camera-stream shape
    (point_cloud.cpp consumes a topic stream, not one batch).

    depth: number of batches in flight (2 = classic double buffering).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if params.subsampling:
        raise ValueError(
            "batched path does not support subsampling; use elas_match")
    if use_native is None:
        use_native = _HAVE_NATIVE
    it = iter(pairs)
    static = _Static(params, _use_pallas())
    gs = params.grid_size

    def prep(fr, B, W, H, chunkB):
        """Worker: download candidate grids (blocks on batch front),
        order frames into content-homogeneous chunks (_content_perm),
        run the host priors, flatten + upload the chunk wires."""
        d1, d2, dcan_dev = fr
        dcan = np.asarray(dcan_dev)
        perm, inv, perm_id = _content_perm(dcan, B, chunkB)
        if not perm_id:
            pj = jnp.asarray(perm)
            d1 = jnp.take(d1, pj, axis=0)
            d2 = jnp.take(d2, pj, axis=0)
        wires = [_prior_tri_job(dcan[perm[b]], params, W, H, use_native)
                 for b in range(B)]
        chunks = []
        for c0 in range(0, B, chunkB):
            w = wires[c0:c0 + chunkB]
            Np, Tp, Ts = _chunk_pads(w)
            chunks.append(
                (jnp.asarray(_flatten_chunk_wire(w, Np, Tp, Ts)),
                 Np, Tp, Ts, c0, _lr_ladder(w, params)))
        return d1, d2, chunks, (None if perm_id else jnp.asarray(inv))

    with ThreadPoolExecutor(max_workers=depth) as pool:
        pending = deque()

        def start(pair):
            left = jnp.asarray(pair[0])
            right = jnp.asarray(pair[1])
            B, H, W = left.shape
            chunkB = chunk if chunk and chunk < B else B
            if B % chunkB:
                raise ValueError(f"chunk {chunkB} must divide batch {B}")
            fr = _front(left, right, static)        # async dispatch
            pending.append(
                (pool.submit(prep, fr, B, W, H, chunkB), chunkB, W, H))

        for _ in range(depth):
            nxt = next(it, None)
            if nxt is None:
                break
            start(nxt)
        while pending:
            fut, chunkB, W, H = pending.popleft()
            d1, d2, chunks, inv = fut.result()
            nxt = next(it, None)
            if nxt is not None:
                start(nxt)                          # front(k+depth) first
            gh, gw = -(-H // gs), -(-W // gs)
            Db = params.disp_max + 1
            outs = []
            for flat, Np, Tp, Ts, c0, lad in chunks:
                sl = slice(c0, c0 + chunkB)
                st = dataclasses.replace(static, lr_smax=lad)
                fused, fallback = _raster_dense_post(
                    flat, d1[sl], d2[sl], chunkB, Np, Tp, Ts, gh, gw,
                    Db, W, H, gs, st)
                if fused is None:
                    m1, m2, g1, g2 = fallback
                    fused = _dense_post(d1[sl], d2[sl], *m1, g1,
                                        *m2, g2, st)
                outs.append(fused)
            if len(outs) == 1:
                D1o, D2o = outs[0]
            else:
                D1o = jnp.concatenate([o[0] for o in outs])
                D2o = jnp.concatenate([o[1] for o in outs])
            if inv is not None:
                D1o = jnp.take(D1o, inv, axis=0)
                D2o = jnp.take(D2o, inv, axis=0)
            yield (D1o, D2o)


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


def elas_match_batch_multichip(
    left_u8: np.ndarray,
    right_u8: np.ndarray,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
    devices=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """ELAS data parallelism over chips: replica-per-device, frame-sharded.

    DESIGN (SURVEY §2.4 DP row). ELAS is the one engine with a per-frame
    host stage (support pruning + 2x Delaunay + slab binning, ~5
    ms/frame), so mesh-jit DP like dp_sharded_step does not apply: the
    host stage sits mid-pipeline, so there is no single jittable step to
    shard. The TPU-native shape is instead
    REPLICA parallelism — each chip runs the single-chip chunked pipeline
    on its frame shard, exactly like the reference's process-level
    parallelism runs one ELAS per node (launch/stereo.launch):

      phase 1: every replica's front segment (descriptors + support
        candidates) is dispatched async — all chips compute at once;
      phase 2: candidate grids download per replica; ALL frames' host
        priors are queued on one shared pool, so chip i's device chunks
        overlap chip j's host priors;
      phase 3: each chunk's wire is device_put to ITS chip and the
        raster + dense + postprocess dispatch asynchronously.

    CEILING (docs/performance.md): the host prior is serial on this
    1-core host at ~2-3 ms/frame, so DP scaling saturates at ~330-500
    fps TOTAL regardless of chip count; with H chips the per-chip device
    time (~8 ms/frame) hides completely once n >= 3. On a pod host with
    C cores the pool parallelizes C-fold and the ceiling moves to
    C * ~400 fps. Output is host-side [B, H, W] (cross-device concat
    forces a transfer anyway).
    """
    import jax
    from concurrent.futures import ThreadPoolExecutor

    if params.subsampling:
        raise ValueError(
            "batched path does not support subsampling; use elas_match")
    if use_native is None:
        use_native = _HAVE_NATIVE
    if devices is None:
        devices = jax.local_devices()
    left = np.asarray(left_u8)
    right = np.asarray(right_u8)
    B, H, W = left.shape
    n = len(devices)
    if B % n:
        raise ValueError(f"batch {B} not divisible by {n} devices")
    Bs = B // n
    if chunk is None or chunk >= Bs:
        chunk = Bs
    if Bs % chunk:
        raise ValueError(f"chunk {chunk} must divide shard {Bs}")
    static = _Static(params, _use_pallas())
    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Db = params.disp_max + 1

    # phase 1: all replicas' front dispatch before any blocking download
    fronts = []
    for i, dev in enumerate(devices):
        l = jax.device_put(left[i * Bs:(i + 1) * Bs], dev)
        r = jax.device_put(right[i * Bs:(i + 1) * Bs], dev)
        fronts.append(_front(l, r, static))

    def upload_chunk(prior_futs, c0, dev):
        wires = [prior_futs[b].result() for b in range(c0, c0 + chunk)]
        Np, Tp, Ts = _chunk_pads(wires)
        flat = _flatten_chunk_wire(wires, Np, Tp, Ts)
        return (jax.device_put(flat, dev), Np, Tp, Ts,
                _lr_ladder(wires, params))

    outs = [[] for _ in devices]
    with ThreadPoolExecutor(max_workers=3) as pool:
        dcans = [np.asarray(f[2]) for f in fronts]
        perms = []
        for i in range(n):
            perm, inv, perm_id = _content_perm(dcans[i], Bs, chunk)
            perms.append((perm, inv, perm_id))
            if not perm_id:
                d1, d2, dc = fronts[i]
                pj = jnp.asarray(perm)
                fronts[i] = (jnp.take(d1, pj, axis=0),
                             jnp.take(d2, pj, axis=0), dc)
        prior_futs = [
            [pool.submit(_prior_tri_job, dcans[i][perms[i][0][b]], params,
                         W, H, use_native) for b in range(Bs)]
            for i in range(n)]
        up_futs = [
            (i, pool.submit(upload_chunk, prior_futs[i], c0, devices[i]))
            for c0 in range(0, Bs, chunk) for i in range(n)]
        for i, uf in up_futs:
            flat, Np, Tp, Ts, lad = uf.result()
            d1, d2, _ = fronts[i]
            c0 = (len(outs[i])) * chunk
            sl = slice(c0, c0 + chunk)
            st = dataclasses.replace(static, lr_smax=lad)
            fused, fallback = _raster_dense_post(
                flat, d1[sl], d2[sl], chunk, Np, Tp, Ts, gh, gw, Db,
                W, H, gs, st)
            if fused is None:
                m1, m2, g1, g2 = fallback
                fused = _dense_post(d1[sl], d2[sl], *m1, g1, *m2, g2, st)
            outs[i].append(fused)

    shards1, shards2 = [], []
    for i, dev in enumerate(outs):
        s1 = np.concatenate([np.asarray(o[0]) for o in dev])
        s2 = np.concatenate([np.asarray(o[1]) for o in dev])
        _, inv, perm_id = perms[i]
        if not perm_id:
            s1, s2 = s1[inv], s2[inv]
        shards1.append(s1)
        shards2.append(s2)
    return np.concatenate(shards1), np.concatenate(shards2)
