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
from .prior import build_priors, pack_prior_wire
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


def _packbits_dev(mask):
    """[..., W] bool -> [..., W/8] uint8, little bit order (np.packbits
    inverse on host). W must be padded to a multiple of 8 by the caller."""
    import jax.numpy as jnp

    W = mask.shape[-1]
    m = mask.reshape(mask.shape[:-1] + (W // 8, 8)).astype(jnp.int32)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    return (m * weights).sum(-1).astype(jnp.uint8)


def _unpackbits_dev(packed, width):
    """[..., Wb] uint8 -> [..., width] bool (little bit order)."""
    import jax.numpy as jnp

    bits = (packed[..., :, None].astype(jnp.int32)
            >> jnp.arange(8, dtype=jnp.int32)) & 1
    out = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return out[..., :width].astype(bool)


def _unpack_prior_wire(wire, gridp, D):
    """Inverse of prior.pack_prior_wire, on device (fuses into the dense
    kernel's prologue)."""
    import jax.numpy as jnp

    w = wire.astype(jnp.int32)
    d_plane = ((w & 0x3FF) - 512).astype(jnp.int16)
    valid = ((w >> 10) & 1).astype(bool)
    covered = ((w >> 11) & 1).astype(bool)
    grid = _unpackbits_dev(gridp, D)
    return d_plane, valid, covered, grid


def _dense_lr_impl(d1, d2, w1, g1, w2, g2, st: _Static):
    """Unpack priors -> dense match both sides -> L/R check -> BFS wire
    encode (uint8 disparity + bitpacked invalid mask), one dispatch."""
    import jax

    p = st.params
    D = p.disp_max + 1
    m1 = _unpack_prior_wire(w1, g1, D)
    m2 = _unpack_prior_wire(w2, g2, D)
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
    D1c, D2c = jax.vmap(
        lambda a, b: left_right_consistency_check(a, b, p))(D1, D2)
    W = D1c.shape[-1]
    Wp = -(-W // 8) * 8

    def enc(Dc):
        u8 = jnp.clip(Dc, 0, 255).astype(jnp.uint8)
        inv = jnp.pad(Dc < 0, ((0, 0), (0, 0), (0, Wp - W)))
        return u8, _packbits_dev(inv)
    enc2 = None if p.postprocess_only_left else enc(D2c)
    return D1c, D2c, enc(D1c), enc2


def _keep_tail_impl(D1c, D2c, k1, k2, st: _Static):
    """Apply the host BFS keep masks and run the device post tail."""
    import jax

    p = st.params
    W = D1c.shape[-1]
    D1b = jnp.where(_unpackbits_dev(k1, W), D1c, -10.0)
    D2b = D2c if k2 is None else jnp.where(
        _unpackbits_dev(k2, W), D2c, -10.0)
    return jax.vmap(lambda a, b: post_tail(a, b, p))(D1b, D2b)


def _make_jits():
    """Module-level jit wrappers (ONE cache for the process — defining the
    jit inside the calling function would retrace the full Pallas program
    on every batch)."""
    import jax
    from functools import partial

    front = partial(jax.jit, static_argnames=("st",))(_front_impl)
    dense = partial(jax.jit, static_argnames=("st",))(_dense_lr_impl)
    tail = partial(jax.jit, static_argnames=("st",))(_keep_tail_impl)
    return front, dense, tail


_front_jit, _dense_lr, _keep_tail = _make_jits()


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


def _prior_wire_job(dcan_b, params, W, H, use_native):
    """Host prior for one frame -> packed wire arrays (thread-pool job; the
    native engine releases the GIL during C calls). A frame with <3 support
    points returns zero wire (covered=0 everywhere -> the dense matcher
    emits all -10, the reference's bail-out semantics, elas.cpp:66-71)."""
    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Db = params.disp_max + 1
    _, priors = _host_prior(dcan_b, params, W, H, None, None, use_native)
    if priors is None:
        z = np.zeros((H, W), np.int16)
        zg = np.zeros((gh, gw, Db // 8), np.uint8)
        return z, zg, z.copy(), zg.copy()
    m1, m2, g1, g2 = priors
    w1, g1p = pack_prior_wire(m1, g1)
    w2, g2p = pack_prior_wire(m2, g2)
    return w1, g1p, w2, g2p


def _bfs_keep_job(d_u8, invp, params):
    """Host BFS speckle removal from the compact device wire: returns the
    bitpacked keep mask (pixels surviving removeSmallSegments)."""
    H, W = d_u8.shape
    d = d_u8.astype(np.float32)
    inv = np.unpackbits(invp, axis=-1, bitorder="little")[:, :W].astype(bool)
    d[inv] = -10.0
    out = remove_small_segments_native(d, params)
    keep = out >= 0
    Wp = -(-W // 8) * 8
    keep = np.pad(keep, ((0, 0), (0, Wp - W)))
    return np.packbits(keep, axis=-1, bitorder="little")


def elas_match_batch_device(
    left_b,
    right_b,
    params: ElasParams = ElasParams(),
    use_native: Optional[bool] = None,
    chunk: Optional[int] = None,
):
    """Batched ELAS returning DEVICE arrays [B, H, W] float32.

    Software-pipelined around the two host stages (prior engine, BFS
    speckle): device segments are single async dispatches per chunk, host
    work runs on a thread pool, and the wire formats are bit-packed so the
    host<->device traffic is ~1.5 MB/frame (the binding resource on
    tunnel-attached TPUs). With `chunk` set (must divide B), the host prior
    of chunk k+1 overlaps the dense matching of chunk k.
    """
    import jax
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

    d1, d2, dcan_dev = _front(left, right, static)
    dcan = np.asarray(dcan_dev)          # ~24 KB/frame download

    n_workers = min(B, os.cpu_count() or 8)
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        prior_futs = [
            pool.submit(_prior_wire_job, dcan[b], params, W, H, use_native)
            for b in range(B)]

        if not use_native:
            # fallback: device postprocess (no host BFS round trip)
            wires = [f.result() for f in prior_futs]
            w1 = jnp.asarray(np.stack([w[0] for w in wires]))
            g1 = jnp.asarray(np.stack([w[1] for w in wires]))
            w2 = jnp.asarray(np.stack([w[2] for w in wires]))
            g2 = jnp.asarray(np.stack([w[3] for w in wires]))
            D = params.disp_max + 1
            m1 = _unpack_prior_wire(w1, g1, D)
            m2 = _unpack_prior_wire(w2, g2, D)
            D1, D2 = _dense_both(d1, d2, m1, m2, params)
            return jax.vmap(lambda a, b: postprocess(a, b, params))(D1, D2)

        # chunked pipeline: upload + dense dispatch as priors complete
        dense_out = []
        for c0 in range(0, B, chunk):
            wires = [prior_futs[b].result() for b in range(c0, c0 + chunk)]
            w1 = jnp.asarray(np.stack([w[0] for w in wires]))
            g1 = jnp.asarray(np.stack([w[1] for w in wires]))
            w2 = jnp.asarray(np.stack([w[2] for w in wires]))
            g2 = jnp.asarray(np.stack([w[3] for w in wires]))
            sl = slice(c0, c0 + chunk)
            dense_out.append(
                _dense_lr(d1[sl], d2[sl], w1, g1, w2, g2, static))

        # BFS keep masks per chunk (downloads block per chunk; later
        # chunks' dense work is already queued on the device)
        tails = []
        for (D1c, D2c, enc1, enc2) in dense_out:
            u8_1, inv1 = np.asarray(enc1[0]), np.asarray(enc1[1])
            k1_futs = [pool.submit(_bfs_keep_job, u8_1[i], inv1[i], params)
                       for i in range(chunk)]
            if enc2 is not None:
                u8_2, inv2 = np.asarray(enc2[0]), np.asarray(enc2[1])
                k2_futs = [pool.submit(_bfs_keep_job, u8_2[i], inv2[i],
                                       params)
                           for i in range(chunk)]
                k2 = jnp.asarray(np.stack([f.result() for f in k2_futs]))
            else:
                k2 = None
            k1 = jnp.asarray(np.stack([f.result() for f in k1_futs]))
            tails.append(_keep_tail(D1c, D2c, k1, k2, static))

    D1 = jnp.concatenate([t[0] for t in tails]) if len(tails) > 1 \
        else tails[0][0]
    D2 = jnp.concatenate([t[1] for t in tails]) if len(tails) > 1 \
        else tails[0][1]
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
