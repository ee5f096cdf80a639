"""Pallas kernel for the ELAS dense MAP matcher (findMatch hot loop).

Same VMEM-resident design as the BM kernel: row-band grid, target
descriptor DMA'd into scratch, and a streaming keyed min over the d loop
(chunked onto the innermost grid dimension — see _elas_dense_kernel) that
reproduces the reference's candidate visit order exactly (grid candidates
ascending d, then the plane window ascending d; see matching/elas/dense.py
for the key encoding contract — this kernel computes the identical keys).

Inputs are precomputed by the jnp wrapper: row-clamped channel-major
descriptors, the host-evaluated d_plane, the pixel_ok/prior masks and the
pixel-resolution grid candidate mask (streamed per tile by BlockSpec).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ElasParams
from ...matching.elas.dense import prior_table, _KEY_BIAS

# (margins unnecessary in the rolled-target formulation)
_BIG = 1 << 30
_WINDOW = 2


def _elas_dense_kernel(live_ref, q_ref, t_hbm, dplane_ref, pvalid_ref,
                       pok_ref, grid_ref, out_ref, t_scr, sem,
                       *, D, TH, W, W_real, GS, radius, P_host, right_image,
                       DCH):
    """One row-band x one d-chunk. The d loop rides the innermost grid
    dimension in DCH-wide chunks (Mosaic compile time is super-linear in
    unrolled program length; D=256 fully unrolled takes tens of minutes
    to compile, a 32-chunk seconds). The running best KEY accumulates in
    the int32 out block across chunk steps — ascending-d visit order and
    therefore the reference tie-break are preserved exactly; the float
    decode happens in the wrapper.

    live_ref (scalar prefetch, [B, n_tiles, n_dchunks] i32) gates the
    whole compute body: a chunk with no grid candidate and no plane-window
    overlap anywhere in the band contributes only _BIG keys, so skipping
    it is bit-exact. ELAS evaluates ~tens of candidate disparities per
    pixel; the live mask recovers that data-dependent sparsity (the wall
    clock scales with the scene's disparity range, not with D)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    dc = pl.program_id(2)
    d0 = dc * DCH
    C = q_ref.shape[1]

    # the target band is d-invariant: DMA it once per (b, i), first chunk
    @pl.when(dc == 0)
    def _copy():
        copy_t = pltpu.make_async_copy(
            t_hbm.at[b, :, pl.ds(i * TH, TH), :], t_scr, sem)
        copy_t.start()
        copy_t.wait()

    @pl.when(dc == 0)
    def _init():
        out_ref[0] = jnp.full((TH, W), _BIG, jnp.int32)

    @pl.when(live_ref[b, i, dc] != 0)
    def _compute():
        # per-channel [TH, W] planes (a [C, TH, W] intermediate per
        # unrolled d blows the VMEM stack allocator)
        q_planes = [q_ref[0, c].astype(jnp.int32) for c in range(C)]
        # rolled-target formulation: unaligned lane-offset reads of the u8
        # scratch materialize a realignment buffer PER READ (4096 of them
        # blew the VMEM stack); instead keep the shifted target as
        # loop-carried registers rolled one column per macro-step
        # (circular wrap lands only in the warp_ok-masked region). One
        # dynamic roll re-bases each register at the chunk's d0.
        # Roll elision (q-pairing, see support_kernel._support_kernel):
        # cost_{d+j}(c) = roll(SAD(q_j, t_d), j*dir) with q_j the query
        # pre-rolled by -j*dir, so one t alignment serves M consecutive
        # disparities and the 32-channel t roll runs once per M steps;
        # the realignment is ONE roll of the summed SAD per d. M=2 keeps
        # the extra query registers inside the ~16 MB VMEM budget at
        # TH=40 (each M adds C=32 [TH,W] i32 planes = 3.2 MB).
        M = 2
        roll_dir = W - 1 if right_image else 1
        qj = [q_planes]
        for _ in range(1, M):
            qj.append([pltpu.roll(x, (W - roll_dir) % W, 1)
                       for x in qj[-1]])
        t_roll = [pltpu.roll(t_scr[c].astype(jnp.int32),
                             (d0 * roll_dir) % W, 1) for c in range(C)]
        d_plane = dplane_ref[0].astype(jnp.int32)   # [TH, W] (i16 wire)
        prior = pvalid_ref[0].astype(jnp.int32)     # [TH, W] 0/1
        pixel_ok = pok_ref[0] != 0                  # [TH, W] bool
        col = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)

        d_min = jnp.maximum(d_plane - radius, 0)
        d_max = jnp.minimum(d_plane + radius, D - 1)

        best = out_ref[0]
        sign = 1 if right_image else -1
        for i_d in range(DCH):
            d = d0 + i_d                            # dynamic scalar
            j = i_d % M
            s = jnp.zeros((TH, W), jnp.int32)
            for c in range(C):
                s = s + jnp.abs(qj[j][c] - t_roll[c])
            cost = pltpu.roll(s, (j * roll_dir) % W, 1) if j else s
            if j == M - 1:
                t_roll = [pltpu.roll(t, (M * roll_dir) % W, 1)
                          for t in t_roll]

            warp = col + sign * d
            warp_ok = (warp >= _WINDOW) & (warp < W_real - _WINDOW)
            # grid candidates: rows at cell resolution (cols
            # pixel-expanded on host); expand rows via broadcast+concat
            # (cheap, no repeat op); the block streams this chunk's d
            # slice, so index i_d is static
            in_grid = jnp.concatenate(
                [jnp.broadcast_to(grid_ref[0, j, i_d, :][None, :], (GS, W))
                 for j in range(TH // GS)], axis=0) != 0
            in_win = (d >= d_min) & (d <= d_max)
            cand = in_grid | in_win
            dd = d - d_plane
            add = jnp.maximum(dd, -dd)
            pd = jnp.zeros((TH, W), jnp.int32)
            for j, pj in enumerate(P_host):
                pd = jnp.where(add == j, pj, pd)
            val = cost + jnp.where(in_win, prior * pd, 0)
            rank = jnp.where(in_win, 256 + d, d)
            key = (val + _KEY_BIAS) * 512 + rank
            key = jnp.where(cand & warp_ok & pixel_ok, key, _BIG)
            # mask the padded d >= D tail arithmetically: a scalar-bool
            # `&` against the vector mask makes Mosaic back-propagate a
            # replicated i1 layout into the concat above (relayout ICE);
            # max against live*_BIG is layout-neutral (keys are
            # non-negative by _KEY_BIAS)
            dead = jnp.where(d < D, 0, _BIG)        # traced scalar
            best = jnp.minimum(best, jnp.maximum(key, dead))

        out_ref[0] = best


@functools.partial(jax.jit, static_argnames=("params", "right_image",
                                              "tile_h", "d_chunk"))
def elas_dense_pallas(
    desc1: jnp.ndarray,          # [B, H, W, 16] uint8
    desc2: jnp.ndarray,
    d_plane: jnp.ndarray,        # [B, H, W] int16 (host-evaluated)
    plane_valid: jnp.ndarray,    # [B, H, W] bool
    covered: jnp.ndarray,        # [B, H, W] bool
    grid_mask: jnp.ndarray,      # [B, gh, gw, D] bool
    params: ElasParams = ElasParams(),
    right_image: bool = False,
    tile_h: int = 40,
    d_chunk: int = 32,
) -> jnp.ndarray:
    """Batched ELAS dense disparity [B, H, W] f32 — identical output to
    matching.elas.dense.dense_match, Pallas-accelerated."""
    B, H, W, C = desc1.shape
    D = params.disp_num
    gs = params.grid_size
    assert tile_h % 1 == 0

    if right_image:
        q, t = desc2, desc1
    else:
        q, t = desc1, desc2

    # row clamp v -> [2, H-3] (elas.cpp:701), channel-major
    vidx = jnp.clip(jnp.arange(H), 2, H - 3)
    qc = jnp.moveaxis(q[:, vidx], -1, 1)        # [B, C, H, W]
    tc = jnp.moveaxis(t[:, vidx], -1, 1)

    # texture gate on the clamped query rows (elas.cpp:715-719)
    tex = jnp.abs(qc.astype(jnp.int32) - 128).sum(1)
    u = jnp.arange(W)
    u_ok = (u >= _WINDOW) & (u < W - _WINDOW)
    pixel_ok = covered & u_ok[None, None, :] & (tex >= params.match_texture)

    TH = tile_h
    assert TH % gs == 0, "tile height must be a multiple of grid_size"
    n_tiles = -(-H // TH)
    Hp = n_tiles * TH
    Wp = -(-W // 128) * 128

    DCH = min(d_chunk, D)
    n_dchunks = -(-D // DCH)
    Dp = n_dchunks * DCH

    # grid candidates: rows at CELL resolution (kernel expands by sublane
    # repeat), columns at pixel resolution padded to Wp; d axis padded to
    # the chunk multiple (the kernel masks d >= D)
    # [B, gh, gw, D] -> [B, Hp/gs, Dp, Wp] uint8
    gcell_rows = Hp // gs
    grid_cols = jnp.repeat(grid_mask, gs, axis=2)[:, :, :W]     # [B,gh,W,D]
    grid_cols = grid_cols[:, :gcell_rows]
    gh = grid_cols.shape[1]
    grid_cols = jnp.pad(grid_cols.astype(jnp.uint8),
                        ((0, 0), (0, gcell_rows - gh), (0, Wp - W),
                         (0, Dp - D)))
    grid_hc = jnp.moveaxis(grid_cols, 3, 2)                     # [B,R,Dp,Wp]

    def pad_hw(x, fill=0):
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
        return jnp.pad(x, cfg, constant_values=fill)

    qc = pad_hw(qc)
    tc = pad_hw(tc)
    d_plane_p = pad_hw(d_plane)
    pvalid = pad_hw(plane_valid.astype(jnp.uint8))
    pok = pad_hw(pixel_ok.astype(jnp.uint8))

    # live mask [B, n_tiles, n_dchunks]: a d-chunk is dead for a row band
    # when no grid cell in the band has a candidate in the chunk AND no
    # pixel_ok pixel's plane window [d_plane - r, d_plane + r] overlaps it
    # (then every key in the chunk is _BIG and the kernel may skip it).
    radius = params.plane_radius
    gm_band = grid_cols.reshape(B, n_tiles, TH // gs, Wp,
                                n_dchunks, DCH) != 0
    gany = gm_band.any(axis=(2, 3, 5))                     # [B, nt, nd]
    dp32 = d_plane_p.astype(jnp.int32)
    okm = pok != 0
    wlo = jnp.where(okm, jnp.maximum(dp32 - radius, 0), Dp)
    whi = jnp.where(okm, jnp.minimum(dp32 + radius, D - 1), -1)
    d0s = jnp.arange(n_dchunks, dtype=jnp.int32) * DCH     # [nd]
    ov = ((wlo[..., None] <= d0s + (DCH - 1)) &
          (whi[..., None] >= d0s))                         # [B,Hp,Wp,nd]
    wany = ov.reshape(B, n_tiles, TH, Wp, n_dchunks).any(axis=(2, 3))
    live = (gany | wany).astype(jnp.int32)

    P_host = tuple(int(x) for x in prior_table(params)[:params.plane_radius + 1])
    kern = functools.partial(
        _elas_dense_kernel, D=D, TH=TH, W=Wp, W_real=W, GS=gs,
        radius=params.plane_radius, P_host=P_host, right_image=right_image,
        DCH=DCH)

    def bs(shape3=False):
        if shape3:
            return pl.BlockSpec((1, TH, Wp),
                                lambda b, i, dc, *refs: (b, i, 0),
                                memory_space=pltpu.VMEM)
        return None

    best = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles, n_dchunks),
            in_specs=[
                pl.BlockSpec((1, C, TH, Wp),
                             lambda b, i, dc, *refs: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                bs(True),
                bs(True),
                bs(True),
                pl.BlockSpec((1, TH // gs, DCH, Wp),
                             lambda b, i, dc, *refs: (b, i, dc, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=bs(True),
            scratch_shapes=[
                pltpu.VMEM((C, TH, Wp), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.int32),
    )(live, qc, tc, d_plane_p, pvalid, pok, grid_hc)
    # decode the accumulated keys (kept in XLA where it fuses for free)
    best = best[:, :H, :W]
    d_best = (best % 512) % 256
    out = jnp.where(best < _BIG, d_best.astype(jnp.float32), -1.0)
    return jnp.where(pixel_ok, out, -10.0)
