"""Pallas kernel for SGM path aggregation (the 8-path DP wavefront).

The jnp engine (matching/sgm.py) runs 8 sequential lax.scans, each step a
handful of tiny XLA ops on one row — latency-bound (~7 fps at 1280x960/64).
This kernel keeps the whole DP state in VMEM and walks rows inside ONE
fori_loop per direction, fusing up to three paths (vertical + the two
diagonals share a row order) per pass:

  - cost volume layout [B, H, D, W]: each row step works on a [BB, D, W]
    slab — ALL frames of a BB-sized batch group advance together,
    amortizing the per-step loop/DMA-wait overhead over the group
    (measured: aggregate 11.0 -> 10.2 ms/frame and WTA-maps ~2.1 -> 1.7
    ms/frame at 1280x960/64/B=4 — the walks are VPU/VMEM-bound, so the
    win is real but modest); D on sublanes (min over d is a sublane
    reduction, d+/-1 neighbours are static sublane shifts), W on lanes
    (diagonal carry shifts are lane rolls);
  - double-buffered row DMA in, double-buffered row DMA out;
  - `reverse=True` walks rows bottom-up in place of flipping the 300 MB
    volume in HBM;
  - horizontal paths reuse the same kernel on a [B, W, D, H] transpose.

Output is bit-identical to matching.sgm.aggregate_paths (same recurrence,
same BIG clamps, same edge resets; reference semantics documented there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...matching.sgm import _CARRY_BIG, _INVALID

# int16 domain shared with matching.sgm (see the constants there): the DP
# carries, cost rows and stored volumes are int16 — double VPU width,
# half the HBM traffic of the 300 MB volumes; per-pass totals accumulate
# in int32 registers and clamp back to _CARRY_BIG on store.
_BIG = _CARRY_BIG

# VMEM budget for picking the frames-per-step group size. The XLA default
# scoped-vmem limit is 16 MB, but the kernel requests its own limit via
# CompilerParams(vmem_limit_bytes=...) sized from the actual scratch
# buffers, so the budget here only bounds how much scratch we are willing
# to pin (measured working: 2-row wavefront at 4 frames = ~14.4 MB
# scratch + ~3 MB Mosaic temporaries).
_VMEM_BUDGET = 15 * 1024 * 1024


def _group_size(B, D, Wp, n_shift, fuse_add, extra_i16_rows=0, rows=1):
    """Frames per grid step: as many as fit the VMEM budget, max 4 (the
    measured point of diminishing returns — step overhead is amortized
    ~4x while DMA chunks stay small enough to pipeline). `rows` is the
    wavefront height (rows per DMA/step)."""
    per = (2 * rows * D * Wp * 2      # ibuf (2 slots, int16)
           + 2 * rows * max(D, extra_i16_rows) * Wp * 2   # obuf
           + (2 * rows * D * Wp * 2 if fuse_add else 0)   # abuf
           + n_shift * D * Wp * 4)    # carries (int32)
    bb = max(1, min(4, B, _VMEM_BUDGET // max(per, 1)))
    return bb


def _sgm_dir_kernel(cost_hbm, out_hbm, ibuf, obuf, isem, osem,
                    *, BB, H, D, W, W_real, p1, p2, shifts, reverse, R=1,
                    abuf=None, asem=None, add_hbm=None):
    """One DP direction over a BB-frame group. Volumes arrive TIME-MAJOR
    ([T, B, D, W]): the walked axis leads, so a step's whole [R, BB, D, W]
    group slab is ONE contiguous DMA — with batch-major volumes each
    stream needed BB separate copies per step, and the semaphore
    start/waits (~0.4 us each) ate most of what group-batching saved.
    When add_hbm is given, its rows are DMA'd alongside the cost rows and
    added into the written total — fusing the XLA `S_down + S_up` pass
    (945 MB of traffic per add at 1280x960/64) into the walk.

    R is the wavefront height (rows per DMA/loop step, H % R == 0): the
    recurrence stays strictly sequential — rows inside a slab advance one
    after the other — but the loop/semaphore overhead (the measured
    ~2.1x-over-issue-floor gap's largest named term) amortizes R-fold.
    Row visit order and arithmetic are unchanged, so outputs stay
    bit-identical for every R."""
    b0 = pl.program_id(0) * BB
    n_shift = len(shifts)
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, D, W), 2)
    padded = W_real < W
    fuse_add = add_hbm is not None
    NP = H // R
    # HBM slab index j of the t-th row processed within a pair: forward
    # pairs walk their rows top-down, reverse pairs bottom-up
    order = tuple(range(R)) if not reverse else tuple(range(R - 1, -1, -1))

    def base(k):
        """First HBM row of pair k in walk order."""
        return k * R if not reverse else H - R - k * R

    def dma_in(slot, k):
        return pltpu.make_async_copy(
            cost_hbm.at[pl.ds(base(k), R), pl.ds(b0, BB)], ibuf.at[slot],
            isem.at[slot])

    def dma_add(slot, k):
        return pltpu.make_async_copy(
            add_hbm.at[pl.ds(base(k), R), pl.ds(b0, BB)], abuf.at[slot],
            asem.at[slot])

    def dma_out(slot, k):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[pl.ds(base(k), R), pl.ds(b0, BB)],
            osem.at[slot])

    def start(c):
        c.start()

    def wait(c):
        c.wait()

    def advance(c, carries):
        """One row of the DP recurrence: (carries, row total)."""
        total = jnp.zeros((BB, D, W), jnp.int32)
        new_carries = []
        cap = jnp.full((BB, 1, W), _BIG, jnp.int32)
        for p, s in enumerate(shifts):
            prev = carries[p]
            if s:
                prev = pltpu.roll(prev, s if s > 0 else W + s, 2)
                edge = 0 if s == 1 else W_real - 1
                prev = jnp.where(col == edge, _BIG, prev)
            m = jnp.min(prev, axis=1, keepdims=True)            # [BB, 1, W]
            # d-range boundary = plain BIG sentinel row (matching the
            # int16 jnp engine, where prev+BIG would wrap)
            up = jnp.concatenate([cap, prev[:, 0:D - 1]], axis=1)
            dn = jnp.concatenate([prev[:, 1:D], cap], axis=1)
            best = jnp.minimum(jnp.minimum(prev, m + p2),
                               jnp.minimum(up + p1, dn + p1))
            out = jnp.minimum(c + (best - m), _BIG)
            if padded:
                out = jnp.where(col < W_real, out, _BIG)
            new_carries.append(out)
            total = total + out
        return tuple(new_carries), total

    # int16 is the STORAGE dtype only (Mosaic's int16 vector ops are
    # spotty: no reductions, no rotates); every slab upcasts to int32
    # right after its DMA and all arithmetic is native 32-bit. Values are
    # wrap-free in both widths (see matching.sgm constants), so this is
    # bit-equal to the int16-computing jnp engine.

    # peeled pair 0: the first row is the init row, the rest regular
    start(dma_in(0, 0))
    if fuse_add:
        start(dma_add(0, 0))
    wait(dma_in(0, 0))
    init = jnp.minimum(ibuf[0, order[0]].astype(jnp.int32), _BIG)
    if padded:
        init = jnp.where(col < W_real, init, _BIG)
    first = init * n_shift
    if fuse_add:
        wait(dma_add(0, 0))
        first = first + abuf[0, order[0]].astype(jnp.int32)
        if NP > 1:
            start(dma_add(1, 1))
    obuf[0, order[0]] = jnp.minimum(first, _BIG).astype(jnp.int16)
    carries = (init,) * n_shift
    for j in order[1:]:
        carries, total = advance(ibuf[0, j].astype(jnp.int32), carries)
        if fuse_add:
            total = total + abuf[0, j].astype(jnp.int32)
        obuf[0, j] = jnp.minimum(total, _BIG).astype(jnp.int16)
    start(dma_out(0, 0))
    if NP > 1:
        start(dma_in(1, 1))

    def step(k, carries):
        slot = k % 2
        wait(dma_in(slot, k))

        @pl.when(k + 1 < NP)
        def _():
            start(dma_in((k + 1) % 2, k + 1))
            if fuse_add:
                start(dma_add((k + 1) % 2, k + 1))

        # output slot reuse: the DMA issued 2 pairs ago must have retired
        @pl.when(k >= 2)
        def _():
            wait(dma_out(slot, k - 2))

        for t, j in enumerate(order):
            carries, total = advance(ibuf[slot, j].astype(jnp.int32),
                                     carries)
            if fuse_add:
                if t == 0:
                    wait(dma_add(slot, k))
                total = total + abuf[slot, j].astype(jnp.int32)
            obuf[slot, j] = jnp.minimum(total, _BIG).astype(jnp.int16)
        start(dma_out(slot, k))
        return carries

    carries = jax.lax.fori_loop(1, NP, step, carries)
    if NP >= 2:
        wait(dma_out((NP - 2) % 2, NP - 2))
    wait(dma_out((NP - 1) % 2, NP - 1))


@functools.partial(jax.jit,
                   static_argnames=("p1", "p2", "shifts", "reverse"))
def sgm_paths_dir_pallas(cost_bhdw, p1, p2, shifts=(0,), reverse=False,
                         add=None):
    """Sum of the DP paths with the given carry shifts, scanning axis 0 of
    TIME-MAJOR [H, B, D, W] (downward, or upward with reverse=True), plus
    `add` when given (fused into the row walk). Returns the same layout.
    Bit-identical to summing matching.sgm._path_scan per shift (+ add)."""
    H, B, D, W = cost_bhdw.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        cost_bhdw = jnp.pad(cost_bhdw, ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
                            constant_values=_BIG)
        if add is not None:
            add = jnp.pad(add, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    fuse_add = add is not None
    # wavefront height: prefer 2 rows per step (halves loop/semaphore
    # overhead) but never at the cost of a smaller frame group — BB
    # amortizes the same overhead and additionally pads B
    BB = _group_size(B, D, Wp, len(shifts), fuse_add, rows=1)
    R = 1
    if H % 2 == 0 and _group_size(B, D, Wp, len(shifts), fuse_add,
                                  rows=2) >= BB:
        R = 2
    Bp = -(-B // BB) * BB
    if Bp != B:
        cost_bhdw = jnp.pad(cost_bhdw, ((0, 0), (0, Bp - B), (0, 0), (0, 0)),
                            constant_values=_BIG)
        if add is not None:
            add = jnp.pad(add, ((0, 0), (0, Bp - B), (0, 0), (0, 0)))
    cost_bhdw = cost_bhdw.astype(jnp.int16)
    if add is not None:
        add = add.astype(jnp.int16)
    scratch = [
        pltpu.VMEM((2, R, BB, D, Wp), jnp.int16),
        pltpu.VMEM((2, R, BB, D, Wp), jnp.int16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if fuse_add:
        scratch += [pltpu.VMEM((2, R, BB, D, Wp), jnp.int16),
                    pltpu.SemaphoreType.DMA((2,))]

        def kern(cost_hbm, add_hbm, out_hbm, ibuf, obuf, isem, osem,
                 abuf, asem):
            _sgm_dir_kernel(cost_hbm, out_hbm, ibuf, obuf, isem, osem,
                            BB=BB, H=H, D=D, W=Wp, W_real=W, p1=p1, p2=p2,
                            shifts=shifts, reverse=reverse, R=R,
                            abuf=abuf, asem=asem, add_hbm=add_hbm)
        args = (cost_bhdw, add)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    else:
        kern = functools.partial(
            _sgm_dir_kernel, BB=BB, H=H, D=D, W=Wp, W_real=W, p1=p1, p2=p2,
            shifts=shifts, reverse=reverse, R=R)
        args = (cost_bhdw,)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    # ask Mosaic for exactly the VMEM the scratch needs (+ slack for its
    # own temporaries) — the XLA default scoped limit is 16 MB, which the
    # 2-row wavefront at BB=4 exceeds; the physical VMEM is larger
    n_bufs = 3 if fuse_add else 2
    scratch_bytes = n_bufs * 2 * R * BB * D * Wp * 2 \
        + len(shifts) * BB * D * Wp * 4
    # Mosaic additionally stacks the advance body's int32 slab temporaries
    # (~6-8 live [BB, D, W] i32 slabs); measured 17.59 M total at the
    # R=2 BB=4 down pass whose scratch is 9.2 M
    vmem_limit = min(2 * scratch_bytes + 4 * 1024 * 1024,
                     100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(Bp // BB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((H, Bp, D, Wp), jnp.int16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(*args)
    return out[:, :B, :, :W]


def aggregate_paths_pallas_bhdw(cost_bdhw: jnp.ndarray, params,
                                hdw_layout: bool = False) -> jnp.ndarray:
    """8-path (or 4-path) SGM aggregation, Pallas wavefront engine,
    returning the aggregated volume in [B, H, D, W] layout (the layout the
    WTA kernel consumes — skips a 300 MB moveaxis at 1280x960).

    Vertical+diagonal paths fuse into one down pass and one up pass (the
    up pass adds the down volume in-walk); horizontal paths run on a
    [B, W, D, H] transpose, the backward pass adding the forward volume.
    hdw_layout: the input already is [B, H, D, W] (census_cost_volume_hdw)
    — no moveaxis at all."""
    p1, p2 = params.p1, params.p2
    c = cost_bdhw if hdw_layout else jnp.moveaxis(cost_bdhw, 1, 2)
    shifts = (0, 1, -1) if params.num_paths >= 8 else (0,)
    # time-major copies: [H, B, D, W] / [W, B, D, H] — a coarse block
    # permutation (whole [D, W] slabs move) costing ~0.1 ms/frame each,
    # repaid by every walk step needing ONE DMA per stream
    cv = jnp.transpose(c, (1, 0, 2, 3))          # [H, B, D, W]
    S = sgm_paths_dir_pallas(cv, p1, p2, shifts, False)
    S = sgm_paths_dir_pallas(cv, p1, p2, shifts, True, add=S)
    ct = jnp.transpose(c, (3, 0, 2, 1))          # [W, B, D, H]
    Sh = sgm_paths_dir_pallas(ct, p1, p2, (0,), False)
    Sh = sgm_paths_dir_pallas(ct, p1, p2, (0,), True, add=Sh)
    tot = (jnp.transpose(S, (1, 0, 2, 3)).astype(jnp.int32)
           + jnp.transpose(Sh, (1, 3, 2, 0)).astype(jnp.int32))
    return jnp.minimum(tot, _BIG).astype(jnp.int16)  # [B, H, D, W]


def aggregate_paths_pallas(cost_bdhw: jnp.ndarray, params) -> jnp.ndarray:
    """As aggregate_paths_pallas_bhdw but in the reference [B, D, H, W]
    layout, equal to vmap(matching.sgm.aggregate_paths)."""
    return jnp.moveaxis(aggregate_paths_pallas_bhdw(cost_bdhw, params),
                        2, 1)


# ---------------------------------------------------------------------------
# census kernel: 24-bit census codes in row bands
# ---------------------------------------------------------------------------

_CENSUS_RB = 128   # rows per grid step


def _census_kernel(img_hbm, out_hbm, ibuf, obuf, isem, osem,
                   *, RB, Hp, Wp2):
    """24-neighbor census codes for one row band.

    The wrapper pre-pads the image with edge-mode rows (+2 top/bottom)
    and edge-mode columns on the RIGHT only (+2), then zero-pads lanes to
    Wp2. Horizontal du > 0 neighbours therefore read correct replicated
    values straight from the pad; du < 0 neighbours come from a lane roll
    whose wrapped columns are fixed with the (lane-0, aligned) left-edge
    value. Bit-identical to matching.sgm.census5x5."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    # 8-row halo (4 top + 4 bottom, of which 2 each are used): DMA slice
    # sublane extents must be multiples of the (8, 128) i32 tile
    cin = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * RB, RB + 8)], ibuf, isem)
    cin.start()
    cin.wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (RB, Wp2), 1)
    center = ibuf[4:4 + RB]
    code = jnp.zeros((RB, Wp2), jnp.int32)
    bit = 0
    for dv in range(-2, 3):
        rows = ibuf[4 + dv:4 + dv + RB]
        x0 = rows[:, 0:1]   # this row's left-edge value (aligned slice)
        for du in range(-2, 3):
            if dv == 0 and du == 0:
                continue
            if du == 0:
                nb = rows
            elif du > 0:
                nb = pltpu.roll(rows, Wp2 - du, 1)
            else:
                nb = pltpu.roll(rows, -du, 1)
                nb = jnp.where(col < -du, x0, nb)
            code = code | jnp.where(nb < center, jnp.int32(1 << bit), 0)
            bit += 1
    obuf[...] = code
    cout = pltpu.make_async_copy(obuf, out_hbm.at[b, pl.ds(i * RB, RB)],
                                 osem)
    cout.start()
    cout.wait()


@jax.jit
def census5x5_pallas(img_u8_b: jnp.ndarray) -> jnp.ndarray:
    """Batched census transform [B, H, W] u8 -> int32 codes, bit-equal to
    vmap(matching.sgm.census5x5). One row-band Pallas pass (the 24-step
    XLA formulation materializes HBM temporaries per bit: measured ~1.5
    ms/frame-image at 1280x960 vs ~0.2 for this kernel)."""
    B, H, W = img_u8_b.shape
    RB = _CENSUS_RB
    Hp = -(-H // RB) * RB
    Wp2 = -(-(W + 2) // 128) * 128
    x = img_u8_b.astype(jnp.int32)
    # +4 edge rows (2 used by the 5x5 window, 2 for DMA-tile alignment)
    # and +2 edge cols; bottom rows additionally padded (edge mode) out
    # to the band grid — garbage bands sliced off
    x = jnp.pad(x, ((0, 0), (4, Hp - H + 4), (0, 2)), mode="edge")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp2 - (W + 2))))
    kern = functools.partial(_census_kernel, RB=RB, Hp=Hp, Wp2=Wp2)
    out = pl.pallas_call(
        kern,
        grid=(B, Hp // RB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp2), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((RB + 8, Wp2), jnp.int32),
            pltpu.VMEM((RB, Wp2), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    return out[:, :H, :W]


# ---------------------------------------------------------------------------
# WTA maps kernel: one pass over the aggregated volume
# ---------------------------------------------------------------------------

# right-view out-of-range sentinel — must equal matching.sgm._INVALID
# (the jnp twin right_view_volume uses it), > any real volume value
_INV = int(_INVALID)


def _wta_maps_kernel(S_hbm, out_hbm, ibuf, obuf, isem, osem,
                     *, BB, H, D, W, W_real):
    """Per image row (BB frames per step): the five per-pixel WTA
    statistics (best cost, best disparity, second-best outside +/-1, and
    the two neighbour costs) for BOTH the left view and the right view
    derived in-register.

    Key identity: SR[d, v, u] = S[d, v, u+d] — the right-view column of a
    pixel lies in the SAME image row, so one [BB, D, W] row slab serves
    both WTAs and the whole volume is read exactly once. The per-row-
    constant left shift by d is applied with log2(D) masked lane rolls.
    All ops are integer min/compare — the float uniqueness/sub-pixel/L-R
    epilogue stays in jnp (matching.sgm), shared verbatim with the scan
    engine."""
    b0 = pl.program_id(0) * BB
    ds = jax.lax.broadcasted_iota(jnp.int32, (BB, D, W), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, D, W), 2)
    BIG = jnp.int32(30000)      # WTA exclusion: > any volume value

    def dma_in(slot, i):
        return [pltpu.make_async_copy(
            S_hbm.at[b0 + j, i], ibuf.at[slot, j], isem.at[slot, j])
            for j in range(BB)]

    def dma_out(slot, i):
        return [pltpu.make_async_copy(
            obuf.at[slot, j], out_hbm.at[b0 + j, i], osem.at[slot, j])
            for j in range(BB)]

    def start(copies):
        for c in copies:
            c.start()

    def wait(copies):
        for c in copies:
            c.wait()

    def wta5(s):
        best = jnp.min(s, axis=1, keepdims=True)                  # [BB,1,W]
        bd = jnp.min(jnp.where(s == best, ds, D), axis=1,
                     keepdims=True)                               # argmin
        near = jnp.abs(ds - bd) <= 1
        second = jnp.min(jnp.where(near, BIG, s), axis=1, keepdims=True)
        cm = jnp.min(jnp.where(ds == bd - 1, s, BIG), axis=1,
                     keepdims=True)
        cp = jnp.min(jnp.where(ds == bd + 1, s, BIG), axis=1,
                     keepdims=True)
        return [best, bd, second, cm, cp]

    pad6 = jnp.zeros((BB, 6, W), jnp.int32)

    def step(i, _):
        slot = i % 2
        wait(dma_in(slot, i))
        # int16 is storage-only (Mosaic int16 reductions/rotates are
        # unimplemented): upcast the slab once and compute in int32
        s = ibuf[slot].astype(jnp.int32)

        @pl.when(i + 1 < H)
        def _():
            start(dma_in((i + 1) % 2, i + 1))

        @pl.when(i >= 2)
        def _():
            wait(dma_out(slot, i - 2))

        rows_l = wta5(s)
        # right-view slab: roll row d left by d (log-decomposed — the
        # shift is row-constant so masked uniform rolls compose exactly)
        sr = s
        k = 1
        while k < D:
            sr = jnp.where((ds & k) != 0, pltpu.roll(sr, W - k, 2), sr)
            k <<= 1
        sr = jnp.where(col >= W_real - ds, jnp.int32(_INV), sr)
        rows_r = wta5(sr)
        # ONE [BB, 16, W] store per row: writing the 10 stats as
        # individual sublane stores forces a read-modify-write of each
        # 8-sublane tile per store; stats fit int16 (<= 30000)
        obuf[slot] = jnp.concatenate(
            rows_l + rows_r + [pad6], axis=1).astype(jnp.int16)
        start(dma_out(slot, i))
        return 0

    start(dma_in(0, 0))
    jax.lax.fori_loop(0, H, step, 0)
    wait(dma_out((H - 2) % 2, H - 2))
    wait(dma_out((H - 1) % 2, H - 1))


@jax.jit
def sgm_wta_maps_pallas(S_bhdw: jnp.ndarray) -> jnp.ndarray:
    """[B, H, D, W] aggregated int16 volume -> [B, H, 10, W] int16 WTA
    maps: (best, best_d, second, cost_minus, cost_plus) for the left view
    then the right view. One volume read total. (The row stack is padded
    to 16 in VMEM/HBM — Mosaic requires sublane extents aligned to the
    tile — and sliced back here.)"""
    B, H, D, W = S_bhdw.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        S_bhdw = jnp.pad(S_bhdw, ((0, 0), (0, 0), (0, 0), (0, Wp - W)),
                         constant_values=_INV)
    BB = _group_size(B, D, Wp, 0, False, extra_i16_rows=16)
    Bp = -(-B // BB) * BB
    if Bp != B:
        S_bhdw = jnp.pad(S_bhdw, ((0, Bp - B), (0, 0), (0, 0), (0, 0)),
                         constant_values=_INV)
    S_bhdw = S_bhdw.astype(jnp.int16)
    kern = functools.partial(_wta_maps_kernel, BB=BB, H=H, D=D, W=Wp,
                             W_real=W)
    out = pl.pallas_call(
        kern,
        grid=(Bp // BB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, H, 16, Wp), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((2, BB, D, Wp), jnp.int16),
            pltpu.VMEM((2, BB, 16, Wp), jnp.int16),
            pltpu.SemaphoreType.DMA((2, BB)),
            pltpu.SemaphoreType.DMA((2, BB)),
        ],
    )(S_bhdw)
    out = out[:B, :, :10]
    return out[..., :W] if Wp != W else out
