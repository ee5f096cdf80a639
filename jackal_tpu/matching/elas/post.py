"""ELAS postprocessing as fixed-shape JAX ops.

Reference: leftRightConsistencyCheck (elas.cpp:909-979), removeSmallSegments
(981-1099, BFS speckle), gapInterpolation (1101-1284), adaptiveMean
(1287-1492, SSE approximate bilateral), median (1494-1560).

TPU reformulations:
  - L/R check: pure gather + compare.
  - speckle: the sequential BFS defines 4-connected components under the
    symmetric relation |d_i - d_j| <= sim_threshold over valid pixels; we
    compute them with min-label propagation + pointer jumping (log-depth)
    and invalidate components smaller than speckle_size. Same fixed point as
    the BFS — order independence verified against the instrumented
    reference.
  - gaps: nearest-valid-left/right (cummax scans) + run-length fill.
  - adaptive mean: 8-tap weighted shifts, including the reference's exact
    buffer-initialization semantics (D_tmp zero pages with -10 at invalid,
    interior-only writes).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import ElasParams
from ...ops.shifts import shifted_row_lookup


@partial(jax.jit, static_argnames=("params", "smax"))
def left_right_consistency_check(
    D1: jnp.ndarray, D2: jnp.ndarray, params: ElasParams = ElasParams(),
    smax: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """elas.cpp:909-979. Invalid -> -10.

    The warped lookup D_other[(int)(u -/+ d)] runs as a shift-select sweep
    (ops.shifts) instead of a per-pixel gather. (A data-dependent sweep
    bound — while_loop to the scene's live disparity range — measured
    SLOWER than the static unrolled 0..disp_max sweep: 0.50 vs 0.42
    ms/frame at 640x480; the loop carry and the bound's max-reduce cost
    more than the dead selects they remove.)

    smax: optional STATIC sweep bound < disp_max. The batched pipeline
    passes the host-known scene bound (max support disparity + 2, laddered
    — every dense output is a grid candidate [<= max support d + 1,
    createGrid's d+/-1 marking] or lies in a plane window [d_plane is a
    corner-disparity interpolation <= max support d, + plane_radius = 2]),
    so the sweep skips provably-dead shifts bit-exactly. -1 = full range.
    """
    H, W = D1.shape
    u = jnp.arange(W)[None, :].astype(jnp.float32)
    smax = params.disp_max if smax < 0 else min(smax, params.disp_max)

    def check(Da, Db, sign):
        # subsampling: u_warp = u -/+ d/2 (elas.cpp:937-939)
        warp_d = Da / 2 if params.subsampling else Da
        uw = u + sign * warp_d
        ok = (Da >= 0) & (uw >= 0) & (uw < W)
        # shift = u - (int)u_warp; disparities are integer-valued here
        # (or half-integer under subsampling; trunc matches the C cast)
        s = jnp.clip((sign * (uw.astype(jnp.int32)
                              - u.astype(jnp.int32))), 0, smax)
        other = shifted_row_lookup(Db, s, smax, int(sign))
        ok = ok & (jnp.abs(other - Da) <= params.lr_threshold)
        return jnp.where(ok, Da, -10.0)

    return check(D1, D2, -1.0), check(D2, D1, +1.0)


def _label_bits(n: int) -> int:
    """Bits needed to hold labels 0..n-1."""
    return max(int(n - 1).bit_length(), 1)


def _rev_conn(conn: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Run boundaries for the reverse scan direction: element j starts a
    (reversed) run when it is not connected to element j+1."""
    return ~jnp.roll(conn, -1, axis).at[
        (slice(None),) * axis + (-1,)].set(False)


def _seg_terms(conn: jnp.ndarray, axis: int, k: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loop-invariant packed segment-id terms for the cummin run-min scan.

    conn[..., j] says element j is connected to element j-1 along `axis`
    (conn[..., 0] must be False). Each scan direction numbers its runs
    from its own starting end; the term (segs_total - seg_id) << k makes
    keys from EARLIER runs strictly larger than any key of the current
    run, so a plain cummin keeps the minimum label of the current run in
    the low k bits."""
    S = conn.shape[axis] + 1
    segf = jnp.cumsum(~conn, axis=axis, dtype=jnp.int32)
    segr = jnp.flip(jnp.cumsum(jnp.flip(_rev_conn(conn, axis), axis),
                               axis=axis, dtype=jnp.int32), axis)
    return (S - segf) << k, (S - segr) << k


def _run_min_scan_packed(lbl, terms, axis, k):
    """Min label over maximal connected runs along `axis`: two packed
    int32 cummin scans (no gathers — TPU gathers cost ~ms each at [H*W];
    no tuple scans — single-int cummins halve the scan traffic)."""
    tf, tr = terms
    mask = (1 << k) - 1
    fwd = jax.lax.cummin(tf | lbl, axis=axis) & mask
    rev = jax.lax.cummin(tr | lbl, axis=axis, reverse=True) & mask
    return jnp.minimum(fwd, rev)


def _run_min_scan_tuple(lbl, conn, axis):
    """Fallback run-min via segmented (value, flag) associative scans —
    for frames too large for the int32 key packing."""
    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    fwd, _ = jax.lax.associative_scan(op, (lbl, ~conn), axis=axis)
    rev, _ = jax.lax.associative_scan(
        op, (jnp.flip(lbl, axis), jnp.flip(_rev_conn(conn, axis), axis)),
        axis=axis)
    return jnp.minimum(fwd, jnp.flip(rev, axis))


def _connected_component_labels(
    D: jnp.ndarray, sim_threshold: float
) -> jnp.ndarray:
    """Min-label over 4-connected components of valid pixels with
    |d_i - d_j| <= sim_threshold. Labels are flat indices; invalid pixels
    label themselves. Alternating row/column segmented min-scans inside a
    while_loop run to the fixed point — each sweep floods a label across
    entire straight runs (log-depth, gather-free), so convergence takes
    one iteration per 'bend' of the most serpentine component instead of
    one per pixel of its diameter (measured: 7 sweeps on real scenes).
    Same fixed point (per-component min flat index) as the reference
    BFS's segmentation."""
    H, W = D.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W))
    valid = D >= 0
    k = _label_bits(H * W)
    packed_ok = ((max(H, W) + 2) << k) < 2 ** 31

    def conn_along(axis):
        d_prev = jnp.roll(D, 1, axis)
        v_prev = jnp.roll(valid, 1, axis)
        c = (jnp.abs(D - d_prev) <= sim_threshold) & valid & v_prev
        return c.at[(slice(None),) * axis + (0,)].set(False)

    conn_row = conn_along(1)
    conn_col = conn_along(0)
    if packed_ok:
        terms_row = _seg_terms(conn_row, 1, k)
        terms_col = _seg_terms(conn_col, 0, k)

        def sweep(lbl):
            new = _run_min_scan_packed(lbl, terms_row, 1, k)
            return _run_min_scan_packed(new, terms_col, 0, k)
    else:
        def sweep(lbl):
            new = _run_min_scan_tuple(lbl, conn_row, 1)
            return _run_min_scan_tuple(new, conn_col, 0)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        # TWO sweeps per convergence check: the any() compare is a full
        # extra pass plus a loop-carry sync, and sweeps past the fixed
        # point are idempotent, so halving the checks is bit-free
        lbl, _ = state
        new = sweep(sweep(lbl))
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(cond, body, (idx, jnp.bool_(True)))
    return lbl


def speckle_size_eff(params: ElasParams) -> int:
    """elas.cpp:986-991: sqrt(speckle_size)*2 under subsampling."""
    if params.subsampling:
        return int(np.sqrt(np.float32(params.speckle_size)) * 2)
    return params.speckle_size


def gap_width_eff(params: ElasParams) -> int:
    """elas.cpp:1106-1111: ipol_gap_width/2+1 under subsampling."""
    if params.subsampling:
        return params.ipol_gap_width // 2 + 1
    return params.ipol_gap_width


def _segment_sizes(lbl: jnp.ndarray, valid: jnp.ndarray,
                   clamp: int | None = None) -> jnp.ndarray:
    """Per-pixel component pixel count, by sort + run sums + unsort.

    The obvious `zeros.at[lbl].add(valid)[lbl]` scatter/gather costs
    ~5.5 ms/frame on TPU at [H*W]; sorting groups each component into a
    contiguous run instead. Within the sorted order every fill is over
    MONOTONE cumsum values, so run totals come from three native scans
    (cumsum + forward cummax fill of the run-start prefix + reverse
    cummin fill of the run-end prefix) — no generic associative_scan
    (those lower to slice/concat ladders on TPU and cost ~6 ms/frame).
    Invalid pixels ride a sentinel key (one shared tail run; their
    garbage total is masked by the caller's `D >= 0` gate).

    With ``clamp`` (callers that only compare sizes against a threshold
    <= clamp), returned sizes are min(size, clamp) and — when position
    and clamped-size bits fit an int32 — the unsort runs as a SINGLE
    1-operand sort of ``pos << bits | min(tot, clamp)`` instead of a
    2-operand key/payload sort (the two [H*W] sorts are the dominant
    postprocess cost: ~0.9 ms each per 640x480 frame)."""
    n = lbl.size
    flat = jnp.where(valid.reshape(-1), lbl.reshape(-1), n)
    pos = jnp.arange(n, dtype=jnp.int32)
    sk, sp = jax.lax.sort((flat, pos), num_keys=1)
    sv = (sk < n).astype(jnp.int32)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    end_seg = jnp.concatenate([new_seg[1:], jnp.ones((1,), bool)])
    cs = jnp.cumsum(sv, dtype=jnp.int32)               # inclusive
    cs_before = jax.lax.cummax(
        jnp.where(new_seg, cs - sv, -1))               # fwd fill (monotone)
    cs_end = jax.lax.cummin(
        jnp.where(end_seg, cs, n + 1), reverse=True)   # bwd fill (monotone)
    tot = cs_end - cs_before
    if clamp is not None:
        cb = int(clamp).bit_length()
        if _label_bits(n) + cb <= 31:
            packed = (sp << cb) | jnp.minimum(tot, clamp)
            out = jax.lax.sort(packed) & ((1 << cb) - 1)
            return out.reshape(lbl.shape)
    _, out = jax.lax.sort((sp, tot), num_keys=1)
    return out.reshape(lbl.shape)


@partial(jax.jit, static_argnames=("params",))
def remove_small_segments(
    D: jnp.ndarray, params: ElasParams = ElasParams()
) -> jnp.ndarray:
    """elas.cpp:981-1099: invalidate components smaller than speckle_size."""
    lbl = _connected_component_labels(D, params.speckle_sim_threshold)
    thr = speckle_size_eff(params)
    # clamped sizes are exact for the `size < thr` decision: a size
    # clamped AT thr still fails `< thr`, smaller sizes are unclamped
    seg_size = _segment_sizes(lbl, D >= 0, clamp=max(thr, 1))
    kill = (D >= 0) & (seg_size < thr)
    return jnp.where(kill, -10.0, D)


# ---------------------------------------------------------------------------
# batched speckle kill via run compaction (the production batched path)
# ---------------------------------------------------------------------------

_RUN_CAP = 128   # per-row run-slot budget of the compact path (lane width)


def _runs_along_rows(lbl2: jnp.ndarray, valid2: jnp.ndarray):
    """Maximal same-label runs of valid pixels along rows. lbl2/valid2
    [R, W]. Returns (start mask, runlen at starts, per-row max run count).
    Adjacent valid pixels with equal label are by construction in the same
    component (labels are per-component minima), so grouping by label value
    partitions each component's pixels into row runs exactly."""
    W = lbl2.shape[1]
    u = jnp.arange(W, dtype=jnp.int32)[None, :]
    same = (lbl2 == jnp.roll(lbl2, 1, 1)) & valid2 & jnp.roll(valid2, 1, 1)
    same = same.at[:, 0].set(False)
    start = valid2 & ~same
    same_next = jnp.roll(same, -1, 1).at[:, -1].set(False)
    end = valid2 & ~same_next
    # next run end at u' >= u: marked u's increase, so a reverse cummin of
    # (end ? u : W) is exactly the next marked column
    u_end_next = jax.lax.cummin(jnp.where(end, u, W), axis=1, reverse=True)
    runlen = u_end_next - u + 1
    nruns = jnp.max(jnp.sum(start.astype(jnp.int32), axis=1))
    return start, runlen, nruns


def _small_segment_kill_batch(
    lbl: jnp.ndarray, valid: jnp.ndarray, thr: int
) -> jnp.ndarray:
    """Batched `component size < thr` mask [B, H, W] for valid pixels.

    The per-frame sort path (_segment_sizes) pays two [H*W] sorts per
    frame (~2.0 ms at 640x480 — the dominant postprocess cost). Components
    decompose into per-row runs (~10-40 per row on real scenes), and run
    TOTALS determine the kill, so the compact path:

      1. row-sorts run starts to the front ([B*H, W] short-sequence sort,
         ~3x cheaper per element than a flat [H*W] sort);
      2. aggregates run lengths per label over the [B*H, _RUN_CAP] slot
         prefix — a global sort of 5x fewer elements;
      3. routes the per-run kill bit back through two 1-operand packed
         sorts and floods it across each run with a native cummax.

    A lax.cond falls back to the per-frame sort path when any row has
    more than _RUN_CAP runs (adversarial content), so the decision is
    bit-exact for every input. The cond sits at batch level — under vmap
    it would execute both branches every time."""
    B, H, W = lbl.shape
    n = H * W
    R = B * H
    cap = min(_RUN_CAP, W)
    offs = (jnp.arange(B, dtype=jnp.int32) * n)[:, None, None]
    l2 = (lbl + offs).reshape(R, W)          # batch-global labels < B*n
    v2 = valid.reshape(R, W)
    start, runlen, nruns = _runs_along_rows(l2, v2)
    u = jnp.arange(W, dtype=jnp.int32)[None, :]

    def compact(_):
        k1 = jnp.where(start, u, W + u)                       # [R, W]
        sk, sl, srl = jax.lax.sort((k1, l2, runlen), num_keys=1,
                                   dimension=1)
        slot_ok = sk[:, :cap] < W
        big = jnp.int32(2 ** 30)
        key = jnp.where(slot_ok, sl[:, :cap], big).reshape(-1)
        rl = jnp.where(slot_ok, srl[:, :cap], 0).reshape(-1)
        pos = jnp.arange(R * cap, dtype=jnp.int32)
        gk, grl, gpos = jax.lax.sort((key, rl, pos), num_keys=1)
        new_seg = jnp.concatenate(
            [jnp.ones((1,), bool), gk[1:] != gk[:-1]])
        end_seg = jnp.concatenate([new_seg[1:], jnp.ones((1,), bool)])
        cs = jnp.cumsum(grl, dtype=jnp.int32)                 # inclusive
        cs_before = jax.lax.cummax(
            jnp.where(new_seg, cs - grl, -1))                 # monotone
        cs_end = jax.lax.cummin(
            jnp.where(end_seg, cs, jnp.int32(B * n + 1)), reverse=True)
        tot = cs_end - cs_before
        kill_sorted = ((tot < thr) & (gk < big)).astype(jnp.int32)
        # unsort kill to slot order: ONE 1-operand packed sort
        kill_slot = jax.lax.sort((gpos << 1) | kill_sorted) & 1
        kill_pad = jnp.zeros((R, W), jnp.int32) \
            .at[:, :cap].set(kill_slot.reshape(R, cap))
        # route slots back to their original columns (row-sort inverse):
        # u_orig is recoverable from the forward sort key
        u_orig = jnp.where(sk < W, sk, sk - W)
        inv = jax.lax.sort((u_orig << 1) | kill_pad, dimension=1) & 1
        # flood each run's kill bit from its start across the run
        floodkey = jnp.where(start, (u << 1) | inv, -1)
        flooded = jax.lax.cummax(floodkey, axis=1)
        return (v2 & ((flooded & 1) == 1)).reshape(B, H, W)

    def fallback(_):
        thr_c = max(int(thr), 1)
        sizes = jax.vmap(
            lambda lb, va: _segment_sizes(lb, va, clamp=thr_c))(lbl, valid)
        return valid & (sizes < thr)

    return jax.lax.cond(nruns <= cap, compact, fallback, None)


def remove_small_segments_batch(
    D: jnp.ndarray, params: ElasParams
) -> jnp.ndarray:
    """Batched remove_small_segments [B, H, W], bit-identical to the
    per-frame form (asserted in tests/test_speckle_cc.py)."""
    lbl = jax.vmap(lambda d: _connected_component_labels(
        d, params.speckle_sim_threshold))(D)
    thr = speckle_size_eff(params)
    kill = _small_segment_kill_batch(lbl, D >= 0, thr)
    return jnp.where(kill, -10.0, D)


def _nearest_valid_scan(valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per row: index of nearest valid pixel to the left / right (inclusive);
    -1 / W if none."""
    H, W = valid.shape
    idx = jnp.arange(W)[None, :]
    left = jax.lax.cummax(jnp.where(valid, idx, -1), axis=1)
    right = -jax.lax.cummax(
        jnp.where(valid, -idx, -W)[:, ::-1], axis=1)[:, ::-1]
    return left, right


def _gap_fill_rows(D: jnp.ndarray, gap_width: int) -> jnp.ndarray:
    """Row-wise gap interpolation (elas.cpp:1122-1166).

    For the small gap widths of the ROBOTICS preset (3 px) the nearest
    valid neighbors are found with gap_width+1 bounded shifts — far cheaper
    on TPU than cummax scans; wide-gap presets (MIDDLEBURY: 5000) fall back
    to the scan form."""
    valid = D >= 0
    W = D.shape[1]
    if gap_width <= 8:
        K = gap_width + 1
        big = jnp.float32(-1e9)
        Dp = jnp.pad(D, ((0, 0), (K, K)), constant_values=big)
        d1 = jnp.full_like(D, big)
        kl = jnp.full(D.shape, K + 1, jnp.int32)
        d2 = jnp.full_like(D, big)
        kr = jnp.full(D.shape, K + 1, jnp.int32)
        for k in range(K, 0, -1):  # nearest (smallest k) wins by overwrite
            lv = Dp[:, K - k:K - k + W]
            d1 = jnp.where(lv >= 0, lv, d1)
            kl = jnp.where(lv >= 0, k, kl)
            rv = Dp[:, K + k:K + k + W]
            d2 = jnp.where(rv >= 0, rv, d2)
            kr = jnp.where(rv >= 0, k, kr)
        gap_len = kl + kr - 1
        has_both = (d1 >= 0) & (d2 >= 0)
        d_ipol = jnp.where(jnp.abs(d1 - d2) < 3.0, (d1 + d2) / 2.0,
                           jnp.minimum(d1, d2))
        fill = (~valid) & has_both & (gap_len <= gap_width)
        return jnp.where(fill, d_ipol, D)

    left, right = _nearest_valid_scan(valid)
    has_both = (left >= 0) & (right < W)
    gap_len = right - left - 1
    li = jnp.clip(left, 0, W - 1)
    ri = jnp.clip(right, 0, W - 1)
    d1 = jnp.take_along_axis(D, li, axis=1)
    d2 = jnp.take_along_axis(D, ri, axis=1)
    d_ipol = jnp.where(jnp.abs(d1 - d2) < 3.0, (d1 + d2) / 2.0,
                       jnp.minimum(d1, d2))
    fill = (~valid) & has_both & (gap_len >= 1) & (gap_len <= gap_width)
    return jnp.where(fill, d_ipol, D)


def _extrapolate_rows(D: jnp.ndarray, gap_width: int) -> jnp.ndarray:
    """Border extrapolation for add_corners mode (elas.cpp:1169-1198)."""
    valid = D >= 0
    W = D.shape[1]
    idx = jnp.arange(W)[None, :]
    first = jnp.where(valid.any(1, keepdims=True),
                      jnp.argmax(valid, axis=1, keepdims=True), W)
    last = jnp.where(valid.any(1, keepdims=True),
                     W - 1 - jnp.argmax(valid[:, ::-1], axis=1, keepdims=True),
                     -1)
    dfirst = jnp.take_along_axis(D, jnp.clip(first, 0, W - 1), axis=1)
    dlast = jnp.take_along_axis(D, jnp.clip(last, 0, W - 1), axis=1)
    out = jnp.where(
        (idx < first) & (idx >= first - gap_width), dfirst, D)
    out = jnp.where(
        (idx > last) & (idx <= last + gap_width), dlast, out)
    return out


@partial(jax.jit, static_argnames=("params",))
def gap_interpolation(
    D: jnp.ndarray, params: ElasParams = ElasParams()
) -> jnp.ndarray:
    """elas.cpp:1101-1284: row pass then column pass (on the row result)."""
    g = gap_width_eff(params)
    out = _gap_fill_rows(D, g)
    if params.add_corners:
        out = _extrapolate_rows(out, g)
    out = _gap_fill_rows(out.T, g).T
    if params.add_corners:
        out = _extrapolate_rows(out.T, g).T
    return out


def _ref_absmask(x: jnp.ndarray) -> jnp.ndarray:
    """Reproduce the reference's broken 'absolute value' (elas.cpp:1320):
    `_mm_set1_ps(0x7FFFFFFF)` builds the float 2^31 (bits 0x4F000000), so
    `_mm_and_ps(x, mask)` keeps only exponent bits {30,27,26,25,24} of x —
    NOT |x|. The filter therefore behaves mostly like a box filter with
    value-dependent exclusions; we emulate the exact bit pattern."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.int32(0x4F000000), jnp.float32)


def _adaptive_pass(src: jnp.ndarray, axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One 8-tap pass of the reference's approximate bilateral filter.

    Window offsets -4..+3 around the center; weight
    max(0, 4 - ref_absmask(v - center)) (see _ref_absmask for the faithful
    bug emulation). Returns (result, store_ok) with
    store_ok = weight_sum>0 and result>=0 (elas.cpp:1434-1437)."""
    x = src if axis == 1 else src.T
    H, W = x.shape
    pad = jnp.pad(x, ((0, 0), (4, 4)), constant_values=0.0)
    center = x

    def tap(off):
        v = pad[:, 4 + off:4 + off + W]
        w = jnp.maximum(0.0, 4.0 - _ref_absmask(v - center))
        return v, w

    # SSE lane pairing: the circular val[8] buffer puts cols 4 apart in
    # lanes (k, k+4), which _mm_add_ps sums first; the horizontal reduce
    # then adds lanes 0..3 sequentially. Pair t = cols (c-4+t, c+t); lane of
    # pair t is (c+t)%4, so the sequential order rotates with c%4. Emulate
    # all 4 rotations and select, for bit-identical f32 rounding.
    pw, pf = [], []
    for t in range(4):
        v_a, w_a = tap(t - 4)
        v_b, w_b = tap(t)
        pw.append(w_a + w_b)
        pf.append(w_a * v_a + w_b * v_b)
    m = (jnp.arange(W) % 4)[None, :]
    wsum = jnp.zeros_like(x)
    fsum = jnp.zeros_like(x)
    for mm in range(4):
        o = [(k - mm) % 4 for k in range(4)]
        wv = ((pw[o[0]] + pw[o[1]]) + pw[o[2]]) + pw[o[3]]
        fv = ((pf[o[0]] + pf[o[1]]) + pf[o[2]]) + pf[o[3]]
        wsum = jnp.where(m == mm, wv, wsum)
        fsum = jnp.where(m == mm, fv, fsum)

    d = _exact_weight_div(fsum, wsum)
    ok = (wsum > 0) & (d >= 0)
    res = jnp.where(ok, d, x)
    return (res if axis == 1 else res.T), (ok if axis == 1 else ok.T)


def _exact_weight_div(fsum: jnp.ndarray, wsum: jnp.ndarray) -> jnp.ndarray:
    """fsum / wsum with x86-divss rounding on every backend. The weights
    of the reference's broken abs-mask bilateral are EXACTLY {0, 2, 4}
    (masked values are pure powers of two; 4 - 2^-97 rounds back to 4),
    so wsum is a small even integer: on TPU — whose native f32 divide is
    2 ulp off — the correctly-rounded quotient comes from exact integer
    division by the weight sum (softfloat.f32_div_small_int), retiring
    the last non-bit-exact op in the postprocess tail. XLA:CPU's fdiv is
    already correctly rounded (hardware divss)."""
    import jax

    den = jnp.where(wsum > 0, wsum, 1.0)
    if jax.default_backend() == "tpu":
        from ...ops.softfloat import f32_div_small_int
        return f32_div_small_int(fsum, den.astype(jnp.int32))
    return fsum / den


def _adaptive_pass4(src: jnp.ndarray, axis: int):
    """4-tap variant of the approximate bilateral pass (the subsampling
    branch, elas.cpp:1323-1391): window offsets -2..+1 around the center,
    same broken abs-mask weights, single SSE lane group summed in the
    col%4 rotation order."""
    x = src if axis == 1 else src.T
    H, W = x.shape
    pad = jnp.pad(x, ((0, 0), (2, 2)), constant_values=0.0)
    center = x

    taps = []
    for t in range(4):                 # offset t-2
        v = pad[:, t:t + W]
        w = jnp.maximum(0.0, 4.0 - _ref_absmask(v - center))
        taps.append((w, w * v))

    m = (jnp.arange(W) % 4)[None, :]
    wsum = jnp.zeros_like(x)
    fsum = jnp.zeros_like(x)
    for mm in range(4):
        o = [(k - mm + 2) % 4 for k in range(4)]
        wv = ((taps[o[0]][0] + taps[o[1]][0]) + taps[o[2]][0]) + taps[o[3]][0]
        fv = ((taps[o[0]][1] + taps[o[1]][1]) + taps[o[2]][1]) + taps[o[3]][1]
        wsum = jnp.where(m == mm, wv, wsum)
        fsum = jnp.where(m == mm, fv, fsum)

    d = _exact_weight_div(fsum, wsum)
    ok = (wsum > 0) & (d >= 0)
    res = jnp.where(ok, d, x)
    return (res if axis == 1 else res.T), (ok if axis == 1 else ok.T)


@jax.jit
def adaptive_mean_sub(D: jnp.ndarray) -> jnp.ndarray:
    """adaptiveMean, subsampling branch (4-px window; elas.cpp:1323-1391).

    Horizontal writes rows [3, H-4] x cols [2, W-2] into D_tmp; vertical
    writes rows [2, H-2] x cols [3, W-4] into D."""
    H, W = D.shape
    invalid = D < 0
    D_copy = jnp.where(invalid, -10.0, D)

    hres, hok = _adaptive_pass4(D_copy, axis=1)
    row_ok = (jnp.arange(H) >= 3) & (jnp.arange(H) <= H - 4)
    col_ok = (jnp.arange(W) >= 2) & (jnp.arange(W) <= W - 2)
    hmask = row_ok[:, None] & col_ok[None, :] & hok
    D_tmp = jnp.where(invalid, -10.0, 0.0)
    D_tmp = jnp.where(hmask, hres, D_tmp)

    vres, vok = _adaptive_pass4(D_tmp, axis=0)
    row_ok2 = (jnp.arange(H) >= 2) & (jnp.arange(H) <= H - 2)
    col_ok2 = (jnp.arange(W) >= 3) & (jnp.arange(W) <= W - 4)
    vmask = row_ok2[:, None] & col_ok2[None, :] & vok
    return jnp.where(vmask, vres, D)


@jax.jit
def adaptive_mean(D: jnp.ndarray) -> jnp.ndarray:
    """elas.cpp:1287-1492 (full-resolution 8-px variant), reproducing the
    reference's buffer semantics:

      D_copy = D with invalid -> -10 (valid values unchanged)
      D_tmp  = zero pages, invalid -> -10; horizontal pass writes only
               rows [3, H-4] x cols [4, W-4]
      final  = D overwritten only at rows [4, H-4] x cols [3, W-4] where the
               vertical pass stored
    """
    H, W = D.shape
    invalid = D < 0
    D_copy = jnp.where(invalid, -10.0, D)

    # horizontal pass over D_copy
    hres, hok = _adaptive_pass(D_copy, axis=1)
    row_ok = (jnp.arange(H) >= 3) & (jnp.arange(H) <= H - 4)
    col_ok = (jnp.arange(W) >= 4) & (jnp.arange(W) <= W - 4)
    hmask = row_ok[:, None] & col_ok[None, :] & hok
    D_tmp = jnp.where(invalid, -10.0, 0.0)
    D_tmp = jnp.where(hmask, hres, D_tmp)

    # vertical pass over D_tmp
    vres, vok = _adaptive_pass(D_tmp, axis=0)
    row_ok2 = (jnp.arange(H) >= 4) & (jnp.arange(H) <= H - 4)
    col_ok2 = (jnp.arange(W) >= 3) & (jnp.arange(W) <= W - 4)
    vmask = row_ok2[:, None] & col_ok2[None, :] & vok
    return jnp.where(vmask, vres, D)


@partial(jax.jit, static_argnames=("params",))
def post_tail(
    D1: jnp.ndarray, D2: jnp.ndarray, params: ElasParams = ElasParams()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gap interpolation + optional filters as one jitted program (the
    post-speckle tail, used by the hybrid native-speckle path)."""
    D1 = gap_interpolation(D1, params)
    if not params.postprocess_only_left:
        D2 = gap_interpolation(D2, params)
    am = adaptive_mean_sub if params.subsampling else adaptive_mean
    if params.filter_adaptive_mean:
        D1 = am(D1)
        if not params.postprocess_only_left:
            D2 = am(D2)
    if params.filter_median:
        D1 = median_filter(D1)
        if not params.postprocess_only_left:
            D2 = median_filter(D2)
    return D1, D2


@partial(jax.jit, static_argnames=("params", "lr_smax"))
def postprocess(
    D1: jnp.ndarray, D2: jnp.ndarray, params: ElasParams = ElasParams(),
    lr_smax: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full postprocessing chain as ONE jitted program (elas.cpp:108-140):
    L/R check -> speckle -> gaps -> adaptive mean -> median, honoring
    postprocess_only_left. One device program instead of 4-6 dispatch
    round-trips per frame. lr_smax: see left_right_consistency_check."""
    D1, D2 = left_right_consistency_check(D1, D2, params, lr_smax)
    D1 = remove_small_segments(D1, params)
    if not params.postprocess_only_left:
        D2 = remove_small_segments(D2, params)
    D1 = gap_interpolation(D1, params)
    if not params.postprocess_only_left:
        D2 = gap_interpolation(D2, params)
    am = adaptive_mean_sub if params.subsampling else adaptive_mean
    if params.filter_adaptive_mean:
        D1 = am(D1)
        if not params.postprocess_only_left:
            D2 = am(D2)
    if params.filter_median:
        D1 = median_filter(D1)
        if not params.postprocess_only_left:
            D2 = median_filter(D2)
    return D1, D2


@partial(jax.jit, static_argnames=("params", "lr_smax"))
def postprocess_batch(
    D1: jnp.ndarray, D2: jnp.ndarray, params: ElasParams = ElasParams(),
    lr_smax: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched postprocess [B, H, W], bit-identical to vmapping
    `postprocess` over frames. Exists so the speckle kill can run its
    batch-level run-compaction cond (_small_segment_kill_batch) — under a
    per-frame vmap the cond would execute both branches."""
    lr = jax.vmap(lambda a, b: left_right_consistency_check(
        a, b, params, lr_smax))
    D1, D2 = lr(D1, D2)
    D1 = remove_small_segments_batch(D1, params)
    if not params.postprocess_only_left:
        D2 = remove_small_segments_batch(D2, params)
    tail = jax.vmap(lambda a, b: post_tail(a, b, params))
    return tail(D1, D2)


@jax.jit
def median_filter(D: jnp.ndarray) -> jnp.ndarray:
    """elas.cpp:1494-1560: separable 7-tap median, only where D >= 0.

    D_temp border semantics (calloc zeros outside the written interior)
    reproduced."""
    H, W = D.shape
    ws = 3

    def pass_axis(src, base, axis):
        x = src if axis == 1 else src.T
        h, w = x.shape
        pad = jnp.pad(x, ((0, 0), (ws, ws)), constant_values=0.0)
        taps = jnp.stack([pad[:, k:k + w] for k in range(2 * ws + 1)], 0)
        med = jnp.median(taps, axis=0)
        return med if axis == 1 else med.T

    valid = D >= 0
    interior = jnp.zeros_like(valid)
    interior = interior.at[ws:H - ws, ws:W - ws].set(True)

    med_h = pass_axis(D, D, 1)
    D_temp = jnp.zeros_like(D)
    D_temp = jnp.where(interior, jnp.where(valid, med_h, D), D_temp)

    med_v = pass_axis(D_temp, D_temp, 0)
    out = jnp.where(interior & valid, med_v, D)
    return out
