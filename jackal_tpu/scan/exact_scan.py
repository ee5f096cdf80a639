"""Bit-exact device obstacle scan (publishObstacleScan(Mat&) in f64).

The fused production scan (scan/obstacle.py) computes in f32 — fast, but
bin assignments can flip against the reference's f64 loop at bin
boundaries (the retired >97%-agreement tolerance). This module reproduces
point_cloud.cpp:213-296 EXACTLY on device:

  - the Q reprojection, camera->robot transform and r = sqrt(Y*Y + X*X)
    run in softfloat f64 (ops/softfloat.py — RNE add/mul/div and the new
    correctly-rounded f64_sqrt), following the reference's operation
    order (left-associated gemv rows, then the XT add);
  - the bin index k = floor(90*(45 - theta_deg)/90), theta_deg =
    (atan2(Y,X)*180)/3.1415, is decided WITHOUT computing atan2 on
    device: the host bit-searches the 92 f64 angle boundaries T_j of the
    composed float expression (K below), and the device compares the true
    angle against the rounding midpoints M_j via exact-signed
    double-double cross products sign(Y*cos(M) - X*sin(M)) — Dekker
    two_prod on the softfloat ops, whose multiply is correctly rounded,
    makes the products error-free. A float32 atan2 estimate picks the
    candidate bin; the two midpoint tests correct it by at most +/-1
    (f32 angle error ~1e-5 rad << the 0.0175 rad bin width);
  - per-bin minima / range extrema reduce over the f64 bit patterns
    through the monotone total-order map (softfloat.f64_ord), so winners
    are exact;
  - angle_min/angle_max: the device finds the extremal-angle pixels by
    (quadrant band, exact f64 ratio Y/X) lexicographic order — monotone
    in atan2 — and the HOST evaluates the two atan2 calls (math.atan2,
    the same libm double the reference calls) on those pixels' exactly
    recomputed X, Y.

Assumptions (documented, probabilistically negligible): the platform
libm's atan2 is correctly rounded at the <=92 bin-boundary midpoints
(failures need the true angle within ~2^-63 rad of a midpoint), and no
two accepted pixels share a band with angle gap < ~2^-104 while
competing for an extremum.

This is the VERIFICATION path (ScanParams-independent geometry; 90 bins
over +/-45 deg like the reference constants). The fused f32 path stays
the throughput default; tests/test_scan.py asserts this path equals the
f64 host loop with assert_array_equal and bounds the f32 path's
deviation against it.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np

from ..config import REF_PI
from .obstacle import INF, ScanResult

_BINS = 90
_NJ = _BINS + 2          # boundary tables for j = 0..91


# ---------------------------------------------------------------------------
# host: boundary tables
# ---------------------------------------------------------------------------

def _K(th: float) -> int:
    """The reference's composed bin expression on an f64 angle
    (point_cloud.cpp:255-264): theta_deg = theta*180/3.1415 (two
    roundings), k = floor(90*(45 - theta_deg)/90). Python floats are
    IEEE binary64 with correct rounding — identical to the C++ doubles."""
    thd = th * 180.0 / REF_PI
    return math.floor((90.0 * (45.0 - thd)) / 90.0)


def _ord_f64(x: float) -> int:
    """Host twin of softfloat.f64_ord (signed int64 total order)."""
    b = np.array(x, np.float64).view(np.int64).item()
    if b >= 0:
        return b
    u = ((~b) ^ (1 << 63)) & 0xFFFFFFFFFFFFFFFF
    return u - (1 << 64)          # reinterpret as signed (bit 63 is set)


def _from_ord(o: int) -> float:
    """Inverse of _ord_f64 (o as a signed python int)."""
    if o >= 0:
        b = o
    else:
        b = (~((o + (1 << 64)) ^ (1 << 63))) & 0xFFFFFFFFFFFFFFFF
    return np.array(np.uint64(b), np.uint64).view(np.float64).item()


@lru_cache(maxsize=1)
def _boundary_tables() -> Tuple[np.ndarray, ...]:
    """Per j in 0..91: T_j = smallest f64 theta with K(theta) <= j-1
    (K is nonincreasing), the rounding midpoint M_j = (pred(T_j)+T_j)/2
    as a double-double, and cos/sin of M_j as double-doubles (np.float128
    = x86 80-bit extended gives ~2^-63 relative accuracy — far below the
    decision margin). Row j = 91 is a sentinel (forced 'below')."""
    c_hi = np.zeros(_NJ)
    c_lo = np.zeros(_NJ)
    s_hi = np.zeros(_NJ)
    s_lo = np.zeros(_NJ)
    for j in range(_BINS + 1):                    # j = 0..90
        lo, hi = _ord_f64(-0.8), _ord_f64(0.8)
        # invariant: K(from_ord(hi)) <= j-1 < K(from_ord(lo))
        assert _K(_from_ord(hi)) <= j - 1 < _K(_from_ord(lo))
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if _K(_from_ord(mid)) <= j - 1:
                hi = mid
            else:
                lo = mid
        T = _from_ord(hi)
        Tp = np.nextafter(np.float64(T), np.float64(-np.inf))
        m_hi = np.float64(T)
        m_lo = (Tp - np.float64(T)) / 2.0         # exact: half an ulp
        M = np.float128(m_hi) + np.float128(m_lo)
        c = np.cos(M)
        s = np.sin(M)
        c_hi[j] = np.float64(c)
        c_lo[j] = np.float64(c - np.float128(c_hi[j]))
        s_hi[j] = np.float64(s)
        s_lo[j] = np.float64(s - np.float128(s_hi[j]))
    return (c_hi.view(np.int64), c_lo.view(np.int64),
            s_hi.view(np.int64), s_lo.view(np.int64))


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

_JIT = {}


def _build_kernel(H: int, W: int, ox: int, oy: int):
    import jax
    import jax.numpy as jnp
    from ..ops import softfloat as sf

    def split(a):
        # Dekker split (exact with RNE multiply; magnitudes here << 2^996)
        c = sf.f64_mul(a, _c(134217729.0))        # 2^27 + 1
        hi = sf.f64_sub(c, sf.f64_sub(c, a))
        return hi, sf.f64_sub(a, hi)

    def _c(v):
        return jnp.int64(np.float64(v).view(np.int64).item())

    def two_prod(a, b):
        p = sf.f64_mul(a, b)
        a1, a2 = split(a)
        b1, b2 = split(b)
        e = sf.f64_add(
            sf.f64_add(
                sf.f64_add(sf.f64_sub(sf.f64_mul(a1, b1), p),
                           sf.f64_mul(a1, b2)),
                sf.f64_mul(a2, b1)),
            sf.f64_mul(a2, b2))
        return p, e

    def gt_mid(Yb, Xb, ch, cl, sh, sl):
        """True iff atan2-angle(Y, X) > M where (ch+cl, sh+sl) = cos/sin M
        in double-double: sign of Y*cosM - X*sinM, products error-free."""
        p1, e1 = two_prod(Yb, ch)
        p2, e2 = two_prod(Xb, sh)
        s0 = sf.f64_sub(p1, p2)
        bb = sf.f64_sub(s0, p1)
        err0 = sf.f64_add(sf.f64_sub(p1, sf.f64_sub(s0, bb)),
                          sf.f64_sub(sf.f64_neg(p2), bb))
        tail = sf.f64_add(sf.f64_sub(e1, e2),
                          sf.f64_sub(sf.f64_mul(Yb, cl),
                                     sf.f64_mul(Xb, sl)))
        tot = sf.f64_add(s0, sf.f64_add(err0, tail))
        return (tot > 0) & ((sf._u(tot) & jnp.uint64(sf._MAG)) != 0)

    def scale_pair(Xb, Yb):
        """Rescale (X, Y) by a power of two so f32 casts cannot underflow
        — the angle is scale-invariant, and so are the dd comparison
        signs and the ratio ord (scaling adds to both exponents)."""
        ex = (sf._u(Xb) >> jnp.uint64(52)) & jnp.uint64(0x7FF)
        ey = (sf._u(Yb) >> jnp.uint64(52)) & jnp.uint64(0x7FF)
        zx = (sf._u(Xb) & jnp.uint64(sf._MAG)) == 0
        zy = (sf._u(Yb) & jnp.uint64(sf._MAG)) == 0
        emax = jnp.maximum(jnp.where(zx, jnp.uint64(0), ex),
                           jnp.where(zy, jnp.uint64(0), ey))
        shift = (jnp.int64(1023) - sf._i(emax)) << jnp.int64(52)

        def adj(b, z):
            return jnp.where(z, b, sf._i(sf._u(b) + sf._u(shift)))
        return adj(Xb, zx), adj(Yb, zy)

    tabs = _boundary_tables()

    def kernel(dmap_u8, vlo, vhi, Qb, XRb, XTb):
        d_i = dmap_u8.astype(jnp.int32)
        accept = (d_i >= vlo) & (d_i <= vhi)
        u_i = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[None, :] + ox, (H, W))
        v_i = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[:, None] + oy, (H, W))
        ub = sf.f64_from_i32(u_i)
        vb = sf.f64_from_i32(v_i)
        db = sf.f64_from_i32(d_i)

        def gemv_row(q):
            t = sf.f64_add(sf.f64_mul(q[0], ub), sf.f64_mul(q[1], vb))
            t = sf.f64_add(t, sf.f64_mul(q[2], db))
            return sf.f64_add(t, jnp.broadcast_to(q[3], t.shape))

        r0 = gemv_row(Qb[0])
        r1 = gemv_row(Qb[1])
        r2 = gemv_row(Qb[2])
        r3 = gemv_row(Qb[3])
        X = sf.f64_div(r0, r3)
        Y = sf.f64_div(r1, r3)
        Z = sf.f64_div(r2, r3)

        def rot_row(rr, t):
            s = sf.f64_add(sf.f64_mul(rr[0], X), sf.f64_mul(rr[1], Y))
            s = sf.f64_add(s, sf.f64_mul(rr[2], Z))
            return sf.f64_add(s, jnp.broadcast_to(t, s.shape))

        Xr = rot_row(XRb[0], XTb[0])
        Yr = rot_row(XRb[1], XTb[1])

        r2b = sf.f64_add(sf.f64_mul(Yr, Yr), sf.f64_mul(Xr, Xr))
        rb = sf.f64_sqrt(r2b)

        # --- bin decision ---
        Xs, Ys = scale_pair(Xr, Yr)
        Xf = jax.lax.bitcast_convert_type(sf.f64_to_f32_bits(Xs),
                                          jnp.float32)
        Yf = jax.lax.bitcast_convert_type(sf.f64_to_f32_bits(Ys),
                                          jnp.float32)
        th32 = jnp.arctan2(Yf, Xf)
        thd32 = th32 * np.float32(180.0 / REF_PI)
        khat = jnp.floor(90.0 * (45.0 - thd32) / 90.0).astype(jnp.int32)

        x_pos = ((sf._u(Xr) >> jnp.uint64(63)) == 0) \
            & ((sf._u(Xr) & jnp.uint64(sf._MAG)) != 0)
        x_zero = (sf._u(Xr) & jnp.uint64(sf._MAG)) == 0
        y_zero = (sf._u(Yr) & jnp.uint64(sf._MAG)) == 0
        cand = x_pos & (khat >= -1) & (khat <= 90)

        jj_a = jnp.clip(khat, 0, _NJ - 1)
        jj_b = jnp.clip(khat + 1, 0, _NJ - 1)
        sel = [jnp.zeros((H, W), jnp.int64) for _ in range(8)]
        for j in range(_NJ):
            for ti, tab in enumerate(tabs):
                cst = jnp.int64(int(tab[j]))
                sel[ti] = jnp.where(jj_a == j, cst, sel[ti])
                sel[4 + ti] = jnp.where(jj_b == j, cst, sel[4 + ti])
        a = cand & (khat >= 0) & (khat <= 90) \
            & gt_mid(Ys, Xs, sel[0], sel[1], sel[2], sel[3])
        b = (khat + 1 > 90) | gt_mid(Ys, Xs, sel[4], sel[5], sel[6], sel[7])
        k = jnp.where(a, khat - 1, jnp.where(~b, khat + 1, khat))
        use = cand & (k >= 0) & (k < _BINS) & accept
        # atan2(0, 0) = 0 -> bin 45, r = 0 (the reference bins it)
        origin = x_zero & y_zero & accept
        k = jnp.where(origin, 45, k)
        use = use | origin

        # --- per-bin minima over exact f64 keys ---
        rkey = sf.f64_ord(rb)
        big = jnp.int64(0x7FFFFFFFFFFFFFFF)
        rmask = jnp.where(use, rkey, big)
        scan_ord = jnp.stack([
            jnp.min(jnp.where(k == kb, rmask, big))
            for kb in range(_BINS)])

        rmask_acc = jnp.where(accept, rkey, big)
        rmin_ord = jnp.min(rmask_acc)
        rmax_ord = jnp.max(jnp.where(accept, rkey, jnp.int64(-(1 << 63))))

        # --- angle extrema: (band, ratio ord) lexicographic ---
        y_neg = (sf._u(Yr) >> jnp.uint64(63)) != 0
        band = jnp.where(
            x_pos | (x_zero & y_zero), 2,
            jnp.where(x_zero & y_neg, 1,
                      jnp.where(x_zero, 3,
                                jnp.where(y_neg, 0, 4)))).astype(jnp.int32)
        safe_X = jnp.where(x_zero, _c(1.0), Xs)
        ratio = jnp.where(x_zero, jnp.int64(0), sf.f64_div(Ys, safe_X))
        rato = sf.f64_ord(ratio)

        bigb = jnp.int32(9)
        band_min = jnp.min(jnp.where(accept, band, bigb))
        band_max = jnp.max(jnp.where(accept, band, -bigb))
        in_min = accept & (band == band_min)
        in_max = accept & (band == band_max)
        ord_min = jnp.min(jnp.where(in_min, rato, big))
        ord_max = jnp.max(jnp.where(in_max, rato, jnp.int64(-(1 << 63))))
        amin_idx = jnp.argmax((in_min & (rato == ord_min)).reshape(-1))
        amax_idx = jnp.argmax((in_max & (rato == ord_max)).reshape(-1))
        n_acc = jnp.sum(accept.astype(jnp.int32))
        return scan_ord, rmin_ord, rmax_ord, amin_idx, amax_idx, n_acc

    return kernel


def obstacle_scan_from_disparity_exact(
    dmap_u8, valid_disp, Q, XR, XT,
    crop_offset_x: int = 0, crop_offset_y: int = 0,
) -> ScanResult:
    """Bit-exact twin of the reference publishObstacleScan(Mat&) loop
    (point_cloud.cpp:213-296): identical f64 arithmetic on device, host
    atan2 only at the two extremal pixels. Returns a ScanResult whose
    fields are np.float64 — assert_array_equal against the host loop
    holds (tests/test_scan.py::test_exact_scan_bit_equal)."""
    import jax
    import jax.numpy as jnp

    dmap = np.asarray(dmap_u8)
    H, W = dmap.shape
    key = (H, W, crop_offset_x, crop_offset_y)
    if key not in _JIT:
        kern = _build_kernel(H, W, crop_offset_x, crop_offset_y)

        def traced(dm, vlo, vhi, Qb, XRb, XTb):
            with jax.enable_x64(True):
                return kern(dm, vlo, vhi, Qb, XRb, XTb)
        _JIT[key] = jax.jit(traced)

    Q64 = np.asarray(Q, np.float64)
    XR64 = np.asarray(XR, np.float64)
    XT64 = np.asarray(XT, np.float64).reshape(3)
    with jax.enable_x64(True):
        out = _JIT[key](
            jnp.asarray(dmap), jnp.asarray(valid_disp[..., 0], jnp.int32),
            jnp.asarray(valid_disp[..., 1], jnp.int32),
            jnp.asarray(Q64.view(np.int64)),
            jnp.asarray(XR64.view(np.int64)),
            jnp.asarray(XT64.view(np.int64)))
        scan_ord, rmin_o, rmax_o, ai, ax, n_acc = (np.asarray(x) for x in out)

    scan = np.array([_from_ord(int(o)) if int(o) != 0x7FFFFFFFFFFFFFFF
                     else INF for o in scan_ord], np.float64)
    if int(n_acc) == 0:
        return ScanResult(scan, np.float64(400.0), np.float64(-400.0),
                          np.float64(INF), np.float64(-500.0))

    def host_theta(flat_idx):
        j, i = divmod(int(flat_idx), W)
        d = float(dmap[j, i])
        u = float(i + crop_offset_x)
        v = float(j + crop_offset_y)
        row = [None] * 4
        for r in range(4):
            t = Q64[r, 0] * u + Q64[r, 1] * v
            t = t + Q64[r, 2] * d
            row[r] = t + Q64[r, 3]
        X = row[0] / row[3]
        Y = row[1] / row[3]
        Z = row[2] / row[3]
        Xr = (XR64[0, 0] * X + XR64[0, 1] * Y) + XR64[0, 2] * Z + XT64[0]
        Yr = (XR64[1, 0] * X + XR64[1, 1] * Y) + XR64[1, 2] * Z + XT64[1]
        return math.atan2(Yr, Xr)

    return ScanResult(
        scan,
        np.float64(host_theta(ai)), np.float64(host_theta(ax)),
        np.float64(_from_ord(int(rmin_o))), np.float64(_from_ord(int(rmax_o))))
