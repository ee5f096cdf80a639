"""Vectorized IEEE-754 binary64 arithmetic in integer lanes ("softfloat").

TPUs have no float64 hardware, but the ELAS plane fit must reproduce the
reference's f64 Gauss-Jordan solve (matrix.cpp:414-502 via the native
engine's solve3, prior_engine.cpp:98) *bit-exactly*: the fitted plane
coefficients are rounded to f32 and drive integer candidate windows in the
dense matcher, so a 1-ulp difference can flip a disparity. Rather than
shipping the fit over the (slow, tunnel-attached) host->device wire, this
module emulates f64 add/sub/mul/div with round-to-nearest-even in int64/
uint64 lane ops — ~40 integer ops per float op, fully vectorized over the
triangle batch, a few microseconds per frame on the VPU.

Domain: normal numbers and signed zeros. The Gauss-Jordan inputs are small
integers (|u|,|v| < 2^11, d < 2^9) and the solve's intermediates stay many
orders of magnitude away from f64 overflow/underflow, so NaN/inf/subnormal
*inputs* are not handled (asserted nowhere — garbage in, garbage out);
f64->f32 conversion does implement subnormal outputs since a freak
cancellation could leave a coefficient below 2^-126.

All functions take/return int64 arrays holding raw IEEE-754 bit patterns
("bits" suffix). Trace them under `with jax.enable_x64(True):` (scoped —
the global x64 flag stays off; see tests/test_softfloat.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SIGN = -0x8000000000000000          # bit 63 as int64
_MAG = 0x7FFFFFFFFFFFFFFF
_MASK52 = (1 << 52) - 1
_IMPL = 1 << 52                      # implicit mantissa bit


def _u(x):
    return x.astype(jnp.uint64)


def _i(x):
    return x.astype(jnp.int64)


def _unpack(bits):
    """-> (sign 0/1 u64, biased exp u64, mantissa-with-implicit-bit u64,
    is_zero bool). Inputs must be normal or zero (see module docstring)."""
    u = _u(bits)
    s = u >> jnp.uint64(63)
    e = (u >> jnp.uint64(52)) & jnp.uint64(0x7FF)
    frac = u & jnp.uint64(_MASK52)
    m = frac | jnp.uint64(_IMPL)
    iszero = (u & jnp.uint64(_MAG)) == 0
    return s, e, m, iszero


def _pack(s, e, m):
    """sign 0/1, biased exp, mantissa in [2^52, 2^53) -> bits (int64)."""
    u = (s << jnp.uint64(63)) | (e << jnp.uint64(52)) \
        | (m & jnp.uint64(_MASK52))
    return _i(u)


def _zero(s):
    return _i(s << jnp.uint64(63))


def _rne(kept, e, rnd, sticky):
    """Round-to-nearest-even: kept in [2^52, 2^53), round bit, sticky.
    Returns (mantissa, exp) with the carry into 2^53 renormalized."""
    inc = rnd & (sticky | (kept & jnp.uint64(1)).astype(bool))
    kept = kept + inc.astype(jnp.uint64)
    carry = kept == jnp.uint64(1 << 53)
    kept = jnp.where(carry, jnp.uint64(1 << 52), kept)
    e = e + carry.astype(jnp.uint64)
    return kept, e


def _jam_shift(x, n):
    """Logical right shift with sticky ("jamming"): lost bits OR into the
    LSB. x u64, n u64 in [0, 63]."""
    n = jnp.minimum(n, jnp.uint64(63))
    lost = (x & ((jnp.uint64(1) << n) - jnp.uint64(1))) != 0
    return (x >> n) | lost.astype(jnp.uint64)


def _norm_to_62(x):
    """Shift x (u64, 0 < x < 2^63) left so bit 62 is the leading bit.
    Returns (normalized, shift_count u64)."""
    shift = jnp.zeros_like(x)
    for k in (32, 16, 8, 4, 2, 1):
        c = x < (jnp.uint64(1) << jnp.uint64(63 - k))
        x = jnp.where(c, x << jnp.uint64(k), x)
        shift = shift + jnp.where(c, jnp.uint64(k), jnp.uint64(0))
    return x, shift


def f64_neg(a):
    return _i(_u(a) ^ jnp.uint64(1 << 63))


def f64_abs_lt(a, b):
    """|a| < |b| by magnitude-bit compare (exact for normals/zeros)."""
    return (_u(a) & jnp.uint64(_MAG)) < (_u(b) & jnp.uint64(_MAG))


def f64_abs_gt(a, b):
    return (_u(a) & jnp.uint64(_MAG)) > (_u(b) & jnp.uint64(_MAG))


def f64_add(a, b):
    """a + b with RNE, Berkeley-softfloat style (10 guard bits).

    Signed-zero semantics match hardware: (+x) + (-x) = +0; zero operands
    pass the other through; (-0) + (-0) = -0.
    """
    sa, ea, ma, za = _unpack(a)
    sb, eb, mb, zb = _unpack(b)

    # order so |x| >= |y|; on equal magnitude keep a first (sum symmetric;
    # for cancellation the result is +0 regardless)
    swap = f64_abs_lt(a, b)
    sx = jnp.where(swap, sb, sa)
    ex = jnp.where(swap, eb, ea)
    mx = jnp.where(swap, mb, ma)
    sy = jnp.where(swap, sa, sb)
    ey = jnp.where(swap, ea, eb)
    my = jnp.where(swap, ma, mb)

    de = ex - ey
    X = mx << jnp.uint64(10)                  # bit 62 leading
    Y = _jam_shift(my << jnp.uint64(10), de)

    eff_sub = sa != sb

    # --- same sign: add ---
    Ssum = X + Y                              # may carry into bit 63
    carry = Ssum >= jnp.uint64(1 << 63)
    Ssum = jnp.where(carry, _jam_shift(Ssum, jnp.uint64(1)), Ssum)
    esum = ex + carry.astype(jnp.uint64)

    # --- opposite sign: subtract (X >= Y by ordering) ---
    D = X - Y
    cancel = D == 0                           # exact cancellation -> +0
    Dn, lz = _norm_to_62(jnp.maximum(D, jnp.uint64(1)))
    esub = ex - lz

    S = jnp.where(eff_sub, Dn, Ssum)
    e = jnp.where(eff_sub, esub, esum)

    rb = S & jnp.uint64(0x3FF)
    kept = S >> jnp.uint64(10)
    rnd = (rb & jnp.uint64(0x200)) != 0
    sticky = (rb & jnp.uint64(0x1FF)) != 0
    kept, e = _rne(kept, e, rnd, sticky)
    out = _pack(sx, e, kept)

    # zeros: x + (+/-0) = x; (+/-0) + (+/-0) = sign AND (RNE: -0 only if
    # both -0); effective-subtraction cancellation = +0
    both_zero = za & zb
    out = jnp.where(za & ~zb, b, out)
    out = jnp.where(zb & ~za, a, out)
    out = jnp.where(both_zero, _zero(sa & sb), out)
    out = jnp.where(eff_sub & cancel & ~za & ~zb,
                    _zero(jnp.uint64(0)), out)
    return out


def f64_sub(a, b):
    return f64_add(a, f64_neg(b))


def f64_mul(a, b):
    sa, ea, ma, za = _unpack(a)
    sb, eb, mb, zb = _unpack(b)
    s = sa ^ sb

    # 106-bit product via 26/27-bit limbs
    M26 = jnp.uint64((1 << 26) - 1)
    a0 = ma & M26
    a1 = ma >> jnp.uint64(26)
    b0 = mb & M26
    b1 = mb >> jnp.uint64(26)
    c0 = a0 * b0                              # < 2^52
    c1 = a0 * b1 + a1 * b0                    # < 2^54
    c2 = a1 * b1                              # < 2^54
    t0 = c0 + ((c1 & M26) << jnp.uint64(26))  # < 2^53
    t1 = c2 + (c1 >> jnp.uint64(26)) + (t0 >> jnp.uint64(52))
    t0 = t0 & jnp.uint64(_MASK52)
    # full = t1*2^52 + t0, t1 in [2^52, 2^54), t0 < 2^52

    hi = t1 >= jnp.uint64(1 << 53)
    kept = jnp.where(hi, t1 >> jnp.uint64(1), t1)
    rnd = jnp.where(hi, (t1 & jnp.uint64(1)) != 0,
                    (t0 >> jnp.uint64(51)) != 0)
    sticky = jnp.where(hi, t0 != 0,
                       (t0 & jnp.uint64((1 << 51) - 1)) != 0)
    e = ea + eb - jnp.uint64(1023) + hi.astype(jnp.uint64)
    kept, e = _rne(kept, e, rnd, sticky)
    out = _pack(s, e, kept)
    return jnp.where(za | zb, _zero(s), out)


def _div_chunk(r, mb, mf):
    """floor(r / mb) for r < mb*2^10, mb in [2^52, 2^53), with the
    quotient digit ESTIMATED by one f32 division and repaired by exact
    integer corrections. A variable-divisor u64 `//` lowers to a
    bit-serial loop on TPU's emulated int64 lanes (~2 s per dispatch
    measured, and it bloats the XLA program enough to stall compiles for
    minutes); the estimate's error is < 2^10 * (2*2^-24 + 2*2^-23)
    + 1 < 2, so two where-corrections per side make it exact."""
    qi = (r.astype(jnp.float32) / mf).astype(jnp.uint64)
    rem = _i(r) - _i(qi * mb)
    mbi = _i(mb)
    for _ in range(2):
        neg = rem < 0
        qi = jnp.where(neg, qi - jnp.uint64(1), qi)
        rem = jnp.where(neg, rem + mbi, rem)
    for _ in range(2):
        big = rem >= mbi
        qi = jnp.where(big, qi + jnp.uint64(1), qi)
        rem = jnp.where(big, rem - mbi, rem)
    return qi, _u(rem)


def f64_div(a, b):
    """a / b with RNE. b must be nonzero (the Gauss-Jordan pivot is
    singularity-gated before any division)."""
    sa, ea, ma, za = _unpack(a)
    sb, eb, mb, _ = _unpack(b)
    s = sa ^ sb

    # q54 = floor(ma * 2^54 / mb), r54 = remainder — 6 chunks of 9 bits
    # (r < 2^53 so r<<9 < 2^62 never overflows)
    q = jnp.zeros_like(ma)
    r = ma
    mf = mb.astype(jnp.float32)
    for _ in range(6):
        qi, r = _div_chunk(r << jnp.uint64(9), mb, mf)
        q = (q << jnp.uint64(9)) | qi
    big = ma >= mb                            # quotient in [1, 2)
    kept = jnp.where(big, q >> jnp.uint64(2), q >> jnp.uint64(1))
    rnd = jnp.where(big, (q & jnp.uint64(2)) != 0,
                    (q & jnp.uint64(1)) != 0)
    sticky = jnp.where(big, ((q & jnp.uint64(1)) != 0) | (r != 0), r != 0)
    e = ea - eb + jnp.where(big, jnp.uint64(1023), jnp.uint64(1022))
    kept, e = _rne(kept, e, rnd, sticky)
    out = _pack(s, e, kept)
    return jnp.where(za, _zero(s), out)


def f64_from_i32(x):
    """Exact int -> f64 (|x| < 2^53). x int32/int64 array."""
    xi = _i(x)
    s = (xi < 0).astype(jnp.uint64)
    m = _u(jnp.abs(xi))
    iszero = m == 0
    # normalize so bit 52 is leading: start from bit 62 then shift back
    m62, lz = _norm_to_62(jnp.maximum(m, jnp.uint64(1)))
    # m62 = m << lz, kept = m << (lz - 10) exact (lz >= 10 for m < 2^53);
    # value = m = kept * 2^(10 - lz)  =>  e - 1075 = 10 - lz
    kept = m62 >> jnp.uint64(10)
    e = jnp.uint64(1085) - lz
    out = _pack(s, e, kept)
    return jnp.where(iszero, _zero(jnp.uint64(0)), out)


def f64_to_f32_bits(bits):
    """C-cast (double)->(float) with RNE, including subnormal outputs.
    Returns int32 raw f32 bit patterns."""
    s, e, m, iszero = _unpack(bits)
    # biased f32 exponent
    e32 = _i(e) - 1023 + 127
    # subnormal: shift mantissa right so the implicit bit lands at 2^23
    # position for e32 <= 0 (extra = 1 - e32)
    extra = jnp.maximum(1 - e32, 0)
    mj = _jam_shift(m, _u(extra))
    e32 = jnp.where(extra > 0, 0, e32)
    kept = mj >> jnp.uint64(29)
    rb = mj & jnp.uint64((1 << 29) - 1)
    rnd = (rb & jnp.uint64(1 << 28)) != 0
    sticky = (rb & jnp.uint64((1 << 28) - 1)) != 0
    inc = rnd & (sticky | (kept & jnp.uint64(1)).astype(bool))
    kept = kept + inc.astype(jnp.uint64)
    # carry: normal 2^24 -> renormalize; subnormal carry to 2^23 is a
    # normal with e32=1 — both handled by integer addition layout below
    carry = kept == jnp.uint64(1 << 24)
    kept = jnp.where(carry, jnp.uint64(1 << 23), kept)
    e32 = e32 + carry.astype(jnp.int32)
    is_norm = e32 > 0
    frac = jnp.where(is_norm, kept & jnp.uint64((1 << 23) - 1), kept)
    out = (s.astype(jnp.uint32) << jnp.uint32(31)) \
        | (_u(jnp.where(is_norm, e32, 0)).astype(jnp.uint32)
           << jnp.uint32(23)) \
        | frac.astype(jnp.uint32)
    out = jnp.where(iszero, s.astype(jnp.uint32) << jnp.uint32(31), out)
    return out.astype(jnp.int32)


def f64_sqrt(a):
    """sqrt(a) with RNE, a >= 0 normal or zero (the exact-scan path feeds
    r^2 = fl(fl(X*X) + fl(Y*Y)) >= 0). Matches IEEE-754 (and therefore
    x86 sqrtsd / C sqrt) bit-for-bit: sqrt is one of the correctly-rounded
    required operations, so hardware leaves no latitude.

    Method: reduce to the 106-bit integer square root y = isqrt(N),
    N = m2 << 52 with m2 the mantissa at even exponent. Two f32-estimated
    Newton stages (a variable u64 `//` is forbidden on TPU — see
    _div_chunk) leave |y - isqrt(N)| <~ 12; the exact floor is restored by
    16 where-steps on the residual D = y^2 - N, which fits int64 because
    y is already near sqrt(N): with y1 = z*2^26 + dy,
    D = (z*dy - e_z*2^25)*2^27 + dy^2 where every term is small. RNE needs
    no tie handling (a 106-bit square has no .5 fraction)."""
    s, e, m, iszero = _unpack(a)
    E = _i(e) - 1075                          # value = m * 2^E
    odd = (E & 1) != 0
    m2 = jnp.where(odd, m << jnp.uint64(1), m)      # [2^52, 2^54)
    E2 = jnp.where(odd, E - 1, E)                   # even

    # stage 1: z = floor(sqrt(m2)), z in [2^26, 2^27)
    m2f = m2.astype(jnp.float32)
    z = jnp.sqrt(m2f).astype(jnp.int64)             # |err| <~ 2^4
    z = jnp.maximum(z, jnp.int64(1))
    e_z0 = _i(m2) - z * z                           # fits: |.| < 2^33
    dzf = e_z0.astype(jnp.float32) / (2.0 * z.astype(jnp.float32))
    z = z + dzf.astype(jnp.int64)
    for _ in range(4):                              # exact floor on z
        too_big = z * z > _i(m2)
        z = jnp.where(too_big, z - 1, z)
    for _ in range(4):
        nxt = (z + 1) * (z + 1)
        low = nxt <= _i(m2)
        z = jnp.where(low, z + 1, z)
    e_z = _i(m2) - z * z                            # in [0, 2z]

    # stage 2: y = z*2^26 + dy, dy ~ e_z*2^25/z
    num = e_z << jnp.int64(25)                      # <= 2^53
    dyf = num.astype(jnp.float32) / z.astype(jnp.float32)
    dy = dyf.astype(jnp.int64)
    # residual D = y^2 - N = (z*dy - e_z*2^25)*2^27 + dy^2 (all int64)
    A = z * dy - num
    D = (A << jnp.int64(27)) + dy * dy
    y = (z << jnp.int64(26)) + dy
    for _ in range(16):                             # exact floor on y
        too_big = D > 0
        D = jnp.where(too_big, D - 2 * y + 1, D)
        y = jnp.where(too_big, y - 1, y)
    for _ in range(16):
        Dn = D + 2 * y + 1
        low = Dn <= 0
        D = jnp.where(low, Dn, D)
        y = jnp.where(low, y + 1, y)
    # RNE: frac > 0.5  <=>  N - y^2 > y  <=>  -D > y (ties impossible)
    inc = (-D) > y
    kept = _u(y) + inc.astype(jnp.uint64)
    carry = kept == jnp.uint64(1 << 53)
    kept = jnp.where(carry, jnp.uint64(1 << 52), kept)
    eo = (E2 >> 1) - 26 + 1075 + carry.astype(jnp.int64)
    out = _pack(jnp.uint64(0) * kept, _u(eo), kept)
    return jnp.where(iszero, _zero(jnp.uint64(0)), out)


def f64_ord(bits):
    """Monotone map f64 bits -> SIGNED int64 total order (-inf..+inf
    ascending under ordinary int64 comparison): non-negative floats map
    to their own bits (in [0, 2^63)), negatives to ~bits with the top
    bit flipped (in [-2^63, -1]). -0 orders one below +0 — callers
    treating them as equal must canonicalize."""
    u = _u(bits)
    neg = (u >> jnp.uint64(63)) != 0
    return jnp.where(neg, _i(~u ^ jnp.uint64(1 << 63)), _i(u))


def f32_div_small_int(num_f32, den_i32):
    """Correctly-rounded float32 num / den for INTEGER den with odd part
    <= 15 (den in {1..32} covers the adaptive-mean weight sums, whose
    weights are exactly {0, 2, 4} — a consequence of the reference's
    broken SSE abs-mask, see post._ref_absmask). Matches x86 divss
    bit-for-bit; the TPU's native f32 divide is 2 ulp off, and this
    division is the LAST non-bit-exact op in the ELAS postprocess tail.

    Pure int32 lane ops (usable outside x64 tracing): the quotient
    mantissa is an exact integer division of the (normalized, shifted)
    numerator mantissa by the divisor's odd part — selected from the 8
    possible odd constants so XLA lowers each to a multiply-shift, never
    a variable integer division (bit-serial on TPU). Handles subnormal
    numerators and subnormal results; den must be >= 1.
    """
    b = jax.lax.bitcast_convert_type(
        jnp.asarray(num_f32, jnp.float32), jnp.int32)
    den = jnp.asarray(den_i32, jnp.int32)
    sign = b & jnp.int32(-0x80000000)
    e = (b >> 23) & 0xFF
    frac = b & 0x7FFFFF
    iszero = (b & 0x7FFFFFFF) == 0
    # normalize (subnormals: implicit bit absent, exponent acts as 1)
    m = jnp.where(e == 0, frac, frac | (1 << 23))
    e_eff = jnp.where(e == 0, 1, e)
    for k in (16, 8, 4, 2, 1):
        c = (e == 0) & (m < (1 << (24 - k)))
        m = jnp.where(c, m << k, m)
        e_eff = e_eff - k * c.astype(jnp.int32)

    # den = c_odd << kz
    low = den & -den
    kz = jnp.int32(0)
    for k in (5, 4, 3, 2, 1):
        c = (low >> k) != 0
        kz = kz + k * c.astype(jnp.int32)
        low = jnp.where(c, low >> k, low)
    c_odd = den >> kz                       # in {1, 3, 5, ..., 15}

    # q = floor(m << (B + 1) / c_odd) in [2^24, 2^26), B = bitlen(c_odd)
    q = jnp.zeros_like(m)
    r = jnp.zeros_like(m)
    for cc in (1, 3, 5, 7, 9, 11, 13, 15):
        Bb = cc.bit_length()
        ni = m << (Bb + 1)                  # <= 2^24 << 5 < 2^31
        qq = ni // cc                       # constant divisor: mul-shift
        sel = c_odd == cc
        q = jnp.where(sel, qq, q)
        r = jnp.where(sel, ni - qq * cc, r)
    Bl = jnp.zeros_like(m)
    for cc in (3, 5, 9):                    # bitlen thresholds 2, 3, 4
        Bl = Bl + (c_odd >= cc).astype(jnp.int32)
    Bl = Bl + 1                             # bitlen(c_odd)

    hi = q >= (1 << 25)
    kept = jnp.where(hi, q >> 2, q >> 1)
    rnd = jnp.where(hi, (q >> 1) & 1, q & 1).astype(bool)
    sticky = jnp.where(hi, (q & 1) != 0, False) | (r != 0)
    eo = e_eff - kz - Bl + hi.astype(jnp.int32)
    # subnormal output: shift mantissa right before rounding
    extra = jnp.maximum(1 - eo, 0)
    extra_c = jnp.minimum(extra, 31)
    lost = (kept & ((jnp.int32(1) << extra_c) - 1)) != 0
    kshift = kept >> extra_c
    sticky = sticky | jnp.where(extra > 0, rnd | lost, False)
    rnd = jnp.where(extra > 0,
                    ((kept >> jnp.maximum(extra_c - 1, 0)) & 1) != 0,
                    rnd)
    # recompute lost/rnd consistently for the subnormal path: round bit is
    # the last bit shifted out, sticky collects everything below it
    rb_pos = jnp.maximum(extra_c - 1, 0)
    rnd_sub = ((kept >> rb_pos) & 1) != 0
    lost_below = (kept & ((jnp.int32(1) << rb_pos) - 1)) != 0
    rnd = jnp.where(extra > 0, rnd_sub, rnd)
    sticky = jnp.where(extra > 0,
                       jnp.where(extra_c > 0, lost_below, False)
                       | jnp.where(hi, (q & 1) != 0, False) | (r != 0),
                       sticky)
    kept = jnp.where(extra > 0, kshift, kept)
    eo = jnp.where(extra > 0, 0, eo)

    inc = rnd & (sticky | ((kept & 1) == 1))
    kept = kept + inc.astype(jnp.int32)
    carry = kept == (1 << 24)
    kept = jnp.where(carry, jnp.int32(1 << 23), kept)
    eo = eo + carry.astype(jnp.int32)
    norm = (kept & (1 << 23)) != 0
    out = sign | jnp.where(norm, (eo << 23) | (kept & 0x7FFFFF),
                           kept)            # subnormal: eo == 0 field
    out = jnp.where(iszero, sign, out)
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def f32_div_int(num, den):
    """Correctly-rounded float32 quotient of two integers, as f32 values.

    Replicates x86 divss on exact small-int operands (|num|,|den| < 2^24,
    den != 0) without the TPU's 2-ulp native divide: 26 exact quotient
    bits via f32-estimated, integer-corrected long division, then RNE. Used for the triangle line slopes
    (device_prior.prior_coeff_wire ships these from host; the device path
    computes them in place)."""
    n = _i(num)
    d = _i(den)
    s = ((n < 0) ^ (d < 0)).astype(jnp.uint32)
    na = _u(jnp.abs(n))
    da = _u(jnp.abs(d))
    iszero = na == 0

    # scale numerator so the quotient has 26-27 bits:
    # q = floor(na*2^k / da), k = 26 - bitlen(na) + bitlen(da)
    # (k in [3, 49] in the domain; na << k < 2^(26 + bitlen(da)) <= 2^50)
    _, lzn = _norm_to_62(jnp.maximum(na, jnp.uint64(1)))
    _, lzd = _norm_to_62(jnp.maximum(da, jnp.uint64(1)))
    k = _i(lzn) - _i(lzd) + 26            # bitlen(x) = 63 - lz
    k = jnp.maximum(k, 0)
    scaled = na << _u(k)
    # q = scaled // da in two f32-estimated stages (see _div_chunk for why
    # a variable u64 `//` is forbidden on TPU). q < 2^27, so the first
    # estimate's absolute error is < 2^27 * (2*2^-24 + 2*2^-23) + 1 < 49;
    # the second stage divides the |residual| < 49*da remainder, leaving
    # error < 2 for the exact where-corrections.
    daf = da.astype(jnp.float32)
    dai = _i(da)
    q = _i(scaled.astype(jnp.float32) / daf)
    r = _i(scaled) - q * dai
    q = q + _i(r.astype(jnp.float32) / daf)
    r = _i(scaled) - q * dai
    for _ in range(2):
        neg = r < 0
        q = jnp.where(neg, q - 1, q)
        r = jnp.where(neg, r + dai, r)
    for _ in range(2):
        big = r >= dai
        q = jnp.where(big, q + 1, q)
        r = jnp.where(big, r - dai, r)
    q = _u(q)
    r = _u(r)
    # q in [2^25, 2^27): v = n/d = (q + r/d) * 2^-k
    hi = q >= jnp.uint64(1 << 26)
    # hi: kept = q >> 3, E = 26 - k; lo: kept = q >> 2, E = 25 - k
    kept = jnp.where(hi, q >> jnp.uint64(3), q >> jnp.uint64(2))
    rnd = jnp.where(hi, (q & jnp.uint64(4)) != 0, (q & jnp.uint64(2)) != 0)
    sticky = jnp.where(hi, (q & jnp.uint64(3)) != 0,
                       (q & jnp.uint64(1)) != 0) | (r != 0)
    e = jnp.where(hi, 153, 152) - k       # biased f32 exponent E + 127
    inc = rnd & (sticky | (kept & jnp.uint64(1)).astype(bool))
    kept = kept + inc.astype(jnp.uint64)
    carry = kept == jnp.uint64(1 << 24)
    kept = jnp.where(carry, jnp.uint64(1 << 23), kept)
    e = e + carry.astype(jnp.int32)
    bits = (s << jnp.uint32(31)) \
        | (_u(e).astype(jnp.uint32) << jnp.uint32(23)) \
        | (kept & jnp.uint64((1 << 23) - 1)).astype(jnp.uint32)
    bits = jnp.where(iszero, s << jnp.uint32(31), bits)
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32),
                                        jnp.float32)
