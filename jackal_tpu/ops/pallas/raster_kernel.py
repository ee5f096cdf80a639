"""Pallas slab-raster kernel for the ELAS device prior.

Replaces the XLA slab raster (matching/elas/device_prior._slab_raster_impl)
on TPU. The XLA form materializes a [CH*S*C, Ts, slab, CT] packed-key
tensor and max-reduces over Ts — measured reduce/relayout-bound (~2.6 ms
of its ~5.8 ms per 4-frame chunk goes to the Ts reduce alone, plus a
[CH,S,C,slab,CT] transpose and 8 coefficient gathers). This kernel keeps
the winner keys in VMEM and writes image-layout rows directly:

  - grid (CH, S, Tch): one program per (frame, 16-row band, 16-triangle
    chunk). The output block [1, 1, slab, Wp] keeps the same index over
    Tch steps, so winner accumulation is VMEM-resident read-modify-max;
  - per-triangle coefficients arrive as an SMEM *identity table*: the
    host->device sel indices are pre-gathered OUTSIDE the kernel (one
    flat XLA take) into [CH, S, C*Ts, 16] i32, so entry (c, t) of a band
    is row c*Ts + t — no dynamic table indexing beyond the row id, no
    in-kernel gathers;
  - the t-loop is STATIC 16-wide (a dynamic-bound fori with SMEM scalar
    reads measured ~4 us/iteration — the scalar loop serializes the
    VPU); a per-(c, chunk) scalar pl.when skips chunks past the tile's
    live count, so work tracks actual per-tile triangle counts instead
    of the padded Ts;
  - padded sel slots point at the degenerate triangle row (equal
    corners -> empty column span) and carry paint -1, so they contribute
    only -1 keys — bit-safe without masking.

Float semantics are the XLA raster's exactly (docstrings there): f32
multiply and add as separate RNE ops (no FMA on the TPU VPU), C trunc,
uint32 wrap of negative scanline bounds (emulated with an int32
sign-flip compare: Mosaic's u32 min/max support is spotty), winner key
(paint << 11) | (trunc(f)+512) << 1 | pvalid. Outputs are asserted
bit-identical to the XLA raster in tests/test_device_prior.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TCH = 16          # triangles per grid chunk (static unroll)
_XOR = np.int32(-0x80000000)   # python-level constant: a module-level jnp
#   array would be captured as a kernel constant, which pallas_call rejects


def _umin(a, b):
    """uint32 minimum on int32 carriers (bit patterns): flipping the sign
    bit maps unsigned order onto signed order."""
    return jnp.minimum(a ^ _XOR, b ^ _XOR) ^ _XOR


def _umax(a, b):
    return jnp.maximum(a ^ _XOR, b ^ _XOR) ^ _XOR


def _raster_kernel(cnt_ref, tab_ref, out_ref, *, C, Ts, slab, W, H, CT):
    ch = pl.program_id(2)

    @pl.when(ch == 0)
    def _init():
        out_ref[0, 0] = jnp.full_like(out_ref[0, 0], -1)

    col128 = jax.lax.broadcasted_iota(jnp.int32, (slab, CT), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (slab, CT), 0) \
        + pl.program_id(1) * slab
    rows_f = rows.astype(jnp.float32)

    for c in range(C):
        @pl.when(ch * _TCH < cnt_ref[0, 0, 0, c])
        def _chunk(c=c):
            u_i = col128 + c * CT
            u_f = u_i.astype(jnp.float32)
            acc = jnp.full((slab, CT), -1, jnp.int32)
            for i in range(_TCH):
                r = c * Ts + ch * _TCH + i
                A_u = tab_ref[0, 0, r, 0]
                B_u = tab_ref[0, 0, r, 1]
                C_u = tab_ref[0, 0, r, 2]
                A_v = tab_ref[0, 0, r, 3]
                B_v = tab_ref[0, 0, r, 4]

                def fbits(k):
                    # Mosaic has no SCALAR bitcast: route through a [1,1]
                    # vector (broadcasts against [slab, CT] downstream)
                    v = jnp.full((1, 1), tab_ref[0, 0, r, k], jnp.int32)
                    return jax.lax.bitcast_convert_type(v, jnp.float32)

                s_ac = fbits(5)
                s_ab = fbits(6)
                s_bc = fbits(7)
                pa = fbits(8)
                pb = fbits(9)
                pc = fbits(10)
                pv = tab_ref[0, 0, r, 11]
                paint = tab_ref[0, 0, r, 12]

                A_u_f = jnp.full((1, 1), A_u, jnp.int32) \
                    .astype(jnp.float32)             # exact small ints
                B_u_f = jnp.full((1, 1), B_u, jnp.int32) \
                    .astype(jnp.float32)
                A_v_f = jnp.full((1, 1), A_v, jnp.int32) \
                    .astype(jnp.float32)
                B_v_f = jnp.full((1, 1), B_v, jnp.int32) \
                    .astype(jnp.float32)
                # line intercepts: same two-op rounding as the XLA form
                b_ac = A_v_f - s_ac * A_u_f
                b_ab = A_v_f - s_ab * A_u_f
                b_bc = B_v_f - s_bc * B_u_f
                v1 = (s_ac * u_f + b_ac).astype(jnp.int32)   # u32 wrap via
                seg1 = (u_i >= A_u) & (u_i < B_u)            # sign-flip cmp
                v2 = jnp.where(seg1,
                               (s_ab * u_f + b_ab).astype(jnp.int32),
                               (s_bc * u_f + b_bc).astype(jnp.int32))
                lo = _umin(_umin(v1, v2), jnp.broadcast_to(
                    jnp.int32(H), v1.shape))
                hi = _umin(_umax(v1, v2), jnp.broadcast_to(
                    jnp.int32(H), v1.shape))
                cover = (u_i >= A_u) & (u_i < C_u)
                lo = jnp.where(cover, lo, 0)
                hi = jnp.where(cover, hi, 0)

                f = (pa * u_f + pb * rows_f) + pc
                dt = jnp.clip(f.astype(jnp.int32), -512, 511)
                key = (paint << 11) | ((dt + 512) << 1) | pv
                covered = (rows >= lo) & (rows < hi)
                key = jnp.where(covered & (paint >= 0), key, -1)
                acc = jnp.maximum(acc, key)
            cur = out_ref[0, 0, :, c * CT:(c + 1) * CT]
            out_ref[0, 0, :, c * CT:(c + 1) * CT] = jnp.maximum(cur, acc)


@functools.partial(jax.jit, static_argnames=("CH", "S", "C", "Ts", "slab",
                                             "W", "H", "CT"))
def raster_pallas(cnt, tab, *, CH, S, C, Ts, slab, W, H, CT=128):
    """cnt [CH, S, 1, C] i32 live counts; tab [CH, S, C*Ts, 16] i32
    identity coefficient table (rows: A_u, B_u, C_u, A_v, B_v, slope_bits
    x3, plane_bits x3, pvalid, paint, pad x3). Returns the winner key map
    [CH, H, W] i32 (decode with decode_win)."""
    Wp = C * CT
    n_tch = -(-Ts // _TCH)
    kern = functools.partial(_raster_kernel, C=C, Ts=Ts, slab=slab, W=W,
                             H=H, CT=CT)
    win = pl.pallas_call(
        kern,
        grid=(CH, S, n_tch),
        in_specs=[
            pl.BlockSpec((1, 1, 1, C), lambda b, s, t: (b, s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C * Ts, 16), lambda b, s, t: (b, s, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, slab, Wp), lambda b, s, t: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CH, S, slab, Wp), jnp.int32),
    )(cnt, tab)
    return win.reshape(CH, S * slab, Wp)[:, :H, :W]


def decode_win(win):
    """Winner key map -> (d_plane i16, valid, covered), identical to the
    XLA raster's decode (device_prior._slab_raster_impl tail)."""
    covered = win >= 0
    dp = (((win >> 1) & 1023) - 512).astype(jnp.int16)
    dp = jnp.where(covered, dp, 0)
    valid = covered & ((win & 1) == 1)
    return dp, valid, covered


def pack_table(cu, cv, sbits, pbits, pvalid, paint, sel_flat,
               CH, S, C, Ts):
    """Gather per-triangle coefficients into the kernel's identity table:
    ONE flat take over the [CH*Tp]-row arrays (sel_flat [CH*S*C*Ts] with
    frame offsets already applied), padded to 16 lanes."""
    packed = jnp.concatenate([
        cu.astype(jnp.int32), cv.astype(jnp.int32),
        sbits.astype(jnp.int32), pbits.astype(jnp.int32),
        pvalid.astype(jnp.int32)[:, None],
        paint.astype(jnp.int32)[:, None],
        jnp.zeros((cu.shape[0], 3), jnp.int32),
    ], axis=1)                                      # [CH*Tp, 16]
    tab = jnp.take(packed, sel_flat, axis=0)        # [R, 16]
    return tab.reshape(CH, S, C * Ts, 16)
