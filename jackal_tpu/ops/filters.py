"""The remaining libelas filter kernels (filter.cpp:418-467), jnp-native.

The ELAS pipeline itself only uses sobel3x3 (ops/descriptor.py); these are
the rest of the reference's L2 filter surface: sobel5x5, checkerboard5x5,
blob5x5 and the integral image they build on.

Numeric contracts reproduced from the SSE code:

  - sobel5x5 (filter.cpp:418-426): column pass [1,4,6,4,1] (smooth) /
    [1,2,0,-2,-1] (diff) into int16, then row pass [1,2,0,-2,-1] (du) /
    [1,4,6,4,1] (dv) with arithmetic >>7, +128 offset, uint8 saturation —
    the same bias-128 gradient encoding as sobel3x3 (filter.cpp:78,88).
  - checkerboard5x5 (filter.cpp:433-438): [1,1,0,-1,-1] columns then
    [1,1,0,-1,-1] rows, raw int16 (no scale/offset).
  - blob5x5 (filter.cpp:445-467): -1 outer ring, +1 inner ring, +8 center,
    evaluated as -(5x5 sum) + 2*(3x3 sum) + 7*center from the integral
    image; int16 truncation of the int32 result.

Layout quirk preserved: the SSE row passes walk the image as ONE flat
buffer, so each row's first two outputs read the previous row's tail
(wrap-around), exactly like createGrid's flat diffusion (elas.cpp:631).
The reference leaves borders uninitialized (malloc); we define them
deterministically — 128 for the bias-encoded uint8 outputs, 0 for int16 —
and define the final flat window's out-of-bounds reads as zeros. Fixture
tests compare the well-defined region against a compiled reference build.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def integral_image(img_u8: jnp.ndarray) -> jnp.ndarray:
    """Standard 2D inclusive integral image, int32 (filter.cpp:48-65)."""
    x = img_u8.astype(jnp.int32)
    return jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)


def _flat_row_conv(temp: jnp.ndarray, taps, tail_zero: int = 4
                   ) -> jnp.ndarray:
    """out[j+2] = sum_k taps[k] * temp_flat[j+k] over the FLAT buffer
    (row wrap-around), with reads past the end defined as 0. Returns the
    flat int32 result array (head j<2 left 0)."""
    flat = temp.reshape(-1)
    n = flat.shape[0]
    fp = jnp.concatenate([flat, jnp.zeros(tail_zero, flat.dtype)])
    acc = jnp.zeros(n - 2, jnp.int32)
    for k, t in enumerate(taps):
        if t:
            acc = acc + t * fp[k:k + n - 2].astype(jnp.int32)
    out = jnp.zeros(n, jnp.int32)
    return out.at[2:].set(acc)


def _col_conv(img: jnp.ndarray, taps) -> jnp.ndarray:
    """int16 column convolution writing rows [2, H-2) like the SSE column
    passes (output row = input window start + 2); other rows 0."""
    H, W = img.shape
    x = img.astype(jnp.int32)
    n = len(taps)
    acc = jnp.zeros((H - n + 1, W), jnp.int32)
    for k, t in enumerate(taps):
        if t:
            acc = acc + t * x[k:k + H - n + 1]
    out = jnp.zeros((H, W), jnp.int32)
    return out.at[2:2 + H - n + 1].set(acc)


def _sat_u8_biased(flat_i32: jnp.ndarray, shape) -> jnp.ndarray:
    v = (flat_i32 >> 7) + 128
    out = jnp.clip(v, 0, 255).astype(jnp.uint8).reshape(shape)
    return out


@jax.jit
def sobel5x5(img_u8: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bias-128 uint8 5x5 Sobel gradients (du, dv), each [H, W].

    du = [1,2,0,-2,-1] rows of the [1,4,6,4,1]-column-smoothed image;
    dv = [1,4,6,4,1] rows of the [1,2,0,-2,-1]-column-diffed image;
    both >>7 then +128, saturated (filter.cpp:418-426, 95-199)."""
    H, W = img_u8.shape
    temp_v = _col_conv(img_u8, (1, 4, 6, 4, 1))       # smooth columns
    temp_h = _col_conv(img_u8, (1, 2, 0, -2, -1))     # diff columns
    du = _sat_u8_biased(_flat_row_conv(temp_v, (1, 2, 0, -2, -1)), (H, W))
    dv = _sat_u8_biased(_flat_row_conv(temp_h, (1, 4, 6, 4, 1)), (H, W))
    # uninitialized border convention: bias value (no gradient)
    head = jnp.zeros(H * W, bool).at[:2].set(True).reshape(H, W)
    rows = jnp.arange(H)
    uninit_rows = (rows < 2) | (rows >= H - 2)
    mask = head | uninit_rows[:, None]
    du = jnp.where(mask, jnp.uint8(128), du)
    dv = jnp.where(mask, jnp.uint8(128), dv)
    return du, dv


@jax.jit
def checkerboard5x5(img_u8: jnp.ndarray) -> jnp.ndarray:
    """int16 checkerboard response (filter.cpp:428-438): [1,1,0,-1,-1]
    columns then rows; raw (unscaled)."""
    H, W = img_u8.shape
    temp = _col_conv(img_u8, (1, 1, 0, -1, -1))
    out = _flat_row_conv(temp, (1, 1, 0, -1, -1))
    rows = jnp.arange(H)
    uninit = ((rows < 2) | (rows >= H - 2))[:, None] | \
        jnp.zeros(H * W, bool).at[:2].set(True).reshape(H, W)
    return jnp.where(uninit, 0, out.reshape(H, W)).astype(jnp.int16)


@jax.jit
def blob5x5(img_u8: jnp.ndarray) -> jnp.ndarray:
    """int16 blob response (filter.cpp:440-467): -1 outer ring, +1 inner
    ring, +8 center via integral-image box sums, flat pointer walk."""
    H, W = img_u8.shape
    I = integral_image(img_u8).reshape(-1)
    x = img_u8.astype(jnp.int32).reshape(-1)
    n = H * W
    start, stop = 3 + 3 * W, n - 2 - 2 * W
    m = stop - start
    j = jnp.arange(m)                      # out flat index - start
    # flat-walk integral reads relative to out_ptr at (start + j):
    # i00 = I[j], i50 = I[j+5], i05 = I[j+5W], i55 = I[j+5+5W],
    # i11 = I[j+1+W], i41 = I[j+4+W], i14 = I[j+1+4W], i44 = I[j+4+4W]
    outer = -(I[5 + 5 * W + 0:][:m] - I[5:][:m] - I[5 * W:][:m] + I[:m])
    inner = 2 * (I[4 + 4 * W:][:m] - I[4 + W:][:m]
                 - I[1 + 4 * W:][:m] + I[1 + W:][:m])
    res = outer + inner + 7 * x[start:stop]
    out = jnp.zeros(n, jnp.int32).at[start:stop].set(res)
    return out.reshape(H, W).astype(jnp.int16)
