"""ELAS Sobel descriptor as batched JAX integer ops.

Reproduces the reference's uint8 gradient encoding and 16-byte per-pixel
feature exactly on the interior (the SSE code leaves image borders
uninitialized; we define them deterministically as the bias value 128):

  - filter::sobel3x3 (filter.cpp:408-416): column pass [1,2,1]/[1,0,-1]
    (int16), row pass with arithmetic >>2, +128 offset, uint8 saturation
    (convolve_101/121_row_3x3_16bit, filter.cpp:176-267).
    Gradient sign convention: du(u) ~ smooth_v(u-1) - smooth_v(u+1).
  - Descriptor::createDescriptor (descriptor.cpp:42-114): 16 samples from a
    5x5 neighborhood of (du, dv) — 12 from du (center duplicated), 4 from dv.

Valid region: u in [3, W-4], v in [3, H-4] (descriptor.cpp:84,92); outside
is filled with 128 (zero gradient) so texture sums vanish there.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# (dy, dx, use_dv) sample offsets, in reference channel order
# (descriptor.cpp:94-109)
DESC_OFFSETS = (
    (-2, 0, 0),
    (-1, -2, 0),
    (-1, 0, 0),
    (-1, 2, 0),
    (0, -1, 0),
    (0, 0, 0),
    (0, 0, 0),
    (0, 1, 0),
    (1, -2, 0),
    (1, 0, 0),
    (1, 2, 0),
    (2, 0, 0),
    (-1, 0, 1),
    (0, -1, 1),
    (0, 1, 1),
    (1, 0, 1),
)


def _sat_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def sobel3x3(img_u8: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bias-128 uint8 Sobel gradients (du, dv), each [H, W].

    Interior exact vs filter::sobel3x3; 1-px border fixed to 128.
    """
    # int32 throughout: the TPU backend miscompiles fused int16
    # subtract+shift chains (wraps as unsigned); values fit i16 but i32 is
    # the safe, equally-fast choice
    im = img_u8.astype(jnp.int32)
    # column pass (convolve_cols_3x3): smooth [1,2,1] and diff [1,0,-1]
    tv = im[:-2, :] + 2 * im[1:-1, :] + im[2:, :]      # [H-2, W]
    th = im[:-2, :] - im[2:, :]
    # row pass: du = (tv[u-1]-tv[u+1])>>2 + 128 ; dv = (th[u-1]+2th[u]+th[u+1])>>2 + 128
    du_i = ((tv[:, :-2] - tv[:, 2:]) >> 2) + 128
    dv_i = ((th[:, :-2] + 2 * th[:, 1:-1] + th[:, 2:]) >> 2) + 128
    H, W = img_u8.shape
    du = jnp.full((H, W), 128, dtype=jnp.uint8)
    dv = jnp.full((H, W), 128, dtype=jnp.uint8)
    du = du.at[1:-1, 1:-1].set(_sat_u8(du_i))
    dv = dv.at[1:-1, 1:-1].set(_sat_u8(dv_i))
    return du, dv


@partial(jax.jit, static_argnames=("half_resolution",))
def create_descriptor(img_u8: jnp.ndarray,
                      half_resolution: bool = False) -> jnp.ndarray:
    """16-channel uint8 descriptor [H, W, 16].

    half_resolution=True (the ELAS subsampling path, descriptor.cpp:48-78)
    computes only even rows v in [4, H-4]; odd/outside rows are 0 (fresh
    mmap pages in the reference)."""
    du, dv = sobel3x3(img_u8)
    H, W = img_u8.shape
    # pad so shifted gathers are static slices
    dup = jnp.pad(du, 2, constant_values=128)
    dvp = jnp.pad(dv, 2, constant_values=128)
    chans = []
    for dy, dx, use_dv in DESC_OFFSETS:
        src = dvp if use_dv else dup
        chans.append(src[2 + dy:2 + dy + H, 2 + dx:2 + dx + W])
    desc = jnp.stack(chans, axis=-1)
    # valid region mask: v,u in [3, dim-4]. Outside, the reference leaves
    # I_desc as allocated; a fresh process gets zeroed mmap pages, so the
    # deterministic stand-in is 0 (verified bit-identical against the
    # instrumented reference build).
    vmask = jnp.zeros((H, W, 1), dtype=jnp.bool_)
    if half_resolution:
        rows = jnp.arange(H)
        rmask = (rows % 2 == 0) & (rows >= 4) & (rows <= H - 4)
        cmask = (jnp.arange(W) >= 3) & (jnp.arange(W) <= W - 4)
        vmask = (rmask[:, None] & cmask[None, :])[..., None]
    else:
        vmask = vmask.at[3:H - 3, 3:W - 3, :].set(True)
    return jnp.where(vmask, desc, jnp.uint8(0))


create_descriptor_batch = jax.vmap(create_descriptor)
