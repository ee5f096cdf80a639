"""Gather-free per-pixel row lookups for TPU.

``arr[v, u + sign*s[v,u]]`` with a bounded shift ``s`` is a per-pixel gather
— the single slowest primitive on TPU. When the shift bound is small and
static (disparity lookups: s in [0, disp_max]), the lookup is cheaper as a
shift-and-select sweep: for each k, a dynamic_slice of a padded copy plus a
``where(s == k, ...)`` select. All VPU, no gathers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("smax", "sign", "unroll"))
def shifted_row_lookup(
    arr: jnp.ndarray, s: jnp.ndarray, smax: int, sign: int = -1,
    fill: float = -1e9, unroll: int = 8,
) -> jnp.ndarray:
    """out[..., v, u] = arr[..., v, u + sign*s[..., v, u]].

    s: int32 in [0, smax]; out-of-image lookups return ``fill`` (callers
    mask them). Works on [H, W] or batched [..., H, W].
    """
    W = arr.shape[-1]
    pad = [(0, 0)] * (arr.ndim - 1) + [(smax, smax)]
    ap = jnp.pad(arr, pad, constant_values=fill)

    def body(k, out):
        shifted = jax.lax.dynamic_slice_in_dim(
            ap, smax + sign * k, W, axis=-1)
        return jnp.where(s == k, shifted, out)

    # derive the init from the operands (not jnp.full): under shard_map a
    # fresh constant is replicated, which trips the loop-carry varying-
    # manual-axes check when arr/s vary over a mesh axis
    init = (arr * 0 + (s * 0).astype(arr.dtype)) + jnp.asarray(
        fill, arr.dtype)
    return jax.lax.fori_loop(0, smax + 1, body, init, unroll=unroll)
