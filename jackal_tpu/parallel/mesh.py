"""Multi-chip scale-out: device mesh, sharded pipeline steps, TP matcher.

The reference's "distributed backend" is ROS pub/sub between two machines
(SURVEY §2.4); the TPU-native equivalent is jax.sharding over an ICI mesh:

  - DP axis 'data': stereo-frame batches sharded across chips — the main
    scale-out axis (each chip runs the fused rect->match->scan step on its
    shard; zero collectives needed in steady state).
  - TP axis 'disp': the disparity dimension of the block-matching cost
    volume sharded across chips; WTA/uniqueness/sub-pixel combine with
    keyed pmin collectives. This is the survey's "optional sharding of the
    cost volume across the disparity axis".

Everything compiles with N virtual CPU devices
(xla_force_host_platform_device_count) — no TPU pod required to validate.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import BMParams
from ..matching.bm import _box_filter


def _invalid_cost(D: int) -> int:
    """Invalid-cost sentinel. Matches the single-device engine's 1<<24
    whenever the keyed pmin (cost*D + d) fits int32 (D <= 64); larger D
    clamps lower (affects only the already-invalid left band)."""
    return min(1 << 24, (1 << 30) // D - 1)


def make_mesh(n_devices: Optional[int] = None,
              disp_parallel: int = 1) -> Mesh:
    """2D mesh ('data', 'disp'). disp_parallel=1 -> pure DP."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % disp_parallel:
        raise ValueError(f"{n} devices not divisible by disp={disp_parallel}")
    arr = np.array(devs).reshape(n // disp_parallel, disp_parallel)
    return Mesh(arr, ("data", "disp"))


def dp_sharded_step(pipeline, mesh: Mesh):
    """Jit the fused batched pipeline step (any fused engine: BM or SGM)
    with the batch sharded over 'data' (and replicated over 'disp').
    Returns a callable taking [B, H, W] uint8 raw stereo batches and
    producing the NODE contract sharded the same way: per-frame disparity
    maps AND per-frame obstacle-scan vectors (the payload navigate
    consumes), plus a scalar closest-obstacle summary riding an ICI
    all-reduce."""
    bspec = NamedSharding(mesh, P("data", None, None))
    # one leading-'data' spec serves every scan leaf ([B, bins] and [B])
    sspec = NamedSharding(mesh, P("data"))

    @partial(jax.jit, in_shardings=(bspec, bspec))
    def step(left_b, right_b):
        dmaps, scans = pipeline.process_batch_fused(left_b, right_b)
        dmaps = jax.lax.with_sharding_constraint(dmaps, bspec)
        scans = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sspec), scans)
        # tiny global summary rides an ICI all-reduce: closest obstacle
        closest = jnp.min(scans.scan)
        return dmaps, scans, closest

    return step


# ---------------------------------------------------------------------------
# tensor-parallel block matching: disparity axis sharded over 'disp'
# ---------------------------------------------------------------------------

def _tp_wta(costs, local_d, D, params, axis):
    """Global WTA over the disparity-sharded volume via keyed pmin.

    costs holds the single-device engine's 1<<24 in-volume sentinel so the
    combined best/second/neighbor COSTS are bit-identical to bm_match's wta
    (the key sentinel is clamped separately to avoid int32 overflow)."""
    BIGV = jnp.int32(1 << 24)                 # in-volume sentinel (bm.py)
    KCLAMP = jnp.int32(_invalid_cost(D))      # key-safe sentinel
    keys = jnp.minimum(costs, KCLAMP) * D + local_d[:, None, None]
    best_key = jax.lax.pmin(jnp.min(keys, axis=0), axis)
    best_d = best_key % D
    # best COST read back from the unclamped volume (not key // D, whose
    # sentinel value differs): exactly one shard holds best_d
    def at_d(dq):
        hit = local_d[:, None, None] == dq[None]
        return jax.lax.pmin(
            jnp.min(jnp.where(hit, costs, BIGV), axis=0), axis)

    best_c = at_d(best_d)
    far = jnp.abs(local_d[:, None, None] - best_d[None]) > 1
    second = jax.lax.pmin(
        jnp.min(jnp.where(far, costs, BIGV), axis=0), axis)
    # neighbor costs: out-of-range d yields the 1<<24 sentinel, matching
    # bm_match's masked min over ds == best_d -/+ 1
    cm = at_d(best_d - 1)
    cp = at_d(best_d + 1)

    unique = best_c.astype(jnp.float32) < params.uniqueness * \
        second.astype(jnp.float32)
    den = cm + cp - 2 * best_c
    offs = jnp.where(
        (best_d > 0) & (best_d < D - 1) & (den > 0),
        (cm - cp).astype(jnp.float32) / (2.0 * den.astype(jnp.float32)),
        0.0)
    return jnp.where(unique, best_d.astype(jnp.float32) + offs, -1.0)


def _bm_tp_shard(left, right, params: BMParams, axis: str):
    """Per-shard body: this shard's disparity slice of the cost volume,
    dual (left+right) WTA with keyed pmin collectives, then the exact
    bm_finalize (texture gate + L/R consistency) on the replicated maps —
    output equals the single-device bm_match bit for bit."""
    H, W = left.shape
    D = params.disp_num
    nsh = jax.lax.axis_size(axis)
    Dl = D // nsh
    d0 = jax.lax.axis_index(axis) * Dl
    r = params.window // 2
    L = left.astype(jnp.int32)
    R = right.astype(jnp.int32)
    u = jnp.arange(W)

    BIGV = jnp.int32(1 << 24)
    # zero-pad shift exactly like the single-device engine: the box filter
    # at valid pixels near the u<d band reads the same AD values
    R_pad = jnp.pad(R, ((0, 0), (D, 0)))

    def cost_at(d):
        shifted = jax.lax.dynamic_slice_in_dim(R_pad, D - d, W, axis=1)
        ad = jnp.abs(L - shifted)
        c = _box_filter(ad, r)
        return jnp.where((u - d >= 0)[None, :], c, BIGV)

    local_d = jnp.arange(Dl) + d0
    costs = jax.vmap(cost_at)(local_d)            # [Dl, H, W]
    dL = _tp_wta(costs, local_d, D, params, axis)

    # right volume from the same slices: cost_R(u, d) = cost_L(u+d, d)
    costs_pad = jnp.pad(costs, ((0, 0), (0, 0), (0, D)),
                        constant_values=1 << 24)

    def right_at(i):
        c = jax.lax.dynamic_slice_in_dim(
            costs_pad[i], local_d[i], W, axis=1)
        return jnp.where((u + local_d[i] < W)[None, :], c, BIGV)

    costs_r = jax.vmap(right_at)(jnp.arange(Dl))
    dR = _tp_wta(costs_r, local_d, D, params, axis)

    from ..matching.bm import bm_finalize
    return bm_finalize(left, dL, dR, params)


def bm_match_tp(mesh: Mesh, params: BMParams = BMParams()):
    """Tensor-parallel BM over the 'disp' mesh axis; batch over 'data'.

    Returns a jitted fn: ([B,H,W], [B,H,W]) -> ([B,H,W], [B,H,W]) float32
    (left finalized + right) disparities, equal to vmap(bm_match)."""

    def batched(left_b, right_b):
        return jax.vmap(
            lambda l, r: _bm_tp_shard(l, r, params, "disp"))(left_b, right_b)

    fn = shard_map(
        batched, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None)),
        out_specs=(P("data", None, None), P("data", None, None)),
    )
    return jax.jit(fn)
