"""Multi-chip sharding: TP matcher exactness and DP step equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jackal_tpu.config import BMParams
from jackal_tpu.matching.bm import _box_filter
from jackal_tpu.parallel.mesh import bm_match_tp, dp_sharded_step, make_mesh
from jackal_tpu.pipeline.default import make_pipeline


def _wta_spec(l, r, prm):
    """Single-device pre-LR WTA disparity (the TP contract)."""
    L = jnp.asarray(l).astype(jnp.int32)
    R = jnp.asarray(r).astype(jnp.int32)
    W = l.shape[1]
    D = prm.disp_num
    rr = prm.window // 2
    u = jnp.arange(W)
    R_pad = jnp.pad(R, ((0, 0), (D, 0)))

    def body(d, _):
        sh = jax.lax.dynamic_slice_in_dim(R_pad, D - d, W, axis=1)
        c = _box_filter(jnp.abs(L - sh), rr)
        return d + 1, jnp.where((u - d >= 0)[None, :], c, jnp.int32(1 << 24))

    _, costs = jax.lax.scan(body, 0, None, length=D)
    bd = jnp.argmin(costs, 0).astype(jnp.int32)
    b = jnp.min(costs, 0)
    ds = jnp.arange(D)[:, None, None]
    sec = jnp.min(jnp.where(jnp.abs(ds - bd[None]) <= 1,
                            jnp.int32(1 << 24), costs), 0)
    cm = jnp.min(jnp.where(ds == bd[None] - 1, costs, jnp.int32(1 << 24)), 0)
    cp = jnp.min(jnp.where(ds == bd[None] + 1, costs, jnp.int32(1 << 24)), 0)
    uniq = b.astype(jnp.float32) < prm.uniqueness * sec.astype(jnp.float32)
    den = cm + cp - 2 * b
    offs = jnp.where(
        (bd > 0) & (bd < D - 1) & (den > 0),
        (cm - cp).astype(jnp.float32) / (2.0 * den.astype(jnp.float32)), 0.0)
    return np.asarray(jnp.where(uniq, bd.astype(jnp.float32) + offs, -1.0))


@pytest.mark.parametrize("disp_parallel", [2, 4, 8])
def test_tp_bm_exact_vs_single_device(disp_parallel):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    l = g["left"][:96, :320]
    r = g["right"][:96, :320]
    prm = BMParams(disp_num=32)
    mesh = make_mesh(8, disp_parallel=disp_parallel)
    tp = bm_match_tp(mesh, prm)
    B = 8 // disp_parallel
    d_tp = np.asarray(tp(np.stack([l] * B), np.stack([r] * B)))
    ref = _wta_spec(l, r, prm)
    for b in range(B):
        np.testing.assert_allclose(d_tp[b], ref, atol=1e-5)


def test_dp_step_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    pipe = make_pipeline(None, "bm")
    mesh = make_mesh(8, disp_parallel=1)
    step = dp_sharded_step(pipe, mesh)
    rng = np.random.default_rng(0)
    lb = (rng.random((8, 360, 640)) * 255).astype(np.uint8)
    rb = (rng.random((8, 360, 640)) * 255).astype(np.uint8)
    dm_sh, closest = step(lb, rb)
    dm, scans = pipe.process_batch_fused(lb, rb)
    np.testing.assert_array_equal(np.asarray(dm_sh), np.asarray(dm))
    np.testing.assert_allclose(float(closest), float(np.asarray(scans.scan).min()))
