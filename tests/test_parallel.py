"""Multi-chip sharding: TP matcher exactness and DP step equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jackal_tpu.config import BMParams
from jackal_tpu.matching.bm import bm_match
from jackal_tpu.parallel.mesh import bm_match_tp, dp_sharded_step, make_mesh
from jackal_tpu.pipeline.default import make_pipeline


@pytest.mark.parametrize("disp_parallel", [2, 4, 8])
def test_tp_bm_exact_vs_single_device(disp_parallel):
    """TP output must equal the FULL single-device bm_match — finalized
    left map (texture gate + L/R consistency) and right map included."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g = np.load("tests/fixtures/elas_golden_s320_flat.npz")
    l = g["left"][:96, :320]
    r = g["right"][:96, :320]
    prm = BMParams(disp_num=32)
    mesh = make_mesh(8, disp_parallel=disp_parallel)
    tp = bm_match_tp(mesh, prm)
    B = 8 // disp_parallel
    dl_tp, dr_tp = tp(np.stack([l] * B), np.stack([r] * B))
    dl_ref, dr_ref = bm_match(jnp.asarray(l), jnp.asarray(r), prm)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(dl_tp)[b],
                                      np.asarray(dl_ref))
        np.testing.assert_array_equal(np.asarray(dr_tp)[b],
                                      np.asarray(dr_ref))


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
