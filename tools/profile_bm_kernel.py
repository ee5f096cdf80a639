"""BM Pallas kernel timing/exactness sweep (TPU). Not a test."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from jackal_tpu.config import BMParams
from jackal_tpu.ops.pallas.bm_kernel import bm_match_pallas

B, H, W = 64, 480, 640
params = BMParams(disp_num=64)
rng = np.random.default_rng(0)
lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))

# exactness vs the jnp engine on a small batch (device-independent spec)
from jackal_tpu.matching.bm import bm_match, bm_texture_gate
dls, drs = jax.vmap(lambda a, b: bm_match(a, b, params))(lb[:4], rb[:4])
pls, prs = bm_match_pallas(lb[:4], rb[:4], params, tile_h=24)
pls = bm_texture_gate(lb[:4], pls, params)
ok = (np.array_equal(np.asarray(dls), np.asarray(pls)) and
      np.array_equal(np.asarray(drs), np.asarray(prs)))
print("vs jnp engine (B=4):", "exact" if ok else
      f"MISMATCH dl={np.mean(np.asarray(dls) != np.asarray(pls)):.4f} "
      f"dr={np.mean(np.asarray(drs) != np.asarray(prs)):.4f}")

ref = None
for th in (24, 40, 48, 60):
    try:
        dl, dr = bm_match_pallas(lb, rb, params, tile_h=th)
        float(dl.sum())
    except Exception as e:
        print(f"tile_h={th}: FAIL {type(e).__name__}: {str(e)[:120]}")
        continue
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [bm_match_pallas(lb, rb, params, tile_h=th) for _ in range(8)]
        float(outs[-1][0].sum() + outs[-1][1].sum())
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    if ref is None:
        ref = (np.asarray(dl), np.asarray(dr))
        tag = "(ref)"
    else:
        eq = (np.array_equal(ref[0], np.asarray(dl)) and
              np.array_equal(ref[1], np.asarray(dr)))
        tag = "exact" if eq else "MISMATCH"
    print(f"tile_h={th}: {best*1e3:8.3f} ms/batch  {tag}")
