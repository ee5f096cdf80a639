"""Split the ELAS coeffs+grids dispatch: softfloat fit vs slopes vs grids
vs the unflatten/gather plumbing."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas.device_fit import (_fit_planes_impl,
                                                     _gj_solve3)
    from jackal_tpu.matching.elas.device_prior import (_grid_impl,
                                                       _tri_coeffs_impl)
    from jackal_tpu.ops import softfloat as sf

    B, H, W = 4, 480, 640
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(root, "tests/fixtures",
                             "elas_golden_s640_boxes.npz"))
    lb = jnp.asarray(np.broadcast_to(z["left"], (B, H, W)).copy())
    rb = jnp.asarray(np.broadcast_to(z["right"], (B, H, W)).copy())
    params = ElasParams()
    static = P._Static(params, P._use_pallas())
    gs = params.grid_size
    gh, gw = -(-H // gs), -(-W // gs)
    Db = params.disp_max + 1

    dcan = np.asarray(P._front(lb, rb, static)[2])
    wires = [P._prior_tri_job(dcan[b], params, W, H, True) for b in range(B)]
    Np, Tp, Ts = P._chunk_pads(wires)

    # flat [CH*Np,3] support and [CH*Tp,3] tri with frame offsets
    sp = np.zeros((B, Np, 3), np.int32)
    sp[:, :, 2] = -1
    tri = np.zeros((B, Tp, 3), np.int32)
    for i, w in enumerate(wires):
        sp[i, :len(w[0])] = w[0]
        tri[i, :len(w[1])] = w[1]
    sp_flat = jnp.asarray(
        (sp + (np.arange(B) * Np)[:, None, None] * 0).reshape(B * Np, 3))
    tri_flat = jnp.asarray(
        (tri + (np.arange(B) * Np)[:, None, None]).reshape(B * Tp, 3))
    sp_b = jnp.asarray(sp)

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "sum")]
        float(sum(l.astype(jnp.float32).sum() for l in leaves))

    def bench(label, fn, n=8):
        out = fn()
        sync(out)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn()
            sync(r)
            best = min(best, (time.perf_counter() - t0 - 0.025) / n)
        print(f"{label:26s} {best*1000:8.2f} ms  ({best*1000/B:6.2f} "
              f"ms/frame)", flush=True)
        return out

    def fit(s, t):
        with jax.enable_x64(True):
            return _fit_planes_impl(s, t)
    fitj = jax.jit(fit)

    def run_fit():
        with jax.enable_x64(True):
            return fitj(sp_flat, tri_flat)
    bench("softfloat fit (both sides)", run_fit)

    def coeffs_one(s, t):
        with jax.enable_x64(True):
            return partial(_tri_coeffs_impl, right=False)(s, t)
    cj = jax.jit(coeffs_one)

    def run_cj():
        with jax.enable_x64(True):
            return cj(sp_flat, tri_flat)
    bench("tri_coeffs one side", run_cj)

    def grids(s):
        with jax.enable_x64(True):
            return jax.vmap(partial(_grid_impl, right=False, gs=gs, gh=gh,
                                    gw=gw, disp_max=Db - 1))(s)
    gj = jax.jit(grids)
    bench("grids one side", lambda: gj(sp_b))

    def grids_nox64(s):
        return jax.vmap(partial(_grid_impl, right=False, gs=gs, gh=gh,
                                gw=gw, disp_max=Db - 1))(s)
    gj2 = jax.jit(grids_nox64)
    bench("grids one side (no x64)", lambda: gj2(sp_b))


if __name__ == "__main__":
    main()
