"""Split the remaining ELAS device stages: descriptor vs support kernel
(the 'front' dispatch) and softfloat coeffs+grids vs slab raster."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.ops.descriptor import create_descriptor
    from jackal_tpu.ops.pallas.support_kernel import support_candidates_pallas

    B, H, W = 4, 480, 640
    CH = 4
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

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "sum")]
        float(sum(l.sum().astype(jnp.float32) for l in leaves))

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
        print(f"{label:28s} {best*1000:8.2f} ms  ({best*1000/B:6.2f} "
              f"ms/frame)", flush=True)
        return out

    desc = jax.jit(lambda a, b: (
        jax.vmap(lambda x: create_descriptor(x, False))(a),
        jax.vmap(lambda x: create_descriptor(x, False))(b)))
    d1d2 = bench("descriptor x2", lambda: desc(lb, rb))
    d1, d2 = d1d2

    sup = jax.jit(lambda a, b: support_candidates_pallas(a, b, params))
    bench("support kernel", lambda: sup(d1, d2))
    bench("front fused", lambda: P._front(lb, rb, static))

    # host wire for one chunk
    dcan = np.asarray(P._front(lb, rb, static)[2])
    wires = [P._prior_tri_job(dcan[b], params, W, H, True) for b in range(B)]
    Np, Tp, Ts = P._chunk_pads(wires)
    flat = jnp.asarray(P._flatten_chunk_wire(wires, Np, Tp, Ts))
    print(f"  Np={Np} Tp={Tp} Ts={Ts}", flush=True)

    key = (CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    P._raster_chunk(flat, CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    coeff_jit, mul_jit, add_jit, fused_jit = P._RASTER_JITS[key]

    def coeffs():
        with jax.enable_x64(True):
            return coeff_jit(flat)
    s1, s2 = bench("coeffs+grids (softfloat)", coeffs)
    bench("slab raster (fused)", lambda: fused_jit(s1, s2))
    bench("raster_chunk total", lambda: P._raster_chunk(
        flat, CH, Np, Tp, Ts, gh, gw, Db, W, H, gs))


if __name__ == "__main__":
    main()
