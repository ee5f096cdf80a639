"""Breakdown of the device dense+postprocess dispatch (ELAS batch path):
dense Pallas, L/R check, speckle CC scans, segment-size scatter, tail."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas import post as PP

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

    # stage inputs
    D1o, D2o = P.elas_match_batch_device(lb, rb, params, chunk=CH)
    sync(D1o)
    d1, d2, dcan_dev = P._front(lb, rb, static)
    dcan = np.asarray(dcan_dev)
    wires = [P._prior_tri_job(dcan[b], params, W, H, True)
             for b in range(B)]
    Np, Tp, Ts = P._chunk_pads(wires)
    flat = jnp.asarray(P._flatten_chunk_wire(wires, Np, Tp, Ts))
    m1, m2, g1, g2 = P._raster_chunk(flat, CH, Np, Tp, Ts, gh, gw, Db, W, H,
                                     params.grid_size)

    def bench(label, jit_fn, *args, n=6):
        out = jit_fn(*args)
        sync(out)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = jit_fn(*args)
            sync(r)
            dt = (time.perf_counter() - t0 - 0.025) / n
            best = dt if best is None else min(best, dt)
        print(f"{label:26s} {best*1000:8.2f} ms  ({best*1000/B:6.2f} "
              f"ms/frame)")
        return jit_fn(*args)

    from jackal_tpu.ops.pallas.elas_dense_kernel import elas_dense_pallas

    def dense_only(d1, d2, m1, m2):
        mm1 = (m1[0], m1[1], m1[2], g1)
        mm2 = (m2[0], m2[1], m2[2], g2)
        A = elas_dense_pallas(d1, d2, *mm1, params, False)
        Bv = elas_dense_pallas(d1, d2, *mm2, params, True)
        return A, Bv

    dj = jax.jit(dense_only)
    D1, D2 = bench("dense (both sides)", dj, d1, d2, m1, m2)

    lr = jax.jit(jax.vmap(
        lambda a, b: PP.left_right_consistency_check(a, b, params)))
    D1c, D2c = bench("L/R check", lr, D1, D2)

    cc = jax.jit(jax.vmap(
        lambda d: PP._connected_component_labels(
            d, params.speckle_sim_threshold)))
    lbl = bench("speckle CC scans", cc, D1c)

    def sizes_fn(D, lbl):
        def one(D, lbl):
            sizes = jnp.zeros(H * W, jnp.int32).at[lbl.reshape(-1)].add(
                (D >= 0).reshape(-1).astype(jnp.int32))
            seg = sizes[lbl]
            return jnp.where((D >= 0) & (seg < params.speckle_size),
                             -10.0, D)
        return jax.vmap(one)(D, lbl)
    sj = jax.jit(sizes_fn)
    D1s = bench("segment sizes+kill", sj, D1c, lbl)

    tail = jax.jit(jax.vmap(lambda a, b: PP.post_tail(a, b, params)))
    bench("tail (gap+mean+median)", tail, D1s, D2c)

    full = jax.jit(jax.vmap(lambda a, b: PP.postprocess(a, b, params)))
    bench("full postprocess", full, D1, D2)

    fullb = jax.jit(lambda a, b: PP.postprocess_batch(a, b, params))
    bench("postprocess_batch", fullb, D1, D2)

    fullb96 = jax.jit(lambda a, b: PP.postprocess_batch(a, b, params, 96))
    bench("postprocess_batch lr=96", fullb96, D1, D2)

    killb = jax.jit(lambda d: PP.remove_small_segments_batch(d, params))
    bench("speckle batch (CC+kill)", killb, D1c)


if __name__ == "__main__":
    main()
