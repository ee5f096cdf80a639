"""Stage-level breakdown of the batched ELAS path (flat coefficient wire +
device raster + full device postprocess) on real TPU.

Each device stage is timed over back-to-back dispatches with one final
sync so the ~25 ms tunnel RTT amortizes out."""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P

    B, H, W = 16, 480, 640
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

    # warm everything once
    D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=CH)
    sync(D1)

    def dev_time(fn, out, iters=4):
        fn()
        sync(out[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync(out[0])
        return (time.perf_counter() - t0 - 0.025) / iters

    t = {}
    out = [None]

    def front():
        out[0] = P._front(lb, rb, static)
    t["front(desc+support)"] = dev_time(front, out)
    d1, d2, dcan_dev = out[0]

    t0 = time.perf_counter()
    dcan = np.asarray(dcan_dev)
    t["dcan download"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    wires = [P._prior_tri_job(dcan[b], params, W, H, True)
             for b in range(B)]
    t["host prior x16 serial"] = time.perf_counter() - t0

    Np, Tp, Ts = P._chunk_pads(wires)
    t0 = time.perf_counter()
    flats = [P._flatten_chunk_wire(wires[c:c + CH], Np, Tp, Ts)
             for c in range(0, B, CH)]
    t["host flatten x4"] = time.perf_counter() - t0
    print(f"  (Np={Np}, Tp={Tp}, wire {flats[0].nbytes/1e3:.0f} KB/chunk)")

    t0 = time.perf_counter()
    fdevs = [jnp.asarray(f) for f in flats]
    sync(fdevs)
    t["upload x4"] = time.perf_counter() - t0

    maps = [None]

    def raster():
        maps[0] = [P._raster_chunk(fd, CH, Np, Tp, Ts, gh, gw, Db, W, H,
                                   params.grid_size)
                   for fd in fdevs]
    t["device coeff+raster x4"] = dev_time(raster, maps, iters=2)

    outs = [None]

    def dense():
        outs[0] = [P._dense_post(d1[c:c + CH], d2[c:c + CH],
                                 *m[0], m[2], *m[1], m[3], static)
                   for c, m in zip(range(0, B, CH), maps[0])]
    t["dense+post x4 chunks"] = dev_time(dense, outs, iters=2)

    total = 0.0
    for k, v in t.items():
        print(f"{k:28s} {v*1000:8.2f} ms  ({v*1000/B:6.2f} ms/frame)")
        total += v
    print(f"{'sum':28s} {total*1000:8.2f} ms  ({total*1000/B:6.2f} "
          f"ms/frame)")

    for trial in range(3):
        t0 = time.perf_counter()
        D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=CH)
        sync(D1)
        e2e = time.perf_counter() - t0
        print(f"{'e2e chunk=4':28s} {e2e*1000:8.2f} ms  ({e2e*1000/B:6.2f} "
              f"ms/frame = {B/e2e:.1f} fps)")


if __name__ == "__main__":
    main()
