"""Stage-level breakdown of the batched ELAS path on real TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P

    B, H, W = 16, 480, 640
    rng = np.random.default_rng(0)
    base = (rng.random((B, H, W)) * 255).astype(np.uint8)
    lb = jnp.asarray(base)
    rb = jnp.asarray(np.roll(base, 5, axis=2))
    params = ElasParams()
    static = P._Static(params, P._use_pallas())

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: float(np.asarray(a).ravel()[:1].sum()), x)

    # warm everything once
    D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=4)
    sync(D1)

    t = {}
    t0 = time.perf_counter()
    d1, d2, dcan_dev = P._front(lb, rb, static)
    sync(dcan_dev)
    t["front(desc+support)"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dcan = np.asarray(dcan_dev)
    t["dcan download"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    wires = [P._prior_wire_job(dcan[b], params, W, H, True) for b in range(B)]
    t["host prior x16 serial"] = time.perf_counter() - t0

    import os
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(B, os.cpu_count() or 8)) as pool:
        t0 = time.perf_counter()
        wires = list(pool.map(
            lambda b: P._prior_wire_job(dcan[b], params, W, H, True),
            range(B)))
        t["host prior x16 pooled"] = time.perf_counter() - t0

    # wire upload: per chunk of 4 (the shapes the e2e path compiled)
    CH = 4
    t0 = time.perf_counter()
    outs = []
    for c0 in range(0, B, CH):
        w1 = jnp.asarray(np.stack([w[0] for w in wires[c0:c0 + CH]]))
        g1 = jnp.asarray(np.stack([w[1] for w in wires[c0:c0 + CH]]))
        w2 = jnp.asarray(np.stack([w[2] for w in wires[c0:c0 + CH]]))
        g2 = jnp.asarray(np.stack([w[3] for w in wires[c0:c0 + CH]]))
        sl = slice(c0, c0 + CH)
        outs.append(P._dense_lr(d1[sl], d2[sl], w1, g1, w2, g2, static))
    for o in outs:
        sync(o[0])
    t["dense+LR+enc (4 chunks)"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    encs = [(np.asarray(o[2][0]), np.asarray(o[2][1])) for o in outs]
    t["enc download"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=min(B, os.cpu_count() or 8)) as pool:
        keeps = list(pool.map(
            lambda i: P._bfs_keep_job(encs[i // CH][0][i % CH],
                                      encs[i // CH][1][i % CH], params),
            range(B)))
    t["host BFS x16 pooled"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tails = []
    for ci, o in enumerate(outs):
        k1 = jnp.asarray(np.stack(keeps[ci * CH:(ci + 1) * CH]))
        tails.append(P._keep_tail(o[0], o[1], k1, None, static))
    for tl in tails:
        sync(tl)
    t["keep+tail"] = time.perf_counter() - t0

    total = 0.0
    for k, v in t.items():
        print(f"{k:28s} {v*1000:8.2f} ms  ({v*1000/B:6.2f} ms/frame)")
        if "serial" not in k:
            total += v
    print(f"{'sum (pooled)':28s} {total*1000:8.2f} ms  "
          f"({total*1000/B:6.2f} ms/frame)")

    # end-to-end for reference
    t0 = time.perf_counter()
    D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=4)
    sync(D1)
    e2e = time.perf_counter() - t0
    print(f"{'e2e chunk=4':28s} {e2e*1000:8.2f} ms  ({e2e*1000/B:6.2f} "
          f"ms/frame = {B/e2e:.1f} fps)")


if __name__ == "__main__":
    main()
