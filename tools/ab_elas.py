"""A/B: ELAS e2e fps on the boxes fixture for whichever pipeline variant is
currently in the working tree (run once on committed tree, once on the
experiment) plus a front-only split and a tunnel RTT probe."""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P

    B, H, W = 16, 480, 640
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(root, "tests/fixtures/elas_golden_s640_boxes.npz"))
    lb = jnp.asarray(np.broadcast_to(z["left"], (B, H, W)).copy())
    rb = jnp.asarray(np.broadcast_to(z["right"], (B, H, W)).copy())
    params = ElasParams()
    static = P._Static(params, P._use_pallas())

    # tunnel RTT: scalar round trip
    x = jnp.float32(1.0) + 1
    float(x)
    t0 = time.perf_counter()
    for _ in range(10):
        float((jnp.float32(1.0) + 1))
    print(f"scalar RTT: {(time.perf_counter()-t0)*100:.1f} ms")

    # warm
    D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=4)
    float(D1.sum().astype(jnp.float32))

    # front only
    for trial in range(3):
        t0 = time.perf_counter()
        out = P._front(lb, rb, static)
        acc = sum(l.sum().astype(jnp.float32)
                  for l in jax.tree_util.tree_leaves(out))
        float(acc)
        print(f"front: {(time.perf_counter()-t0)*1000/B:.2f} ms/frame")

    for trial in range(3):
        t0 = time.perf_counter()
        D1, D2 = P.elas_match_batch_device(lb, rb, params, chunk=4)
        float(D1.sum().astype(jnp.float32))
        dt = time.perf_counter() - t0
        print(f"e2e: {dt*1000/B:.2f} ms/frame = {B/dt:.1f} fps")


if __name__ == "__main__":
    main()
