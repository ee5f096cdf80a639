"""Sub-stage breakdown of the ELAS host prior (_prior_tri_job): support
collection, 2x Delaunay, tri_wire sort, slab binning, flatten. The host is
1 core; at 200 fps the whole job must fit in <5 ms/frame."""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas.native_prior import (
        collect_support_points_native)
    from jackal_tpu.matching.elas.prior import delaunay
    from jackal_tpu.matching.elas.device_prior import (
        _RASTER_CTILE, _RASTER_SLAB, slab_select, tri_wire)

    B, H, W = 4, 480, 640
    z = np.load(os.path.join(ROOT, "tests/fixtures",
                             "elas_golden_s640_boxes.npz"))
    lb = jnp.asarray(np.broadcast_to(z["left"], (B, H, W)).copy())
    rb = jnp.asarray(np.broadcast_to(z["right"], (B, H, W)).copy())
    params = ElasParams()
    static = P._Static(params, P._use_pallas())
    d1, d2, dcan_dev = P._front(lb, rb, static)
    dcan = np.asarray(dcan_dev)[0]

    def t(label, fn, n=30):
        fn()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{label:30s} {best*1000:7.2f} ms/frame")
        return r

    support = t("collect_support (native)",
                lambda: collect_support_points_native(dcan, params, W, H))
    print(f"  support points: {len(support)}")
    left_pts = support[:, :2].astype(np.float32)
    right_pts = np.stack(
        [support[:, 0] - support[:, 2], support[:, 1]], -1).astype(np.float32)
    tri1 = t("delaunay left", lambda: delaunay(left_pts))
    tri2 = t("delaunay right", lambda: delaunay(right_pts))
    print(f"  triangles: {len(tri1)} / {len(tri2)}")
    t1p1 = t("tri_wire x2", lambda: (tri_wire(support, tri1),
                                     tri_wire(support, tri2)))
    t1, p1 = t1p1[0]
    t2, p2 = t1p1[1]
    sel = t("slab_select x2", lambda: (
        slab_select(support, t1, W, H, _RASTER_SLAB, _RASTER_CTILE),
        slab_select(support, t2, W, H, _RASTER_SLAB, _RASTER_CTILE,
                    right=True)))
    wires = [(support.astype(np.int16), t1, p1, t2, p2, sel[0], sel[1])] * 4
    Np, Tp, Ts = P._chunk_pads(wires)
    t("flatten chunk/4", lambda: P._flatten_chunk_wire(wires, Np, Tp, Ts),
      n=10)
    t("FULL _prior_tri_job", lambda: P._prior_tri_job(dcan, params, W, H,
                                                      True), n=10)


if __name__ == "__main__":
    main()
