"""Microbenchmark + equality harness for the native Delaunay engine.

Extracts real support-point sets from the golden fixtures (cached to
/tmp so engine iterations don't pay the TPU front), times
delaunay_exact on each side, and asserts the triangle lists match a
recorded reference (written with --record before an optimization pass),
so speedups are provably output-identical.
"""
import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CACHE = "/tmp/delaunay_bench_inputs.npz"
REF = "/tmp/delaunay_bench_ref.npz"


def _support_sets():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return [z[k] for k in sorted(z.files)]
    import jax.numpy as jnp
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas import pipeline as P
    from jackal_tpu.matching.elas.native_prior import (
        collect_support_points_native)

    params = ElasParams()
    sets = {}
    for i, f in enumerate(("elas_golden_s640_boxes.npz",
                           "elas_golden_photo.npz")):
        z = np.load(os.path.join(ROOT, "tests/fixtures", f))
        H, W = z["left"].shape
        lb = jnp.asarray(z["left"][None])
        rb = jnp.asarray(z["right"][None])
        static = P._Static(params, P._use_pallas())
        dcan = np.asarray(P._front(lb, rb, static)[2])[0]
        sets[f"s{i}"] = collect_support_points_native(dcan, params, W, H)
    np.savez(CACHE, **sets)
    return [sets[k] for k in sorted(sets)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="record current outputs as the reference")
    ap.add_argument("-n", type=int, default=60)
    args = ap.parse_args()

    from jackal_tpu.matching.elas.prior import delaunay

    sets = _support_sets()
    cases = []
    for sp in sets:
        cases.append(sp[:, :2].astype(np.float32))
        cases.append(np.stack([sp[:, 0] - sp[:, 2], sp[:, 1]],
                              -1).astype(np.float32))

    outs = [delaunay(c) for c in cases]
    if args.record:
        np.savez(REF, **{f"t{i}": t for i, t in enumerate(outs)})
        print("recorded", [len(t) for t in outs])
    elif os.path.exists(REF):
        ref = np.load(REF)
        for i, t in enumerate(outs):
            r = ref[f"t{i}"]
            assert t.shape == r.shape and (t == r).all(), \
                f"case {i}: triangles differ ({len(t)} vs {len(r)})"
        print("outputs identical to recorded reference")

    for i, c in enumerate(cases):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.n):
                delaunay(c)
            best = min(best, (time.perf_counter() - t0) / args.n)
        print(f"case {i}: n={len(c):5d} tri={len(outs[i]):5d} "
              f"{best*1000:7.3f} ms")


if __name__ == "__main__":
    main()
