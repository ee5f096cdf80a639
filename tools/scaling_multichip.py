"""ELAS multichip DP scaling curve on the virtual CPU mesh (VERDICT r4 #7).

Runs elas_match_batch_multichip at n = 1, 2, 4, 8 virtual devices
(xla_force_host_platform_device_count) on the mixed fixture batch and
tabulates throughput. The absolute numbers are CPU-mesh numbers — the
point is the SHAPE of the curve: the host prior is serial on this 1-core
box, so total throughput is predicted to saturate once the per-replica
device time hides under the shared host-prior pool
(docs/performance.md "Multi-chip"). Correctness is asserted against the
single-device path on every run (distinct frames per replica).

Usage: python tools/scaling_multichip.py [B]
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from jackal_tpu.config import ElasParams
    from jackal_tpu.matching.elas.pipeline import (
        elas_match_batch, elas_match_batch_multichip)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    H, W = 240, 320   # CPU-mesh scale: full frames take minutes on CPU
    zs = [np.load(os.path.join(ROOT, "tests/fixtures", f))
          for f in ("elas_golden_s640_boxes.npz", "elas_golden_photo.npz")]
    scene = np.arange(B) % len(zs)
    lb = np.stack([zs[s]["left"][:H, :W] for s in scene])
    rb = np.stack([zs[s]["right"][:H, :W] for s in scene])
    p = ElasParams()

    ref1, ref2 = elas_match_batch(lb, rb, p, chunk=4)

    print(f"batch {B} @ {W}x{H}, chunk 4, "
          f"{os.cpu_count()} host cores, virtual CPU mesh")
    print(f"{'n_dev':>6} {'ms/frame':>9} {'fps':>7} {'speedup':>8}  exact")
    base = None
    for n in (1, 2, 4, 8):
        devs = jax.devices()[:n]
        fn = lambda: elas_match_batch_multichip(
            lb, rb, p, chunk=4, devices=devs)
        D1, D2 = fn()                      # warm/compile
        ok = np.array_equal(D1, ref1) and np.array_equal(D2, ref2)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            D1, D2 = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        fps = B / best
        base = base or fps
        print(f"{n:>6} {best / B * 1e3:>9.2f} {fps:>7.1f} "
              f"{fps / base:>7.2f}x  {ok}")


if __name__ == "__main__":
    main()
