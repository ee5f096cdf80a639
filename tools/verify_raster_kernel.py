"""Hardware verification for the Pallas slab-raster kernel: bitwise
equality against the XLA raster on real TPU (the CI suite forces CPU,
where the kernel path is not taken; interpret mode would reintroduce
XLA:CPU FMA contraction and is NOT bit-faithful). Run on a TPU-attached
host; also prints the speed comparison."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jackal_tpu.config import ElasParams
from jackal_tpu.matching.elas import pipeline as P

B, H, W = 4, 480, 640
CH = 4
for fx in ("elas_golden_s640_boxes", "elas_golden_photo"):
    z = np.load(f"/root/repo/tests/fixtures/{fx}.npz")
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
    flat = jnp.asarray(P._flatten_chunk_wire(wires, Np, Tp, Ts))
    key = (CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    m1, m2, g1, g2 = P._raster_chunk(flat, CH, Np, Tp, Ts, gh, gw, Db, W, H, gs)
    coeff_jit, mul_jit, add_jit, fused_jit, kernel_jit = P._RASTER_JITS[key]
    with jax.enable_x64(True):
        s1, s2 = coeff_jit(flat)
    ref1, ref2 = fused_jit(s1, s2)
    for got, ref, side in ((m1, ref1, "L"), (m2, ref2, "R")):
        for g, r, name in zip(got, ref, ("dp", "valid", "covered")):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r)), name
    print(fx, "kernel == XLA raster (bitwise)", flush=True)

    # timing
    def sync(x):
        float(sum(l.astype(jnp.float32).sum() for l in jax.tree_util.tree_leaves(x)))
    for label, fn in (("XLA fused", lambda: fused_jit(s1, s2)),
                      ("Pallas kernel", lambda: kernel_jit(s1, s2))):
        out = fn(); sync(out)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter()-t0-0.025)/10)
        print(f"  {label:14s} {best*1000:6.2f} ms/chunk ({best*250:5.2f} ms/frame)", flush=True)
