"""Stage-level breakdown of the Pallas SGM path at 1280x960/64 on TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jackal_tpu.config import SGMParams
    from jackal_tpu.matching import sgm as S
    from jackal_tpu.ops.pallas.sgm_kernel import (
        aggregate_paths_pallas, sgm_paths_dir_pallas)

    B, H, W = 4, 960, 1280
    D = 64
    params = SGMParams(disp_num=D)
    rng = np.random.default_rng(0)
    lb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    rb = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))

    def sync(x):
        # on-device reduce + scalar fetch: a full np.asarray download over
        # the ~20 MB/s tunnel would dominate every timing
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "sum") and hasattr(l, "astype")]
        acc = sum(l.sum().astype(jnp.float32) for l in leaves)
        float(acc)

    census_j = jax.jit(jax.vmap(S.census5x5))
    cost_j = jax.jit(jax.vmap(
        lambda a, b: S.census_cost_volume(a, b, D)))
    fin_j = jax.jit(jax.vmap(partial(S._finalize, params=params)))
    agg_j = jax.jit(partial(aggregate_paths_pallas, params=params))

    # warm
    cl, cr = census_j(lb), census_j(rb)
    cost = cost_j(cl, cr)
    Sv = agg_j(cost)
    out = fin_j(Sv)
    sync(out)

    def bench(fn, *a, n=4):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn(*a)
            sync(r)
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        return best * 1000 / B  # ms/frame

    print(f"census x2        {bench(lambda: (census_j(lb), census_j(rb))):8.2f} ms/frame")
    print(f"cost volume      {bench(lambda: cost_j(cl, cr)):8.2f} ms/frame")
    c_bhdw = jnp.moveaxis(cost, 1, 2)
    mv_j = jax.jit(lambda c: jnp.moveaxis(c, 1, 2))
    print(f"moveaxis         {bench(lambda: mv_j(cost)):8.2f} ms/frame")
    one_j = jax.jit(partial(sgm_paths_dir_pallas, p1=params.p1,
                            p2=params.p2, shifts=(0, 1, -1), reverse=False))
    sync(one_j(c_bhdw))
    print(f"down pass (3p)   {bench(lambda: one_j(c_bhdw)):8.2f} ms/frame")
    tr_j = jax.jit(lambda c: jnp.transpose(c, (0, 3, 2, 1)))
    sync(tr_j(c_bhdw))
    print(f"transpose WDH    {bench(lambda: tr_j(c_bhdw)):8.2f} ms/frame")
    print(f"aggregate total  {bench(lambda: agg_j(cost)):8.2f} ms/frame")
    print(f"finalize (WTA)   {bench(lambda: fin_j(Sv)):8.2f} ms/frame")

    t0 = time.perf_counter()
    for _ in range(4):
        cl2, cr2 = census_j(lb), census_j(rb)
        o = fin_j(agg_j(cost_j(cl2, cr2)))
    sync(o)
    print(f"e2e              {(time.perf_counter()-t0)/4*1000/B:8.2f} ms/frame")


if __name__ == "__main__":
    main()
