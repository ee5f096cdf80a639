"""ELAS plane fit ON DEVICE, bit-exact to the host C++ engine.

computeDisparityPlanes (elas.cpp:507-577) fits d = a*u + b*v + c per
Delaunay triangle with a full-pivot 3x3 Gauss-Jordan in float64
(matrix.cpp:414-502; production twin: prior_engine.cpp solve3). TPUs lack
f64, so round-2 shipped the fitted coefficients over the host->device wire
(~24 B/triangle — a bound on tunnel-attached rigs). This module runs the
IDENTICAL op sequence in softfloat f64 (ops/softfloat.py) vectorized over
the triangle batch, so only the triangle VERTEX INDICES cross the wire:

  per k in 0..2:
    full pivot over the trailing submatrix, strict-> first-wins scan order
    (exact: magnitude compare on f64 bits);
    fail if best < 1e-20;
    physical row swap (A, b) and column swap (A, idx);
    A[k][:] /= piv; b[k] /= piv          (f64 divisions)
    rows i != k: f = A[i][k]; A[i][:] -= f*A[k][:]; b[i] -= f*b[k]
                                         (separate mul + sub roundings)
  unscramble: out[idx[k]] = b[k]; singular -> (0,0,0)

Outputs are the f64 results C-cast to f32, exactly like the native
engine's `planes` array — asserted bit-identical in
tests/test_device_fit.py.

Trace under `with jax.enable_x64(True):` (the pipeline's jit wrappers do).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import softfloat as sf

_MAG = 0x7FFFFFFFFFFFFFFF
_EPS_BITS = np.float64(1e-20).view(np.int64).item()   # singularity gate


def _perm2(idx3, k, p):
    """[T, 3] permutation indices swapping positions k <-> p[t]."""
    return jnp.where(idx3 == k, p[:, None],
                     jnp.where(idx3 == p[:, None], k, idx3))


def _sel_rows(M, perm):
    """M [T, 3] or [T, 3, X] reordered as M[t, i] = M_old[t, perm[t, i]],
    with where-selects over the 3 candidates instead of take_along_axis:
    a batched gather drops off the TPU vector fast path (~400x slower
    measured under vmap), a 3-way select stays elementwise."""
    rows = [M[:, j] for j in range(3)]
    out = []
    for i in range(3):
        p = perm[:, i]
        pe = p[:, None] if M.ndim == 3 else p
        out.append(jnp.where(pe == 0, rows[0],
                             jnp.where(pe == 1, rows[1], rows[2])))
    return jnp.stack(out, axis=1)


def _sel_cols(M, perm):
    """M [T, 3, 3] reordered as M[t, :, j] = M_old[t, :, perm[t, j]]."""
    cols = [M[:, :, j] for j in range(3)]
    out = []
    for j in range(3):
        p = perm[:, j][:, None]
        out.append(jnp.where(p == 0, cols[0],
                             jnp.where(p == 1, cols[1], cols[2])))
    return jnp.stack(out, axis=2)


def _gj_solve3(A, b):
    """Vectorized solve3: A [T,3,3] f64 bits, b [T,3] f64 bits ->
    (x [T,3] f64 bits, ok [T] bool)."""
    T = A.shape[0]
    idx3 = jnp.arange(3, dtype=jnp.int32)[None, :]
    colidx = jnp.broadcast_to(idx3, (T, 3))

    ok = jnp.ones((T,), bool)
    for k in range(3):
        mag = A.astype(jnp.int64) & jnp.int64(_MAG)
        elig = ((jnp.arange(3) >= k)[:, None]
                & (jnp.arange(3) >= k)[None, :])
        magm = jnp.where(elig[None], mag, jnp.int64(-1))
        flat = magm.reshape(T, 9)
        best = flat.max(axis=1)
        # strict-> update == FIRST maximal entry in i-major scan order
        sel = jnp.argmax(flat == best[:, None], axis=1).astype(jnp.int32)
        pr, pc = sel // 3, sel % 3
        ok = ok & (best >= jnp.int64(_EPS_BITS))

        permr = _perm2(idx3, k, pr)
        A = _sel_rows(A, permr)
        b = _sel_rows(b, permr)
        permc = _perm2(idx3, k, pc)
        A = _sel_cols(A, permc)
        colidx = _sel_rows(colidx, permc)

        piv = A[:, k, k]
        Ak = sf.f64_div(A[:, k], piv[:, None])     # row k scaled
        bk = sf.f64_div(b[:, k], piv)
        rows = []
        brows = []
        for i in range(3):
            if i == k:
                rows.append(Ak)
                brows.append(bk)
            else:
                f = A[:, i, k]
                rows.append(sf.f64_sub(A[:, i],
                                       sf.f64_mul(f[:, None], Ak)))
                brows.append(sf.f64_sub(b[:, i], sf.f64_mul(f, bk)))
        A = jnp.stack(rows, axis=1)
        b = jnp.stack(brows, axis=1)

    # out[colidx[k]] = b[k]
    out = jnp.zeros_like(b)
    for slot in range(3):
        v = jnp.zeros_like(b[:, 0])
        for k in range(3):
            v = jnp.where(colidx[:, k] == slot, b[:, k], v)
        out = out.at[:, slot].set(v)
    zero = jnp.zeros_like(out)
    return jnp.where(ok[:, None], out, zero), ok


def _fit_planes_impl(support, tri):
    """support [N,3] i32 (u,v,d), tri [T,3] i32 -> [T,6] f32
    (t1a,t1b,t1c,t2a,t2b,t2c), matching fit_planes_native bitwise."""
    u = support[tri, 0]                    # [T,3] i32
    v = support[tri, 1]
    d = support[tri, 2]
    one = sf.f64_from_i32(jnp.ones_like(u))
    vb = sf.f64_from_i32(v)
    db = sf.f64_from_i32(d)
    outs = []
    for right in (False, True):
        ub = sf.f64_from_i32(u - d if right else u)
        A = jnp.stack([ub, vb, one], axis=-1)   # [T,3,3] bits
        x, _ = _gj_solve3(A, db)
        outs.append(sf.f64_to_f32_bits(x))      # [T,3] i32 f32-bits
    out = jnp.concatenate(outs, axis=-1)        # [T,6]
    return jax.lax.bitcast_convert_type(out.astype(jnp.int32), jnp.float32)


_fit_jit = None


def fit_planes_device(support, tri):
    """Device twin of native_prior.fit_planes_native: [T, 6] float32."""
    global _fit_jit
    if _fit_jit is None:
        def traced(s, t):
            with jax.enable_x64(True):
                return _fit_planes_impl(s.astype(jnp.int32),
                                        t.astype(jnp.int32))
        _fit_jit = jax.jit(traced)
    with jax.enable_x64(True):
        return _fit_jit(jnp.asarray(support), jnp.asarray(tri))
