"""Dense linear-algebra surface of the reference Matrix class, TPU-native.

The reference vendors libviso2's double-precision Matrix (matrix.h:49-131)
whose capabilities ELAS actually uses only through 3x3 `solve` (plane
fitting, elas.cpp:507-577). This module provides the full solve/lu/svd
surface as batched jax ops:

  - gauss_jordan_solve: full-pivoting Gauss-Jordan elimination with the
    reference's singularity contract (matrix.cpp:414-502: returns false ->
    here a per-system `ok` flag; |pivot| < 1e-20 is singular). Batched —
    thousands of 3x3 plane fits are one vmapped call.
  - lu: Doolittle factorization with implicit-scaling partial pivoting and
    the same singular-matrix TINY substitution (matrix.cpp:511-574).
  - svd: thin wrapper over jnp.linalg.svd in the reference's A = U diag(w)
    V^T output convention (matrix.cpp:576-821 is Golub-Reinsch; numeric
    agreement is up to sign/ordering conventions, documented).

float64 by default to match the reference's double math (enable with
jax.config.update("jax_enable_x64", True); falls back to f32 otherwise).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve A X = B by Gauss-Jordan with full pivoting.

    A: [..., M, M], B: [..., M, K]. Returns (A_inv, X, ok) where A_inv is
    the in-place inverse the reference leaves in A, X the solution left in
    B, and ok=False where a |pivot| < 1e-20 was hit (reference returns
    false and aborts; we flag and produce zeros, the fixed-shape analogue).
    """
    M = A.shape[-1]

    def one(A, B):
        # bookkeeping mirrors matrix.cpp:422-501: ipiv marks used pivots,
        # indxr/indxc record the swap history for the final column unswap
        def body(i, carry):
            A, B, ipiv, indxr, indxc, ok = carry
            absA = jnp.abs(A)
            cand = (ipiv[:, None] == 0) & (ipiv[None, :] == 0)
            big = jnp.where(cand, absA, -1.0)
            flat = jnp.argmax(big)
            irow, icol = flat // M, flat % M
            ipiv = ipiv.at[icol].add(1)
            # swap rows irow <-> icol
            Ar, Ac = A[irow], A[icol]
            A = A.at[irow].set(Ac).at[icol].set(Ar)
            Br, Bc = B[irow], B[icol]
            B = B.at[irow].set(Bc).at[icol].set(Br)
            indxr = indxr.at[i].set(irow)
            indxc = indxc.at[i].set(icol)
            piv = A[icol, icol]
            ok = ok & (jnp.abs(piv) >= 1e-20)
            pivinv = jnp.where(jnp.abs(piv) < 1e-20, 0.0, 1.0 / piv)
            A = A.at[icol, icol].set(1.0)
            A = A.at[icol].multiply(pivinv)
            B = B.at[icol].multiply(pivinv)
            # eliminate icol from all other rows
            dum = A[:, icol].at[icol].set(0.0)
            A = A.at[:, icol].set(jnp.where(jnp.arange(M) == icol,
                                            A[:, icol], 0.0))
            A = A - dum[:, None] * A[icol][None, :]
            B = B - dum[:, None] * B[icol][None, :]
            return A, B, ipiv, indxr, indxc, ok

        init = (A.astype(jnp.result_type(A, 0.0)),
                B.astype(jnp.result_type(B, 0.0)),
                jnp.zeros(M, jnp.int32), jnp.zeros(M, jnp.int32),
                jnp.zeros(M, jnp.int32), jnp.asarray(True))
        A2, B2, _, indxr, indxc, ok = jax.lax.fori_loop(0, M, body, init)

        # unswap columns in reverse order (matrix.cpp:494-500)
        def unswap(k, A2):
            i = M - 1 - k
            r, c = indxr[i], indxc[i]
            col_r, col_c = A2[:, r], A2[:, c]
            return A2.at[:, r].set(col_c).at[:, c].set(col_r)

        A2 = jax.lax.fori_loop(0, M, unswap, A2)
        zero = jnp.zeros_like(B2)
        return (jnp.where(ok, A2, jnp.zeros_like(A2)),
                jnp.where(ok, B2, zero), ok)

    batch = A.ndim - 2
    f = one
    for _ in range(batch):
        f = jax.vmap(f)
    return f(A, B)


def lu(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray]:
    """Doolittle LU with implicit-scaling partial pivoting
    (matrix.cpp:511-574): returns (LU, idx, d, ok) — the packed factors,
    the row-permutation record, the permutation sign d in {-1, +1}, and
    ok=False where a zero scale row made the matrix singular. A zero pivot
    is substituted with TINY=1e-20 exactly like the reference."""
    M = A.shape[-1]
    TINY = 1e-20

    def one(A):
        A = A.astype(jnp.result_type(A, 0.0))
        vv_ok = jnp.abs(A).max(axis=1) > 0.0
        ok = vv_ok.all()
        vv = 1.0 / jnp.where(vv_ok, jnp.abs(A).max(axis=1), 1.0)

        def body(j, carry):
            A, vv, idx, d = carry
            col = jnp.arange(M)
            # rows i < j: standard inner update happens implicitly via the
            # running elimination below (Crout order): compute column j
            def inner(i, A):
                s = A[i, j] - jnp.where(col < jnp.minimum(i, j),
                                        A[i] * A[:, j], 0.0).sum()
                return A.at[i, j].set(s)

            A = jax.lax.fori_loop(0, M, inner, A)
            # pivot: max vv[i]*|A[i,j]| over i >= j
            merit = jnp.where(jnp.arange(M) >= j,
                              vv * jnp.abs(A[:, j]), -1.0)
            imax = jnp.argmax(merit)
            # swap rows j <-> imax
            swap = imax != j
            Aj, Ai = A[j], A[imax]
            A = A.at[j].set(Ai).at[imax].set(Aj)
            vv = vv.at[imax].set(vv[j])
            d = jnp.where(swap, -d, d)
            idx = idx.at[j].set(imax)
            piv = A[j, j]
            piv = jnp.where(piv == 0.0, TINY, piv)
            A = A.at[j, j].set(piv)
            scale = jnp.where(jnp.arange(M) > j, 1.0 / piv, 0.0)
            A = A.at[:, j].set(A[:, j] * jnp.where(jnp.arange(M) > j,
                                                   scale, 1.0))
            return A, vv, idx, d

        init = (A, vv, jnp.zeros(M, jnp.int32), jnp.asarray(1.0, A.dtype))
        A, vv, idx, d = jax.lax.fori_loop(0, M, body, init)
        return A, idx, d, ok

    batch = A.ndim - 2
    f = one
    for _ in range(batch):
        f = jax.vmap(f)
    return f(A)


def svd(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(U, w, V) with A = U @ diag(w) @ V.T — the reference Matrix::svd
    output convention (matrix.cpp:576-821). Delegates the iteration to
    jnp.linalg.svd (XLA-native); singular values are returned in XLA's
    descending order (the reference leaves them unsorted — callers that
    need the reference's ordering sort by magnitude, which descending
    already satisfies for distinct values)."""
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    return U, s, jnp.swapaxes(Vt, -1, -2)
