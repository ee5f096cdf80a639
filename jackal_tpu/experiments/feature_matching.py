"""Sparse feature matching experiment (disparity_map.cpp equivalent).

The reference's offline experiment (disparity_map.cpp:51-117, commented out
of its build) detects ORB keypoints, kNN-matches binary descriptors with a
FLANN LSH index and applies an NNDR 0.9 ratio test. TPU-native rebuild:
FAST-like corner scoring + BRIEF-like binary descriptors as batched JAX
ops, and brute-force Hamming kNN as one big XOR-popcount matrix — on TPU a
dense [N, M] reduction beats an LSH index by orders of magnitude at these
sizes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..matching.sgm import _popcount


def harris_corners(
    img_u8: jnp.ndarray, max_corners: int = 500, k: float = 0.04,
    nms_radius: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Harris corner response + top-K with local NMS.

    Returns (uv [K, 2] int32, score [K] f32); padded entries score <= 0.
    """
    x = img_u8.astype(jnp.float32)
    gx = (jnp.pad(x, ((0, 0), (1, 1)), "edge")[:, 2:]
          - jnp.pad(x, ((0, 0), (1, 1)), "edge")[:, :-2])
    gy = (jnp.pad(x, ((1, 1), (0, 0)), "edge")[2:, :]
          - jnp.pad(x, ((1, 1), (0, 0)), "edge")[:-2, :])

    def blur(a):
        a = jnp.pad(a, 2, "edge")
        out = 0.0
        for dv in range(5):
            for du in range(5):
                out = out + a[dv:dv + x.shape[0], du:du + x.shape[1]]
        return out / 25.0

    sxx, syy, sxy = blur(gx * gx), blur(gy * gy), blur(gx * gy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    r = det - k * tr * tr
    # NMS: keep only local maxima in a (2r+1)^2 window
    p = jnp.pad(r, nms_radius, constant_values=-jnp.inf)
    mx = r
    for dv in range(-nms_radius, nms_radius + 1):
        for du in range(-nms_radius, nms_radius + 1):
            mx = jnp.maximum(
                mx, p[nms_radius + dv:nms_radius + dv + x.shape[0],
                      nms_radius + du:nms_radius + du + x.shape[1]])
    keep = (r >= mx) & (r > 0)
    score = jnp.where(keep, r, -1.0).reshape(-1)
    topk = jax.lax.top_k(score, max_corners)
    idx = topk[1]
    uv = jnp.stack([idx % x.shape[1], idx // x.shape[1]], axis=-1)
    return uv.astype(jnp.int32), topk[0]


# pseudo-random BRIEF sampling pattern (fixed seed, 256 bits)
_BRIEF_RNG = np.random.RandomState(7)
_BRIEF_A = _BRIEF_RNG.randint(-12, 13, size=(256, 2)).astype(np.int32)
_BRIEF_B = _BRIEF_RNG.randint(-12, 13, size=(256, 2)).astype(np.int32)


def brief_descriptors(img_u8: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """256-bit binary descriptors packed as [K, 8] int32."""
    H, W = img_u8.shape
    img = jnp.pad(img_u8.astype(jnp.int32), 16, mode="edge")
    u = uv[:, 0] + 16
    v = uv[:, 1] + 16
    bits = []
    for i in range(256):
        pa = img[v + _BRIEF_A[i, 1], u + _BRIEF_A[i, 0]]
        pb = img[v + _BRIEF_B[i, 1], u + _BRIEF_B[i, 0]]
        bits.append((pa < pb).astype(jnp.int32))
    bits = jnp.stack(bits, axis=-1)          # [K, 256]
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32)
    return (words << shifts[None, None, :]).sum(-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("nndr",))
def knn_hamming_match(
    desc1: jnp.ndarray, desc2: jnp.ndarray, valid1: jnp.ndarray,
    valid2: jnp.ndarray, nndr: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-NN brute-force Hamming matching with NNDR ratio test
    (disparity_map.cpp:96-108 semantics). Returns (match_idx [N] int32,
    ok [N] bool); match_idx is the best desc2 index."""
    x = desc1[:, None, :] ^ desc2[None, :, :]          # [N, M, 8]
    dist = _popcount(x).sum(-1)                        # [N, M]
    BIG = jnp.int32(1 << 20)
    dist = jnp.where(valid2[None, :], dist, BIG)
    best = jnp.argmin(dist, axis=1)
    d1 = jnp.min(dist, axis=1)
    masked = jnp.where(
        jax.nn.one_hot(best, dist.shape[1], dtype=jnp.bool_), BIG, dist)
    d2 = jnp.min(masked, axis=1)
    ok = valid1 & (d1.astype(jnp.float32)
                   <= nndr * d2.astype(jnp.float32)) & (d2 < BIG)
    return best.astype(jnp.int32), ok


def match_features(
    left_u8: np.ndarray, right_u8: np.ndarray, max_corners: int = 500,
    nndr: float = 0.9,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full experiment: corners + descriptors + ratio-test matching.

    Returns (pts_left [K, 2], pts_right [K, 2]) matched pixel coords.
    """
    l = jnp.asarray(left_u8)
    r = jnp.asarray(right_u8)
    uv1, s1 = harris_corners(l, max_corners)
    uv2, s2 = harris_corners(r, max_corners)
    d1 = brief_descriptors(l, uv1)
    d2 = brief_descriptors(r, uv2)
    idx, ok = knn_hamming_match(d1, d2, s1 > 0, s2 > 0, nndr)
    okn = np.asarray(ok)
    return np.asarray(uv1)[okn], np.asarray(uv2)[np.asarray(idx)[okn]]
