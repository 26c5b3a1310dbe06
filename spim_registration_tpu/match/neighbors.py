"""Batched k-nearest-neighbor search over padded point sets.

TPU-native replacement for the reference's ImgLib2 `KDTree` +
`KNearestNeighborSearchOnKDTree` (used to build point descriptors, SURVEY.md
section 2.4): an all-pairs squared-distance matrix computed on the MXU
(||a||^2 + ||b||^2 - 2 a.b) followed by `top_k`. For the point counts per
view (1e3-1e4) the N^2 matmul is far faster on TPU than any tree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(3.4e38)


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) x (M,3) -> (N,M) squared distances, MXU matmul form."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = a @ b.T
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


@partial(jax.jit, static_argnames=("k", "exclude_self"))
def knn(points: jnp.ndarray, valid: jnp.ndarray, k: int,
        exclude_self: bool = True):
    """k nearest valid neighbors of each point within the same set.

    Returns (idx (N,k) int32, dist (N,k) float32). Invalid query rows get
    arbitrary (masked-at-use) results; invalid neighbors are never chosen
    while enough valid points exist.
    """
    d2 = pairwise_sqdist(points, points)
    d2 = jnp.where(valid[None, :], d2, _INF)
    if exclude_self:
        n = points.shape[0]
        d2 = d2 + jnp.eye(n, dtype=d2.dtype) * _INF
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))


@partial(jax.jit, static_argnames=("k",))
def cross_knn(a: jnp.ndarray, a_valid: jnp.ndarray,
              b: jnp.ndarray, b_valid: jnp.ndarray, k: int):
    """k nearest valid points of set b for each point of set a."""
    d2 = pairwise_sqdist(a, b)
    d2 = jnp.where(b_valid[None, :], d2, _INF)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0.0))
