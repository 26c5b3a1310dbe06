"""Rotation-invariant local point descriptors.

Reference parity (SURVEY.md section 2.6, `mpicbg/pointdescriptor`):

- `LocalCoordinateSystemPointDescriptor`: a point + its 3 nearest
  neighbors, expressed in a local orthonormal frame built from those
  neighbors — a 6D rotation-invariant vector used by geometric hashing
  (`GeometricHasher`): [|u1|, u2.e1, u2.e2, u3.e1, u3.e2, u3.e3] with
  e1 = u1/|u1|, e2 = gram-schmidt(u2), e3 = e1 x e2.
- `ModelPointDescriptor` + `SubsetMatcher` (RGLDM): descriptor similarity =
  mean residual after the best translation-invariant rigid fit between the
  two neighbor constellations, minimized over neighbor-subset permutations
  (n neighbors + redundancy r).

All functions operate on padded (P,3) point arrays with validity masks and
are fully batched (vmap over points, neighbor subsets precomputed
statically).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp

from spim_registration_tpu.match.neighbors import knn
from spim_registration_tpu.models.affine import fit_rigid


def _local_frame_descriptor(p, n1, n2, n3):
    """6D rotation-invariant descriptor from 3 distance-ordered neighbors."""
    u1 = n1 - p
    u2 = n2 - p
    u3 = n3 - p
    d1 = jnp.linalg.norm(u1) + 1e-12
    e1 = u1 / d1
    v2 = u2 - jnp.dot(u2, e1) * e1
    e2 = v2 / (jnp.linalg.norm(v2) + 1e-12)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([
        d1,
        jnp.dot(u2, e1), jnp.dot(u2, e2),
        jnp.dot(u3, e1), jnp.dot(u3, e2), jnp.dot(u3, e3),
    ])


@partial(jax.jit, static_argnames=())
def local_coordinate_descriptors(points: jnp.ndarray, valid: jnp.ndarray):
    """Geometric-hashing descriptors for every point.

    Returns (desc (P,6) float32, ok (P,) bool). Points with fewer than 3
    valid neighbors (mask too small) are marked invalid.
    """
    idx, dist = knn(points, valid, 3)
    n = points[idx]  # (P, 3, 3)
    desc = jax.vmap(_local_frame_descriptor)(
        points, n[:, 0], n[:, 1], n[:, 2]
    )
    enough = jnp.sum(valid.astype(jnp.int32)) >= 4
    ok = valid & jnp.all(jnp.isfinite(desc), axis=1) & enough \
        & jnp.all(dist < 1e30, axis=1)
    return jnp.where(ok[:, None], desc, 0.0), ok


def neighbor_subsets(num_neighbors: int, redundancy: int):
    """Static list of ordered neighbor index subsets (SubsetMatcher).

    The reference's SubsetMatcher enumerates all ways of choosing
    `num_neighbors` of the nearest `num_neighbors + redundancy`, keeping
    distance order (combinations, not permutations).
    """
    pool = range(num_neighbors + redundancy)
    return tuple(itertools.combinations(pool, num_neighbors))


def _constellation_residual(pa, na, pb, nb):
    """Similarity of two descriptors = mean distance after best rigid
    alignment of constellation (center + neighbors), translation-invariant
    (the rigid fit includes translation, equivalent to the reference's
    translation-invariant model on centered points)."""
    A = jnp.concatenate([pa[None], na], axis=0)
    B = jnp.concatenate([pb[None], nb], axis=0)
    w = jnp.ones(A.shape[0], dtype=A.dtype)
    M = fit_rigid(A, B, w)
    diff = A @ M[:, :3].T + M[:, 3] - B
    return jnp.mean(jnp.sqrt(jnp.sum(diff * diff, axis=-1)))


@partial(jax.jit, static_argnames=("num_neighbors", "redundancy"))
def rgldm_descriptors(points: jnp.ndarray, valid: jnp.ndarray,
                      num_neighbors: int = 3, redundancy: int = 1):
    """Neighbor constellations for RGLDM matching.

    Returns (subsets (P, S, n, 3) neighbor coords per subset, ok (P,)).
    """
    k = num_neighbors + redundancy
    idx, dist = knn(points, valid, k)
    nb = points[idx]  # (P, k, 3)
    subs = neighbor_subsets(num_neighbors, redundancy)
    sub_idx = jnp.asarray(subs, dtype=jnp.int32)  # (S, n)
    constellations = nb[:, sub_idx]  # (P, S, n, 3)
    enough = jnp.sum(valid.astype(jnp.int32)) >= k + 1
    ok = valid & enough & jnp.all(dist < 1e30, axis=1)
    return constellations, ok


def rgldm_similarity_matrix(points_a, const_a, ok_a,
                            points_b, const_b, ok_b):
    """(PA, PB) best-over-subsets constellation residuals.

    Heavy: PA*PB*SA*SB small rigid fits, all batched. Intended for padded
    sizes <= ~1024 per view (the reference matches a few hundred to a few
    thousand beads per view-pair).
    """
    def one_pair(pa, ca, pb, cb):
        def over_b(cb_s):
            def over_a(ca_s):
                return _constellation_residual(pa, ca_s, pb, cb_s)
            return jnp.min(jax.vmap(over_a)(ca))
        return jnp.min(jax.vmap(over_b)(cb))

    def row(pa, ca, oa):
        r = jax.vmap(lambda pb, cb: one_pair(pa, ca, pb, cb))(points_b, const_b)
        r = jnp.where(ok_b & oa, r, jnp.float32(3.4e38))
        return r

    return jax.vmap(row)(points_a, const_a, ok_a)
