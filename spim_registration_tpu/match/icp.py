"""Iterative Closest Point refinement for nearly-aligned views.

Reference parity: `icp/IterativeClosestPointPairwise` +
`IterativeClosestPointParameters` (SURVEY.md section 2.4; defaults:
max distance ~5 px, max ~100 iterations): repeatedly assign each point of
A to its nearest neighbor in B within `max_distance`, fit the model to the
assignments, transform, until the mean residual stops improving.

TPU-native: the assignment step is the batched cross kNN (MXU distance
matrix); the whole refinement is a `lax.while_loop` on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.match.neighbors import cross_knn
from spim_registration_tpu.models.affine import apply_affine, fit_model


@dataclasses.dataclass(frozen=True)
class ICPParameters:
    model: str = "affine"
    max_distance: float = 5.0
    max_iterations: int = 100
    min_delta: float = 1e-4   # stop when mean error improves less than this


@partial(jax.jit, static_argnames=("params",))
def _icp_device(pa, va, pb, vb, init, params: ICPParameters):
    def assign(cur):
        moved = apply_affine(cur, pa)
        idx, dist = cross_knn(moved, va, pb, vb, 1)
        idx = idx[:, 0]
        dist = dist[:, 0]
        ok = va & (dist <= params.max_distance)
        return idx, ok, moved

    def body(state):
        it, cur, prev_err, _done = state
        idx, ok, _m = assign(cur)
        w = ok.astype(pa.dtype)
        A = fit_model(params.model, pa, pb[idx], w)
        moved = apply_affine(A, pa)
        d = jnp.linalg.norm(moved - pb[idx], axis=1)
        n = jnp.maximum(jnp.sum(w), 1.0)
        err = jnp.sum(d * w) / n
        done = jnp.abs(prev_err - err) < params.min_delta
        return it + 1, A, err, done

    def cond(state):
        it, _cur, _err, done = state
        return (it < params.max_iterations) & jnp.logical_not(done)

    it, A, err, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init, jnp.float32(jnp.inf),
                     jnp.bool_(False)))
    idx, ok, _ = assign(A)
    return A, idx, ok, err, it


def icp_refine(points_a: np.ndarray, points_b: np.ndarray,
               initial_model: np.ndarray | None = None,
               params: ICPParameters = ICPParameters(),
               max_points: int = 1024):
    """Refine the A->B transform by ICP; A is assumed roughly aligned.

    Returns (model (3,4), matches (K,2) index pairs, mean_error, iters).
    """
    n = max_points
    pa = np.zeros((n, 3), np.float32)
    pb = np.zeros((n, 3), np.float32)
    va = np.zeros(n, bool)
    vb = np.zeros(n, bool)
    ma, mb = min(len(points_a), n), min(len(points_b), n)
    pa[:ma], va[:ma] = points_a[:ma], True
    pb[:mb], vb[:mb] = points_b[:mb], True
    init = (np.asarray(initial_model, np.float32)
            if initial_model is not None
            else np.concatenate([np.eye(3), np.zeros((3, 1))],
                                axis=1).astype(np.float32))
    out = _icp_device(
        jnp.asarray(pa), jnp.asarray(va), jnp.asarray(pb), jnp.asarray(vb),
        jnp.asarray(init), params)
    # one transfer for all outputs (scalar reads are full round trips
    # on the remote-TPU tunnel)
    A, idx, ok, err, it = jax.device_get(out)
    ia = np.nonzero(ok)[0]
    matches = np.stack([ia, idx[ia]], axis=1)
    return A, matches, float(err), int(it)
