"""Closed-form 3D transform model fits, batched and jit-friendly.

All transforms are (3, 4) float32 matrices ``A`` acting on points ``p``
(shape (..., 3), (z, y, x) order) as ``A[:, :3] @ p + A[:, 3]``.

Weighted fits accept per-point weights ``w`` (shape (N,)); masked/padded
point sets are handled by passing weight 0 for padding rows, which keeps
every shape static (TPU requirement).

Reference parity: mpicbg ``TranslationModel3D.fit``, ``RigidModel3D.fit``
(Kabsch/Procrustes via SVD), ``SimilarityModel3D.fit``,
``AffineModel3D.fit`` (weighted least squares). The reference reaches these
through ``Model.fit(matches)`` from RANSAC and the tile optimizer
(SURVEY.md sections 2.4, 2.12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Minimum number of (non-degenerate) point correspondences each model needs.
# Matches mpicbg Model.getMinNumMatches(): translation 1, rigid 3,
# similarity 3, affine 4.
MODEL_MIN_POINTS = {
    "translation": 1,
    "rigid": 3,
    "similarity": 3,
    "affine": 4,
}

_EPS = 1e-12


def identity_affine(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=1
    )


def apply_affine(A: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (3,4) affine to points (..., 3)."""
    return p @ A[:, :3].T + A[:, 3]


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Return the affine equal to applying B first, then A (A ∘ B)."""
    R = A[:, :3] @ B[:, :3]
    t = A[:, :3] @ B[:, 3] + A[:, 3]
    return jnp.concatenate([R, t[:, None]], axis=1)


def invert_affine(A: jnp.ndarray) -> jnp.ndarray:
    Rinv = jnp.linalg.inv(A[:, :3])
    t = -Rinv @ A[:, 3]
    return jnp.concatenate([Rinv, t[:, None]], axis=1)


def residuals(A: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances ||A p - q|| per correspondence."""
    d = apply_affine(A, p) - q
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def _weighted_centroids(p, q, w):
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    cp = jnp.sum(p * w[:, None], axis=0) / wsum
    cq = jnp.sum(q * w[:, None], axis=0) / wsum
    return cp, cq, wsum


def fit_translation(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted translation fit: t = mean(q) - mean(p)."""
    cp, cq, _ = _weighted_centroids(p, q, w)
    return jnp.concatenate(
        [jnp.eye(3, dtype=p.dtype), (cq - cp)[:, None]], axis=1
    )


def _cross_covariance(p, q, w):
    cp, cq, wsum = _weighted_centroids(p, q, w)
    pc = p - cp
    qc = q - cq
    H = (pc * w[:, None]).T @ qc / wsum
    return H, cp, cq, pc, qc, wsum


def _kabsch_rotation(H):
    # SVD-based orthogonal Procrustes with reflection fix.
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=H.dtype)).at[2, 2].set(d)
    return Vt.T @ D @ U.T


def fit_rigid(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid (rotation + translation) fit, Kabsch algorithm."""
    H, cp, cq, _, _, _ = _cross_covariance(p, q, w)
    R = _kabsch_rotation(H)
    t = cq - R @ cp
    return jnp.concatenate([R, t[:, None]], axis=1)


def fit_similarity(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted similarity (uniform scale + rotation + translation) fit."""
    H, cp, cq, pc, qc, wsum = _cross_covariance(p, q, w)
    R = _kabsch_rotation(H)
    var_p = jnp.sum(w[:, None] * pc * pc) / wsum
    # Umeyama scale: s = trace(diag(d) S) / var_p; equivalently sum of the
    # projected covariance. Use trace(R H^T)/var_p which equals it.
    s = jnp.trace(R @ H) / jnp.maximum(var_p, _EPS)
    t = cq - s * (R @ cp)
    return jnp.concatenate([s * R, t[:, None]], axis=1)


def _solve3x3(A, B):
    """Closed-form 3x3 solve X = A^-1 B via the adjugate (Cramer).

    `jnp.linalg.solve` lowers to a batched LU custom call that measured
    26 ms for the 32x1024 hypothesis fits of one matching batch (r5
    xprof — the single largest op); the adjugate is ~40 fused VPU
    multiplies. Degenerate A (det ~ 0, a collinear minimal set) yields
    a huge X exactly like LU's garbage solution — the hypothesis loses
    the RANSAC vote either way, and real fits carry a ridge."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    C00 = e * i - f * h
    C01 = f * g - d * i
    C02 = d * h - e * g
    det = a * C00 + b * C01 + c * C02
    adj = jnp.stack([
        jnp.stack([C00, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([C01, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([C02, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 0, det, _EPS)
    return (adj @ B) * inv_det[..., None, None]


def fit_affine(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted full-affine least-squares fit via normal equations.

    Solves min over A of sum_i w_i ||A [p_i;1] - q_i||^2. Centering first
    keeps the 4x4 normal matrix well conditioned.
    """
    cp, cq, wsum = _weighted_centroids(p, q, w)
    pc = p - cp
    qc = q - cq
    # M = (Qc^T W Pc) (Pc^T W Pc)^-1 with ridge for degenerate minimal sets.
    PtWP = (pc * w[:, None]).T @ pc / wsum
    QtWP = (qc * w[:, None]).T @ pc / wsum
    PtWP = PtWP + 1e-8 * jnp.eye(3, dtype=p.dtype)
    M = _solve3x3(PtWP.T, QtWP.T).T
    t = cq - M @ cp
    return jnp.concatenate([M, t[:, None]], axis=1)


_FITTERS = {
    "translation": fit_translation,
    "rigid": fit_rigid,
    "similarity": fit_similarity,
    "affine": fit_affine,
}


def fit_model(model: str, p: jnp.ndarray, q: jnp.ndarray,
              w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fit the named model; `model` must be a static Python string."""
    if model not in _FITTERS:
        raise ValueError(f"unknown model {model!r}; one of {sorted(_FITTERS)}")
    if w is None:
        w = jnp.ones(p.shape[0], dtype=p.dtype)
    return _FITTERS[model](p, q, w)


def fit_regularized(model: str, reg_model: str, lam: float,
                    p: jnp.ndarray, q: jnp.ndarray,
                    w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Interpolated-model fit: (1-lam)*fit(model) + lam*fit(reg_model).

    Reference parity: mpicbg ``InterpolatedAffineModel3D`` as used by the
    registration GUI's "regularize model" option (e.g. affine regularized
    by rigid with lambda=0.1).
    """
    A = fit_model(model, p, q, w)
    B = fit_model(reg_model, p, q, w)
    return (1.0 - lam) * A + lam * B


def matrix_4x4(A: jnp.ndarray) -> jnp.ndarray:
    """Lift a (3,4) affine to homogeneous (4,4)."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=A.dtype)
    return jnp.concatenate([A, bottom], axis=0)


# vmapped variants for hypothesis batches (used by RANSAC).
fit_translation_batch = jax.vmap(fit_translation)
fit_rigid_batch = jax.vmap(fit_rigid)
fit_similarity_batch = jax.vmap(fit_similarity)
fit_affine_batch = jax.vmap(fit_affine)
