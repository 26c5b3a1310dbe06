"""Batched-hypothesis RANSAC for 3D point-correspondence model fitting.

TPU-native reformulation of mpicbg ``Model.filterRansac`` (used by every
pairwise matcher in the reference; SURVEY.md section 2.4 `RANSACParameters`:
num_iterations ~10k, max_epsilon ~5 px, min_inlier_ratio ~0.1,
min_inlier_factor ~3x model minimum): instead of a sequential
hypothesize-and-test loop, we draw all hypotheses at once, fit them with the
closed-form batched model fits, score them against all candidates on the
VPU, and pick the best — then refit on the inlier set (one round of
iterative reweighting like the reference's final `fit(inliers)`).

Everything is static-shape: candidate sets are padded to a fixed size with a
validity mask, so the whole thing jits and vmaps over many view-pairs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.models import affine as _aff


@dataclasses.dataclass(frozen=True)
class RansacParameters:
    """Mirrors the reference's RANSACParameters defaults."""

    num_hypotheses: int = 1024
    max_epsilon: float = 5.0          # px; reference default 5
    min_inlier_ratio: float = 0.1     # reference default 0.1
    min_inlier_factor: float = 3.0    # inliers >= factor * model min points
    refit_rounds: int = 2             # inlier refit iterations after the vote
    # ADAPTIVE hypothesis count (r5): hypotheses run in chunks under a
    # `lax.while_loop` that stops once the classic criterion
    # N >= log(1 - confidence) / log(1 - w^m) is met for the observed
    # best inlier ratio w — `num_hypotheses` becomes the CAP (the
    # reference's num_iterations is likewise a cap). Static shapes are
    # preserved (each chunk is a fixed-size batch). MEASURED on the
    # bench scene (28 pairs x 256 pts, ~60% inliers, TPU v5e): inlier
    # sets IDENTICAL to the full sweep (28/28) and hypothesis work 8x
    # lower (1 chunk of 128 vs 1024), but the batch wall was 11% SLOWER
    # (0.135 vs 0.120 s; chunk 256/512 identical) — the vmapped
    # while_loop's dynamic control flow costs more than the saved MXU
    # work because RANSAC scoring is not the batch bottleneck. Default
    # therefore OFF; flip on for very large candidate sets where the
    # (H, N) scoring matrix dominates.
    adaptive: bool = False
    hypothesis_chunk: int = 128
    adaptive_confidence: float = 0.999


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RansacResult:
    model: jnp.ndarray        # (3, 4) best-fit affine
    inlier_mask: jnp.ndarray  # (N,) bool over the padded candidate array
    num_inliers: jnp.ndarray  # () int32
    num_candidates: jnp.ndarray  # () int32 (valid candidates)
    mean_error: jnp.ndarray   # () mean residual over inliers
    max_error: jnp.ndarray    # () max residual over inliers
    valid: jnp.ndarray        # () bool — acceptance per reference thresholds


def _sample_indices(key, num_hypotheses, sample_size, num_valid, n_pad):
    """Draw (H, m) candidate indices in [0, num_valid).

    Duplicate indices within a hypothesis are possible but harmless: the
    closed-form fits degrade gracefully and such hypotheses simply lose the
    vote (same effect as mpicbg's resampling-on-degenerate).
    """
    u = jax.random.uniform(key, (num_hypotheses, sample_size))
    idx = jnp.floor(u * jnp.maximum(num_valid, 1).astype(u.dtype)).astype(jnp.int32)
    return jnp.clip(idx, 0, n_pad - 1)


@partial(jax.jit, static_argnames=("model", "params"))
def filter_ransac(
    key: jax.Array,
    p: jnp.ndarray,
    q: jnp.ndarray,
    valid: jnp.ndarray,
    model: str = "affine",
    params: RansacParameters = RansacParameters(),
) -> RansacResult:
    """RANSAC-filter padded candidate correspondences p[i] -> q[i].

    Args:
      key: PRNG key.
      p, q: (N, 3) padded candidate point pairs (z, y, x).
      valid: (N,) bool mask of real (non-padding) candidates.
      model: one of translation/rigid/similarity/affine (static).
      params: RansacParameters (static).

    Returns a RansacResult; `.valid` reproduces the reference's acceptance
    rule (enough inliers in both absolute and ratio terms).
    """
    n_pad = p.shape[0]
    m = _aff.MODEL_MIN_POINTS[model]
    # Sample a couple extra points per hypothesis for stability (mpicbg uses
    # exactly the minimal set; minimal affine sets are often ill-conditioned
    # under our ridge fit, and extra points only help).
    sample = m if model in ("translation",) else m + 1

    wvalid = valid.astype(p.dtype)
    num_valid = jnp.sum(valid.astype(jnp.int32))

    fit_b = {
        "translation": _aff.fit_translation_batch,
        "rigid": _aff.fit_rigid_batch,
        "similarity": _aff.fit_similarity_batch,
        "affine": _aff.fit_affine_batch,
    }[model]

    def _chunk_best(ck, H):
        """Fit + vote H hypotheses; return (best_count, best_model)."""
        idx = _sample_indices(ck, H, sample, num_valid, n_pad)
        hyps = fit_b(p[idx], q[idx], wvalid[idx])       # (H, 3, 4)
        res = jax.vmap(lambda A: _aff.residuals(A, p, q))(hyps)
        inl = (res <= params.max_epsilon) & valid[None, :]
        counts = jnp.sum(inl.astype(jnp.int32), axis=1)
        b = jnp.argmax(counts)
        return counts[b], hyps[b]

    if not params.adaptive:
        best_count, best_model = _chunk_best(key, params.num_hypotheses)
    else:
        C = min(params.hypothesis_chunk, params.num_hypotheses)
        n_chunks = -(-params.num_hypotheses // C)
        log1mp = float(np.log(max(1.0 - params.adaptive_confidence,
                                  1e-12)))

        def cond(st):
            k, bc, _bm = st
            # classic adaptive-RANSAC stop: seen >= log(1-conf)/log(1-w^m)
            w = bc.astype(p.dtype) / jnp.maximum(num_valid, 1).astype(
                p.dtype)
            # f32-safe bounds: 1 - 1e-12 rounds to 1.0f and log(1)=0
            # would make `needed` -inf (loop never runs)
            miss = jnp.clip(1.0 - jnp.maximum(w, 0.0) ** sample,
                            1e-6, 1.0 - 1e-6)
            needed = log1mp / jnp.log(miss)
            return (k < n_chunks) & ((k * C).astype(p.dtype) < needed)

        def body(st):
            k, bc, bm = st
            c, m_ = _chunk_best(jax.random.fold_in(key, k), C)
            better = c > bc
            return (k + 1, jnp.where(better, c, bc),
                    jnp.where(better, m_, bm))

        _, best_count, best_model = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(-1),
                         jnp.zeros((3, 4), p.dtype)))

    inlier_mask = (_aff.residuals(best_model, p, q)
                   <= params.max_epsilon) & valid

    # Refit on inliers (a few rounds of re-thresholding, like the
    # reference's fit-on-inliers + test loop).
    def refit(carry, _):
        mask, _A = carry
        w = mask.astype(p.dtype)
        A = _aff.fit_model(model, p, q, w)
        r = _aff.residuals(A, p, q)
        mask = (r <= params.max_epsilon) & valid
        return (mask, A), None

    (inlier_mask, A), _ = jax.lax.scan(
        refit, (inlier_mask, best_model), None, length=max(params.refit_rounds, 1)
    )

    r = _aff.residuals(A, p, q)
    w_in = inlier_mask.astype(p.dtype)
    n_in = jnp.sum(inlier_mask.astype(jnp.int32))
    mean_err = jnp.sum(r * w_in) / jnp.maximum(n_in, 1).astype(p.dtype)
    max_err = jnp.max(jnp.where(inlier_mask, r, 0.0))

    ok = (
        (n_in >= jnp.int32(params.min_inlier_factor * m))
        & (n_in.astype(p.dtype)
           >= params.min_inlier_ratio * jnp.maximum(num_valid, 1).astype(p.dtype))
        & (num_valid >= m)
    )
    return RansacResult(
        model=A,
        inlier_mask=inlier_mask,
        num_inliers=n_in,
        num_candidates=num_valid,
        mean_error=mean_err,
        max_error=max_err,
        valid=ok,
    )
