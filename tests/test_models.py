"""Unit tests for transform model fits and batched RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spim_registration_tpu.models import (
    RansacParameters,
    apply_affine,
    compose,
    filter_ransac,
    fit_model,
    identity_affine,
    invert_affine,
    residuals,
)


def random_rigid(rng):
    # random rotation via QR
    M = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(M)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 10
    return np.concatenate([Q, t[:, None]], axis=1).astype(np.float32)


def random_affine(rng):
    M = np.eye(3) + 0.2 * rng.normal(size=(3, 3))
    t = rng.normal(size=3) * 10
    return np.concatenate([M, t[:, None]], axis=1).astype(np.float32)


@pytest.mark.parametrize("model", ["translation", "rigid", "similarity", "affine"])
def test_exact_recovery(rng, model):
    p = rng.uniform(0, 100, size=(50, 3)).astype(np.float32)
    if model == "translation":
        A = identity_affine()
        A = np.asarray(A).copy()
        A[:, 3] = rng.normal(size=3) * 5
    elif model == "rigid":
        A = random_rigid(rng)
    elif model == "similarity":
        A = random_rigid(rng)
        A = (A * np.array([[1.7, 1.7, 1.7, 1.0]])).astype(np.float32)
    else:
        A = random_affine(rng)
    q = np.asarray(apply_affine(jnp.asarray(A), jnp.asarray(p)))
    fit = fit_model(model, jnp.asarray(p), jnp.asarray(q))
    r = residuals(fit, jnp.asarray(p), jnp.asarray(q))
    # float32 centroid accumulation bounds accuracy at ~1e-4 of coordinate
    # magnitude; sub-0.05-px is far below registration tolerance.
    assert float(jnp.max(r)) < 5e-2


def test_weighted_fit_ignores_zero_weight_rows(rng):
    p = rng.uniform(0, 100, size=(30, 3)).astype(np.float32)
    A = random_rigid(rng)
    q = np.asarray(apply_affine(jnp.asarray(A), jnp.asarray(p)))
    # corrupt last 10 rows, weight them 0
    q2 = q.copy()
    q2[20:] += 500.0
    w = np.ones(30, dtype=np.float32)
    w[20:] = 0.0
    fit = fit_model("rigid", jnp.asarray(p), jnp.asarray(q2), jnp.asarray(w))
    r = residuals(fit, jnp.asarray(p[:20]), jnp.asarray(q[:20]))
    assert float(jnp.max(r)) < 1e-2


def test_compose_invert(rng):
    A = jnp.asarray(random_affine(rng))
    B = jnp.asarray(random_affine(rng))
    p = jnp.asarray(rng.uniform(0, 50, size=(7, 3)).astype(np.float32))
    ab = apply_affine(compose(A, B), p)
    ref = apply_affine(A, apply_affine(B, p))
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ref), atol=1e-3)
    inv = invert_affine(A)
    np.testing.assert_allclose(
        np.asarray(apply_affine(inv, apply_affine(A, p))), np.asarray(p),
        atol=1e-3,
    )


@pytest.mark.parametrize("model", ["rigid", "affine"])
def test_ransac_recovers_under_outliers(rng, model):
    n_inlier, n_outlier, n_pad = 60, 40, 128
    p_in = rng.uniform(0, 200, size=(n_inlier, 3))
    A = random_rigid(rng) if model == "rigid" else random_affine(rng)
    q_in = np.array(apply_affine(jnp.asarray(A), jnp.asarray(p_in, dtype=np.float32)))
    q_in += rng.normal(size=q_in.shape) * 0.3  # sub-px noise
    p_out = rng.uniform(0, 200, size=(n_outlier, 3))
    q_out = rng.uniform(0, 200, size=(n_outlier, 3))

    p = np.zeros((n_pad, 3), np.float32)
    q = np.zeros((n_pad, 3), np.float32)
    valid = np.zeros(n_pad, bool)
    p[:n_inlier], q[:n_inlier] = p_in, q_in
    p[n_inlier:n_inlier + n_outlier] = p_out
    q[n_inlier:n_inlier + n_outlier] = q_out
    valid[: n_inlier + n_outlier] = True

    res = filter_ransac(
        jax.random.PRNGKey(0), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(valid), model=model,
        params=RansacParameters(num_hypotheses=512, max_epsilon=2.0),
    )
    assert bool(res.valid)
    assert int(res.num_inliers) >= n_inlier - 3
    # recovered transform maps inliers correctly
    r = residuals(res.model, jnp.asarray(p[:n_inlier]), jnp.asarray(q[:n_inlier]))
    assert float(jnp.mean(r)) < 1.0
    # outliers rejected
    mask = np.asarray(res.inlier_mask)
    assert mask[n_inlier:n_inlier + n_outlier].sum() <= 2


def test_ransac_rejects_pure_noise(rng):
    n_pad = 128
    p = rng.uniform(0, 200, size=(n_pad, 3)).astype(np.float32)
    q = rng.uniform(0, 200, size=(n_pad, 3)).astype(np.float32)
    valid = np.ones(n_pad, bool)
    res = filter_ransac(
        jax.random.PRNGKey(1), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(valid), model="rigid",
        params=RansacParameters(num_hypotheses=256, max_epsilon=1.0),
    )
    # acceptance rule should fail: <10% inliers
    assert not bool(res.valid)


def test_ransac_adaptive_matches_full_sweep(rng):
    """Adaptive (chunked while_loop, early stop at the classic
    confidence criterion) finds the same consensus as the full
    hypothesis sweep on outlier-contaminated correspondences."""
    import dataclasses

    import jax

    from spim_registration_tpu.models.ransac import (
        RansacParameters,
        filter_ransac,
    )

    N = 96
    p = rng.uniform(0, 50, (N, 3)).astype(np.float32)
    A = np.array([[1, 0, 0, 2.0], [0, 1, 0, -1.0], [0, 0, 1, 0.5]],
                 np.float32)
    q = (p @ A[:, :3].T + A[:, 3]).astype(np.float32)
    q[:30] += rng.uniform(-25, 25, (30, 3)).astype(np.float32)
    q[30:] += rng.normal(0, 0.02, (N - 30, 3)).astype(np.float32)
    valid = np.ones(N, bool)
    key = jax.random.PRNGKey(1)
    base = RansacParameters()
    full = filter_ransac(key, jnp.asarray(p), jnp.asarray(q),
                         jnp.asarray(valid), "affine", base)
    adpt = filter_ransac(key, jnp.asarray(p), jnp.asarray(q),
                         jnp.asarray(valid), "affine",
                         dataclasses.replace(base, adaptive=True))
    assert bool(full.valid) and bool(adpt.valid)
    np.testing.assert_array_equal(np.asarray(full.inlier_mask),
                                  np.asarray(adpt.inlier_mask))
    np.testing.assert_allclose(np.asarray(full.model),
                               np.asarray(adpt.model), atol=1e-4)
