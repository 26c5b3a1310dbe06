"""RGLDM two-stage (prefilter + closed-form fits) scaling tests.

VERDICT r1 items 8 / weak 3: the dense PA*PB*SA*SB similarity matrix
exhausted HBM at 28 pairs x 256 points (60 GB allocation on-chip); the
production path prefilters with constellation distance signatures and
evaluates rigid-fit residuals only on top-k candidates.
"""

import numpy as np
import jax.numpy as jnp

from spim_registration_tpu.match.descriptors import (
    rgldm_candidate_scores,
    rgldm_descriptors,
    rgldm_similarity_matrix,
)
from spim_registration_tpu.match.pairwise import (
    PairwiseParameters,
    match_pair,
)
from spim_registration_tpu.utils.simulation import random_rotation


def _rotated_cloud(rng, n, noise=0.02):
    a = rng.uniform(0, 100, size=(n, 3)).astype(np.float32)
    R = random_rotation(rng, 30.0)
    t = rng.uniform(-5, 5, 3)
    b = (a @ R.T + t + rng.normal(0, noise, (n, 3))).astype(np.float32)
    return a, b


def test_topk_scores_match_dense(rng):
    """The top-k path's best candidate equals the dense matrix argmin
    (whenever the prefilter keeps it, which it does for true matches)."""
    a, b = _rotated_cloud(rng, 60)
    pa, va = jnp.asarray(a), jnp.ones(len(a), bool)
    pb, vb = jnp.asarray(b), jnp.ones(len(b), bool)
    ca, oka = rgldm_descriptors(pa, va, 3, 1)
    cb, okb = rgldm_descriptors(pb, vb, 3, 1)
    dense = np.asarray(rgldm_similarity_matrix(pa, ca, oka, pb, cb, okb))
    scores, idx = rgldm_candidate_scores(pa, ca, oka, pb, cb, okb, k=8)
    scores, idx = np.asarray(scores), np.asarray(idx)
    ok = np.asarray(oka)
    agree = 0
    for i in np.nonzero(ok)[0]:
        j_dense = int(dense[i].argmin())
        j_topk = int(idx[i][scores[i].argmin()])
        agree += j_dense == j_topk
    assert agree >= 0.95 * ok.sum(), (agree, int(ok.sum()))


def test_rgldm_match_4096_points(rng):
    """4096 points/view through the full RGLDM pairwise path — the scale
    the dense form could not reach."""
    a, b = _rotated_cloud(rng, 4096, noise=0.05)
    params = PairwiseParameters(method="rgldm", ratio_of_distance=3.0,
                                max_points=4096, prefilter_k=8)
    res = match_pair(a, b, params)
    assert res.valid
    assert res.num_inliers > 2000, res
    # candidate assignment must be the true correspondence (identity)
    good = np.mean(res.inliers[:, 0] == res.inliers[:, 1])
    assert good > 0.99, good
    assert res.mean_error < 0.2


def test_rgldm_prefilter_k_affects_memory_not_result(rng):
    a, b = _rotated_cloud(rng, 200)
    r8 = match_pair(a, b, PairwiseParameters(
        method="rgldm", ratio_of_distance=3.0, max_points=256,
        prefilter_k=8))
    r32 = match_pair(a, b, PairwiseParameters(
        method="rgldm", ratio_of_distance=3.0, max_points=256,
        prefilter_k=32))
    assert r8.valid and r32.valid
    assert abs(r8.num_inliers - r32.num_inliers) <= 4
