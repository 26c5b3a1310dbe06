"""Pairwise view matching: descriptors -> candidates -> RANSAC -> inliers.

Reference parity (SURVEY.md section 2.4): `GeometricHashingPairwise` /
`RGLDMPairwise` / `PairwiseMatch`. A pair = (viewA points, viewB points);
candidate correspondences come from descriptor matching with a
best-vs-second-best ratio test, then `filter_ransac` keeps the inliers and
the fitted model. All device work is static-shape; the host only compacts
results.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.match.descriptors import (
    local_coordinate_descriptors,
    rgldm_candidate_scores,
    rgldm_descriptors,
)
from spim_registration_tpu.models.ransac import (
    RansacParameters,
    RansacResult,
    filter_ransac,
)

MatchingMethod = Literal["geometric_hashing", "rgldm"]

_INF = jnp.float32(3.4e38)


@dataclasses.dataclass(frozen=True)
class PairwiseParameters:
    """Matching knobs (GeometricHashingParameters / RGLDMParameters).

    ratio_of_distance: best descriptor distance must be this factor smaller
    than the second best (reference defaults: 10 for geometric hashing,
    3 for RGLDM).
    """

    method: MatchingMethod = "geometric_hashing"
    model: str = "affine"
    ratio_of_distance: float = 10.0
    difference_threshold: float = 3.4e37  # absolute descriptor distance cap
    num_neighbors: int = 3
    redundancy: int = 1
    ransac: RansacParameters = RansacParameters()
    max_points: int = 1024  # padded per-view point budget on device
    # RGLDM: rigid-fit residuals are evaluated only against this many
    # signature-prefiltered candidates per point (memory O(P*k*S^2)
    # instead of O(P^2*S^2) — scales to 4096+ points per view)
    prefilter_k: int = 16


@dataclasses.dataclass
class PairwiseResult:
    """Host-side compacted result of one view-pair match."""

    model: np.ndarray              # (3,4) B<-A affine (maps A points onto B)
    candidates: np.ndarray         # (C,2) int indices (idxA, idxB)
    inliers: np.ndarray            # (I,2) int indices (idxA, idxB)
    num_candidates: int
    num_inliers: int
    mean_error: float
    max_error: float
    valid: bool

    def __repr__(self):
        pct = 100.0 * self.num_inliers / max(self.num_candidates, 1)
        return (f"PairwiseResult({self.num_candidates} candidates -> "
                f"{self.num_inliers} inliers ({pct:.0f}%), "
                f"err {self.mean_error:.3f}/{self.max_error:.3f} px, "
                f"valid={self.valid})")


def _pad(points: np.ndarray, n: int):
    p = np.zeros((n, 3), np.float32)
    v = np.zeros(n, bool)
    m = min(len(points), n)
    p[:m] = points[:m]
    v[:m] = True
    return jnp.asarray(p), jnp.asarray(v)


@partial(jax.jit, static_argnames=("params",))
def _candidates_geometric_hashing(pa, va, pb, vb, params: PairwiseParameters):
    da, oka = local_coordinate_descriptors(pa, va)
    db, okb = local_coordinate_descriptors(pb, vb)
    # descriptor-space distances (PA, PB)
    d2 = (jnp.sum(da * da, axis=1)[:, None]
          + jnp.sum(db * db, axis=1)[None, :] - 2.0 * (da @ db.T))
    d2 = jnp.where(okb[None, :], jnp.maximum(d2, 0.0), _INF)
    d2 = jnp.where(oka[:, None], d2, _INF)
    neg, idx = jax.lax.top_k(-d2, 2)
    best, second = -neg[:, 0], -neg[:, 1]
    j = idx[:, 0]
    # ratio test on distances (not squared), like the reference's
    # Matcher.getBestMatch best*ratio < secondBest comparison.
    bd = jnp.sqrt(jnp.maximum(best, 0.0))
    sd = jnp.sqrt(jnp.maximum(second, 0.0))
    ok = (oka
          & (bd * params.ratio_of_distance <= sd)
          & (bd < params.difference_threshold))
    return j.astype(jnp.int32), ok


@partial(jax.jit, static_argnames=("params",))
def _candidates_rgldm(pa, va, pb, vb, params: PairwiseParameters):
    ca, oka = rgldm_descriptors(pa, va, params.num_neighbors, params.redundancy)
    cb, okb = rgldm_descriptors(pb, vb, params.num_neighbors, params.redundancy)
    scores, cand_idx = rgldm_candidate_scores(
        pa, ca, oka, pb, cb, okb, k=max(params.prefilter_k, 2))
    neg, kbest = jax.lax.top_k(-scores, 2)
    best, second = -neg[:, 0], -neg[:, 1]
    j = jnp.take_along_axis(cand_idx, kbest[:, :1], axis=1)[:, 0]
    ok = (oka
          & (best * params.ratio_of_distance <= second)
          & (best < params.difference_threshold))
    return j.astype(jnp.int32), ok


@partial(jax.jit, static_argnames=("params",))
def _match_device(key, pa, va, pb, vb, params: PairwiseParameters):
    if params.method == "geometric_hashing":
        j, ok = _candidates_geometric_hashing(pa, va, pb, vb, params)
    elif params.method == "rgldm":
        j, ok = _candidates_rgldm(pa, va, pb, vb, params)
    else:
        raise ValueError(f"unknown matching method {params.method!r}")
    # candidate arrays, padded over A points
    qa = pa
    qb = pb[j]
    res = filter_ransac(key, qa, qb, ok, model=params.model,
                        params=params.ransac)
    return j, ok, res


def match_pair(points_a: np.ndarray, points_b: np.ndarray,
               params: PairwiseParameters = PairwiseParameters(),
               seed: int = 0) -> PairwiseResult:
    """Match two views' interest points; returns compacted PairwiseResult.

    The returned model maps view-A point coordinates onto view B.
    """
    n = params.max_points
    pa, va = _pad(points_a, n)
    pb, vb = _pad(points_b, n)
    j, ok, res = _match_device(jax.random.PRNGKey(seed), pa, va, pb, vb,
                               params)
    # one transfer for all result fields (each scalar read is a full
    # dispatch round trip on the remote-TPU tunnel)
    j, ok, res = jax.device_get((j, ok, res))
    inl = res.inlier_mask
    ia = np.nonzero(ok)[0]
    cand = np.stack([ia, j[ia]], axis=1)
    ii = np.nonzero(inl)[0]
    inliers = np.stack([ii, j[ii]], axis=1)
    return PairwiseResult(
        model=res.model,
        candidates=cand,
        inliers=inliers,
        num_candidates=int(res.num_candidates),
        num_inliers=int(res.num_inliers),
        mean_error=float(res.mean_error),
        max_error=float(res.max_error),
        valid=bool(res.valid),
    )
