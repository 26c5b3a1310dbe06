"""Headless detection-parameter tuning.

Reference parity: the `InteractiveDoG` live slider window (SURVEY.md
section 2.3) — replaced by a batch sweep: one device program evaluates the
DoG response once per sigma and counts peaks for a grid of thresholds, so
a user (or auto-tuner) can pick parameters without a GUI.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.extrema import find_peaks, local_extrema_mask
from spim_registration_tpu.ops.gaussian import difference_of_gaussian, dog_sigmas


def sweep_detection(vol: np.ndarray,
                    sigmas: Sequence[float] = (1.4, 1.8, 2.2, 2.8),
                    thresholds: Sequence[float] = (0.002, 0.005, 0.008,
                                                   0.012, 0.02),
                    normalize: bool = True) -> Dict[Tuple[float, float], int]:
    """Peak counts for every (sigma, threshold) combination."""
    v = jnp.asarray(vol, jnp.float32)
    if normalize:
        lo, hi = jnp.min(v), jnp.max(v)
        v = (v - lo) / jnp.maximum(hi - lo, 1e-12)
    counts = []
    for s in sigmas:
        s1, s2, norm = dog_sigmas(float(s), 0.0)
        dog = difference_of_gaussian(v, s1, s2) * jnp.float32(norm)
        mask = local_extrema_mask(dog)
        resp = jnp.where(mask, dog, 0.0)
        counts.append(jnp.stack([jnp.sum(resp >= t) for t in thresholds]))
    # single device->host transfer for the whole grid (each scalar read
    # costs a full dispatch round trip on the remote-TPU tunnel)
    grid = np.asarray(jnp.stack(counts))
    out: Dict[Tuple[float, float], int] = {}
    for i, s in enumerate(sigmas):
        for k, t in enumerate(thresholds):
            out[(float(s), float(t))] = int(grid[i, k])
    return out


def suggest_threshold(vol: np.ndarray, sigma: float = 1.8,
                      expected_points: int | None = None,
                      quantile: float = 0.999) -> float:
    """Suggest a threshold: either the response level yielding roughly
    `expected_points` peaks, or a high quantile of the extremum responses
    (robust to the noise floor)."""
    v = jnp.asarray(vol, jnp.float32)
    lo, hi = jnp.min(v), jnp.max(v)
    v = (v - lo) / jnp.maximum(hi - lo, 1e-12)
    s1, s2, norm = dog_sigmas(float(sigma), 0.0)
    dog = difference_of_gaussian(v, s1, s2) * jnp.float32(norm)
    mask = local_extrema_mask(dog)
    resp = np.asarray(jnp.where(mask, dog, 0.0)).ravel()
    resp = resp[resp > 0]
    if len(resp) == 0:
        return 0.0
    if expected_points is not None and expected_points < len(resp):
        return float(np.partition(resp, -expected_points)[-expected_points])
    return float(np.quantile(resp, quantile))
