"""Deconvolution input preparation.

Reference parity: `ProcessForDeconvolution#fuseStacksAndGetPSFs` (call
stack 3.4): transform each view + its blending weights into the bounding
box grid, normalize the per-voxel weight sum across views, and compute the
OSEM acceleration factor (average number of views covering a voxel).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.fuse.weights import BlendingParameters, blending_weight
from spim_registration_tpu.models.affine import apply_affine
from spim_registration_tpu.ops.resample import output_grid_coords, trilinear_sample


@dataclasses.dataclass
class DeconvolutionViews:
    """Aligned inputs for the RL engine: everything on the bbox grid."""

    images: np.ndarray    # (V, Z, Y, X) transformed view images
    weights: np.ndarray   # (V, Z, Y, X) normalized weights (sum_v <= 1)
    psfs: List[np.ndarray]  # per-view world-oriented PSFs
    osem_factor: float    # OSEM speedup (avg overlapping views)
    # optional per-view exact CP factor banks (az, ay, ax) of `psfs` —
    # from condition_psf(return_factors=True); the lowrank conv backend
    # uses them verbatim instead of re-deriving a CP decomposition
    psf_factors: Optional[List] = None


def prepare_views_for_deconvolution(
    volumes: Sequence[np.ndarray],
    models: Sequence[np.ndarray],
    psfs: Sequence[np.ndarray],
    bbox: BoundingBox,
    blending: BlendingParameters = BlendingParameters(
        border=(0.0, 0.0, 0.0), blending_range=(40.0, 40.0, 40.0)),
    osem_factor: Optional[float] = None,
) -> DeconvolutionViews:
    """Transform views + weights into the bbox grid (reference defaults use
    a wider 40 px blending ramp for deconvolution)."""
    out_shape = bbox.shape
    grid = output_grid_coords(out_shape, dtype=jnp.float32)
    grid = grid + jnp.asarray(bbox.min, jnp.float32)

    imgs, ws = [], []
    for vol, model in zip(volumes, models):
        A4 = np.vstack([np.asarray(model, np.float64), [0, 0, 0, 1]])
        inv = jnp.asarray(np.linalg.inv(A4)[:3], jnp.float32)
        vc = apply_affine(inv, grid)
        vals, inside = trilinear_sample(jnp.asarray(vol, jnp.float32), vc)
        w = inside.astype(jnp.float32) * blending_weight(
            vc, vol.shape, blending)
        imgs.append(np.asarray(vals))
        ws.append(np.asarray(w))

    images = np.stack(imgs)
    weights = np.stack(ws)
    wsum = weights.sum(axis=0)
    # normalize so weights of overlapping views sum to 1 where covered
    weights = np.where(wsum > 1e-9, weights / np.maximum(wsum, 1e-9), 0.0)

    if osem_factor is None:
        covered = (np.stack(ws) > 1e-9).sum(axis=0)
        osem_factor = float(covered[covered > 0].mean()) if np.any(covered > 0) else 1.0

    return DeconvolutionViews(
        images=images.astype(np.float32),
        weights=weights.astype(np.float32),
        psfs=[np.asarray(p, np.float32) for p in psfs],
        osem_factor=osem_factor,
    )
