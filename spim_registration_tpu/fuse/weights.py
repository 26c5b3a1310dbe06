"""Per-view fusion weights: boundary blending and content-based.

Reference parity (SURVEY.md section 2.5, `spim/process/fusion/weights/`):

- `Blending`: cosine ramp to 0 near the view boundary. For each view-space
  coordinate, the distance to each of the 6 faces (minus a border offset)
  feeds a half-cosine ramp over `blending_range` px; the per-axis factors
  multiply. Defaults border=0, range=40 in Gen-2 deconv prep, ~15 for
  fusion — we default 15.
- `ContentBased`: local information measure = Gaussian(sigma2) of the
  squared residual (I - Gaussian(sigma1) I)^2 — an approximation of local
  entropy (reference sigmas ~20/40 at full res).

Weights are evaluated in VIEW coordinates; the fusion loop hands us the
same view-space sample positions it uses for image interpolation.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spim_registration_tpu.ops.gaussian import gaussian_blur_3d


@dataclasses.dataclass(frozen=True)
class BlendingParameters:
    border: tuple = (0.0, 0.0, 0.0)    # inset of the ramp start, per axis
    blending_range: tuple = (15.0, 15.0, 15.0)  # ramp width in px, per axis


@dataclasses.dataclass(frozen=True)
class ContentBasedParameters:
    sigma1: float = 20.0
    sigma2: float = 40.0


def blending_weight(view_coords: jnp.ndarray, view_size,
                    params: BlendingParameters = BlendingParameters()
                    ) -> jnp.ndarray:
    """Blending weight at view-space positions (..., 3) for a view of
    `view_size` (z, y, x). Returns (...,) in [0, 1]."""
    w = jnp.ones(view_coords.shape[:-1], dtype=view_coords.dtype)
    for ax in range(3):
        c = view_coords[..., ax]
        dist = jnp.minimum(c, view_size[ax] - 1 - c) - params.border[ax]
        rng = jnp.maximum(params.blending_range[ax], 1e-6)
        frac = jnp.clip(dist / rng, 0.0, 1.0)
        ramp = 0.5 * (1.0 - jnp.cos(frac * jnp.pi))
        ramp = jnp.where(dist <= 0.0, 0.0, ramp)
        w = w * ramp
    return w


def content_based_weight(vol: jnp.ndarray,
                         params: ContentBasedParameters = ContentBasedParameters()
                         ) -> jnp.ndarray:
    """Content-based weight volume in VIEW space (sampled by fusion like
    the image itself)."""
    s1 = (params.sigma1,) * 3
    s2 = (params.sigma2,) * 3
    approx = gaussian_blur_3d(vol, s1)
    resid = (vol - approx) ** 2
    entropy = gaussian_blur_3d(resid, s2)
    return entropy / jnp.maximum(jnp.max(entropy), 1e-12)
