"""TPU-native multi-view SPIM registration / fusion / deconvolution framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
PreibischLab/SPIM_Registration (Fiji plugin suite; see SURVEY.md):

- interest-point (bead) detection via Difference-of-Gaussian / Difference-of-Mean
- rotation-invariant geometric descriptor matching + batched RANSAC
- global view alignment as a pose-graph solved by Gauss-Newton
- weighted-average / content-based fusion
- multi-view Richardson-Lucy deconvolution (Efficient Bayesian / OSEM variants)
- multi-chip sharding over a `jax.sharding.Mesh` with halo exchange

Conventions used throughout:
- volumes are arrays indexed (z, y, x)
- point coordinates are float (z, y, x) in voxel units of the *full-resolution*
  view image (downsampling during detection is undone before points are stored)
- affine transforms are (3, 4) row-major matrices mapping homogeneous
  (z, y, x, 1) *view* coordinates into *world/output* coordinates
"""

__version__ = "0.1.0"

from spim_registration_tpu.core.dataset import (  # noqa: F401
    Dataset,
    ViewDescription,
    ViewId,
)
