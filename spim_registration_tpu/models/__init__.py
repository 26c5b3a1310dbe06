"""Geometric transform models (the mpicbg.models analog, reimplemented).

Closed-form, batched (vmap-friendly) fits for 3D translation / rigid /
similarity / affine models, plus transform-chain utilities.

Reference parity: mpicbg `TranslationModel3D`, `RigidModel3D`,
`AffineModel3D` and their `fit(...)` methods (external dependency of the
reference; see SURVEY.md section 2.12).
"""

from spim_registration_tpu.models.affine import (  # noqa: F401
    MODEL_MIN_POINTS,
    apply_affine,
    compose,
    fit_affine,
    fit_model,
    fit_rigid,
    fit_similarity,
    fit_translation,
    identity_affine,
    invert_affine,
    residuals,
)
from spim_registration_tpu.models.ransac import (  # noqa: F401
    RansacParameters,
    RansacResult,
    filter_ransac,
)
