"""Fusion: bounding boxes, weights, weighted-average (SURVEY.md section 2.5)."""

from spim_registration_tpu.fuse.bounding_box import (  # noqa: F401
    bounding_box_from_points,
    intersect_bounding_box,
    maximal_bounding_box,
)
from spim_registration_tpu.fuse.weighted_avg import (  # noqa: F401
    FusionParameters,
    fuse_views,
)
from spim_registration_tpu.fuse.weights import (  # noqa: F401
    BlendingParameters,
    ContentBasedParameters,
    blending_weight,
    content_based_weight,
)
