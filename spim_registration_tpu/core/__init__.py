"""Dataset model, interest-point store, XML/manifest IO, checkpointing.

The analog of the reference's L2 layer (`spim/fiji/spimdata/`, SURVEY.md
section 2.1): the dataset object is the single source of truth between
pipeline stages, and saving it after every stage IS the checkpoint system.
"""

from spim_registration_tpu.core.dataset import (  # noqa: F401
    BoundingBox,
    Dataset,
    InterestPoints,
    ViewDescription,
    ViewId,
    ViewTransform,
)
