"""Multi-view Richardson-Lucy deconvolution (SURVEY.md section 2.7)."""

from spim_registration_tpu.deconv.lucy_richardson import (  # noqa: F401
    DeconvolutionParameters,
    DeconvolutionRunner,
    PSFType,
    deconvolve,
)
from spim_registration_tpu.deconv.prep import (  # noqa: F401
    DeconvolutionViews,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.deconv.psf import (  # noqa: F401
    condition_psf,
    extract_psf,
    gaussian_psf,
)
from spim_registration_tpu.deconv.prep_streamed import (  # noqa: F401
    prepare_views_streamed,
)
from spim_registration_tpu.deconv.blocked import (  # noqa: F401
    ArrayStore,
    BlockedDeconvolutionInputs,
    BlockedDeconvolutionRunner,
)
