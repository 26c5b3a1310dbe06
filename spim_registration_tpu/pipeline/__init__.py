"""Stage orchestration (SURVEY.md section 7 step 9)."""

from spim_registration_tpu.pipeline.run import (  # noqa: F401
    RegistrationConfig,
    RegistrationResult,
    register_views,
)
