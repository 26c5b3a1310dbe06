"""Interest-point detection (DoG / DoM) — SURVEY.md sections 2.3, 2.10."""

from spim_registration_tpu.detect.dog import (  # noqa: F401
    DoGParameters,
    detect_beads,
)
from spim_registration_tpu.detect.dom import (  # noqa: F401
    DoMParameters,
    detect_beads_dom,
)
