"""Global view alignment (SURVEY.md sections 2.4 GlobalOpt, 7 step 6)."""

from spim_registration_tpu.solve.global_opt import (  # noqa: F401
    GlobalOptParameters,
    GlobalOptResult,
    PairMatches,
    solve_global,
)
from spim_registration_tpu.solve.optimization_types import (  # noqa: F401
    all_to_all_pairs,
    all_to_all_pairs_with_range,
    individual_timepoint_pairs,
    reference_timepoint_pairs,
)
