"""Descriptor-based correspondence finding (SURVEY.md sections 2.4, 2.6)."""

from spim_registration_tpu.match.pairwise import (  # noqa: F401
    MatchingMethod,
    PairwiseParameters,
    PairwiseResult,
    match_pair,
)
