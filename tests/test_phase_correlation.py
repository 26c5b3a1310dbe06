"""Phase-correlation translation initializer tests."""

import numpy as np

from spim_registration_tpu.ops.phase_correlation import (
    phase_correlation_shift,
    translation_from_shift,
)
from spim_registration_tpu.utils.simulation import render_beads


def test_integer_shift_recovered(rng):
    pts = rng.uniform(10, 54, (40, 3))
    a = render_beads(pts, (64, 64, 64), 1.5)
    true = np.array([5, -3, 7])
    b = render_beads(pts - true, (64, 64, 64), 1.5)
    shift, score = phase_correlation_shift(a, b, subpixel=False)
    np.testing.assert_allclose(shift, true, atol=0.5)
    assert score > 0.5


def test_subpixel_shift(rng):
    pts = rng.uniform(10, 54, (40, 3))
    a = render_beads(pts, (64, 64, 64), 1.5)
    true = np.array([2.4, -1.6, 3.3])
    b = render_beads(pts - true, (64, 64, 64), 1.5)
    shift, _ = phase_correlation_shift(a, b)
    np.testing.assert_allclose(shift, true, atol=0.25)


def test_shift_with_noise_and_partial_overlap(rng):
    pts = rng.uniform(5, 90, (120, 3))
    a = render_beads(pts, (96, 96, 96), 1.5)
    true = np.array([20, 0, -15])
    b = render_beads(pts - true, (96, 96, 96), 1.5)
    a = a + rng.normal(0, 0.02, a.shape).astype(np.float32)
    b = b + rng.normal(0, 0.02, b.shape).astype(np.float32)
    shift, score = phase_correlation_shift(a, b, subpixel=False)
    np.testing.assert_allclose(shift, true, atol=0.5)
    A = translation_from_shift(shift)
    assert A.shape == (3, 4)
