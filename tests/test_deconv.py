"""Multi-view RL deconvolution tests on synthetic data."""

import numpy as np
import pytest

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    deconvolve,
    extract_psf,
    gaussian_psf,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.ops.fftconv import direct_convolve_np

from synth import render_beads


def _make_scene(rng, shape=(48, 48, 48), n_beads=25):
    pts = rng.uniform(10, shape[0] - 10, size=(n_beads, 3))
    truth = render_beads(pts, shape, sigma=1.2)
    # two views blurred with anisotropic PSFs along different axes
    psf_a = gaussian_psf((13, 13, 13), (3.0, 1.0, 1.0))
    psf_b = gaussian_psf((13, 13, 13), (1.0, 1.0, 3.0))
    va = direct_convolve_np(truth, psf_a).astype(np.float32)
    vb = direct_convolve_np(truth, psf_b).astype(np.float32)
    return truth, [va, vb], [psf_a, psf_b], pts


def _nrmse(a, b):
    return np.sqrt(np.mean((a - b) ** 2)) / (b.max() - b.min())


@pytest.mark.parametrize("psf_type", ["independent", "efficient_bayesian",
                                      "optimization_i", "optimization_ii"])
def test_deconvolution_improves_views(rng, psf_type):
    truth, views, psfs, _ = _make_scene(rng)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), truth.shape)
    prep = prepare_views_for_deconvolution(views, [ident, ident], psfs, bbox)
    out = deconvolve(prep, DeconvolutionParameters(
        num_iterations=12, psf_type=psf_type))
    base = _nrmse(np.mean(views, axis=0), truth)
    err = _nrmse(out, truth)
    assert err < base * 0.75, (psf_type, err, base)


def test_efficient_bayesian_converges_faster_than_independent(rng):
    """The 2014 paper's headline property: fewer iterations to equal
    quality (we check: at equal iterations, EB error <= independent)."""
    truth, views, psfs, _ = _make_scene(rng)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), truth.shape)
    prep = prepare_views_for_deconvolution(views, [ident, ident], psfs, bbox)
    errs = {}
    for t in ("independent", "efficient_bayesian"):
        out = deconvolve(prep, DeconvolutionParameters(
            num_iterations=8, psf_type=t, tikhonov_lambda=0.0))
        errs[t] = _nrmse(out, truth)
    assert errs["efficient_bayesian"] <= errs["independent"] * 1.02, errs


def test_psf_extraction_recovers_gaussian(rng):
    shape = (64, 64, 64)
    # well-separated beads (>=16 px apart) so patches don't contaminate
    grid = np.array([[z, y, x] for z in (16, 40) for y in (16, 40)
                     for x in (16, 40)], float)
    pts = grid + rng.integers(-3, 4, size=grid.shape)
    psf_true = gaussian_psf((15, 15, 15), (2.5, 1.2, 1.2))
    truth = np.zeros(shape, np.float32)
    for p in pts.astype(int):
        truth[p[0], p[1], p[2]] = 1.0
    vol = direct_convolve_np(truth, psf_true).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    psf_est, n = extract_psf(vol, ident, pts, psf_shape=(15, 15, 15))
    assert n == len(pts)
    corr = np.corrcoef(psf_est.ravel(), psf_true.ravel())[0, 1]
    assert corr > 0.99, corr


def test_prep_weights_normalized(rng):
    vol = rng.uniform(0.1, 1.0, (32, 32, 32)).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (32, 32, 32))
    psf = gaussian_psf((9, 9, 9))
    prep = prepare_views_for_deconvolution([vol, vol], [ident, ident],
                                           [psf, psf], bbox)
    wsum = prep.weights.sum(axis=0)
    assert np.all(wsum <= 1.0 + 1e-5)
    interior = wsum[8:-8, 8:-8, 8:-8]
    assert np.allclose(interior, 1.0, atol=1e-5)
    assert 1.0 <= prep.osem_factor <= 2.0
