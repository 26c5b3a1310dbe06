"""Golden tests: the RL engine vs an independent NumPy port.

VERDICT r1 item 5 / SURVEY.md section 7.3 ("validate per-variant against a
NumPy port"): the XLA engine (`deconv/lucy_richardson.py` — scan over
views, fori_loop over iterations, clamps, Tikhonov, OSEM) is pinned
ELEMENT-WISE against a from-scratch NumPy implementation of the update
rule, for every PSFTYPE variant and both schemes. The port below shares no
code with the engine: convolution, padding, kernel compounding, and the
iteration are re-implemented directly from the update-rule specification
(BayesMVDeconvolution semantics, SURVEY.md section 2.7).

Kernels are random smooth NON-separable, NON-symmetric blobs so that any
mirroring/cropping/centering slip in the engine shows up as an O(1)
mismatch instead of cancelling by symmetry.
"""

from __future__ import annotations

import numpy as np
import numpy.fft as nfft
import pytest

from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    DeconvolutionRunner,
)
from spim_registration_tpu.deconv.lucy_richardson import compound_kernels
from spim_registration_tpu.deconv.prep import DeconvolutionViews

SHAPE = (24, 20, 16)
N_VIEWS = 3
KSHAPE = (7, 5, 7)


def _random_kernel(rng, shape=KSHAPE):
    """Smooth random positive kernel, non-separable and non-symmetric."""
    z, y, x = np.meshgrid(*[np.arange(s) - s // 2 for s in shape],
                          indexing="ij")
    base = np.exp(-0.5 * ((z / 1.6) ** 2 + (y / 1.2) ** 2 + (x / 1.5) ** 2))
    # tilt + asymmetric perturbation to break separability and symmetry
    tilt = np.exp(0.25 * z * y / 4.0 - 0.15 * x * z / 4.0 + 0.1 * y)
    k = base * tilt * (1.0 + 0.3 * rng.uniform(-1, 1, shape))
    k = np.maximum(k, 0.0)
    return k / k.sum()


# ---------------------------------------------------------------------------
# independent NumPy port
# ---------------------------------------------------------------------------

def _fft_size(n):
    m = n
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1


def np_conv(img, kernel, fft_shape):
    """Mirror-boundary same-size convolution, expanded-FFT formulation.

    Re-implemented directly from the specification: expand by kernel
    half-support (mirror boundary, asymmetric lo/hi to reach fft_shape),
    kernel zero-padded with its center circularly shifted to the origin.
    """
    lo = [(fs - s) // 2 for fs, s in zip(fft_shape, img.shape)]
    hi = [fs - s - l for fs, s, l in zip(fft_shape, img.shape, lo)]
    x = np.pad(img, list(zip(lo, hi)), mode="reflect")
    kp = np.zeros(fft_shape)
    kp[: kernel.shape[0], : kernel.shape[1], : kernel.shape[2]] = kernel
    kp = np.roll(kp, [-(s // 2) for s in kernel.shape], axis=(0, 1, 2))
    axes = (0, 1, 2)
    out = nfft.irfftn(nfft.rfftn(x, axes=axes) * nfft.rfftn(kp, axes=axes),
                      fft_shape, axes=axes)
    return out[lo[0]: lo[0] + img.shape[0],
               lo[1]: lo[1] + img.shape[1],
               lo[2]: lo[2] + img.shape[2]]


def np_conv_full_crop(a, b):
    """Full linear convolution of two small kernels, center-cropped to
    a.shape — by direct summation (no FFT), for pinning compound kernels."""
    full = np.zeros([sa + sb - 1 for sa, sb in zip(a.shape, b.shape)])
    for dz in range(b.shape[0]):
        for dy in range(b.shape[1]):
            for dx in range(b.shape[2]):
                full[dz: dz + a.shape[0], dy: dy + a.shape[1],
                     dx: dx + a.shape[2]] += a * b[dz, dy, dx]
    lo = [(f - s) // 2 for f, s in zip(full.shape, a.shape)]
    return full[lo[0]: lo[0] + a.shape[0], lo[1]: lo[1] + a.shape[1],
                lo[2]: lo[2] + a.shape[2]]


def np_compound_kernels(psfs, psf_type):
    """Independent construction of kernel2 per the PSFTYPE ladder."""
    out = []
    for v, p in enumerate(psfs):
        pvm = p[::-1, ::-1, ::-1]
        k2 = pvm.copy()
        if psf_type == "efficient_bayesian":
            for w, pw in enumerate(psfs):
                if w != v:
                    t = np_conv_full_crop(np_conv_full_crop(pvm, pw),
                                          pw[::-1, ::-1, ::-1])
                    k2 = k2 * np.maximum(t, 0.0)
        elif psf_type == "optimization_i":
            for w, pw in enumerate(psfs):
                if w != v:
                    k2 = k2 * np.maximum(np_conv_full_crop(pvm, pw), 0.0)
        elif psf_type == "optimization_ii":
            k2 = k2 * np.maximum(np_conv_full_crop(pvm, p), 0.0)
        elif psf_type != "independent":
            raise ValueError(psf_type)
        k2 = np.maximum(k2, 0.0)
        out.append(k2 / k2.sum())
    return out


def np_rl(images, weights, psfs, psf_type, n_iter, osem, lam, min_value,
          scheme):
    """The whole update rule, straight from the specification."""
    images = images.astype(np.float64)
    weights = weights.astype(np.float64)
    k2s = np_compound_kernels(psfs, psf_type)
    shapes = [p.shape for p in psfs] + [k.shape for k in k2s]
    max_k = tuple(max(s[d] for s in shapes) for d in range(3))
    fft_shape = tuple(_fft_size(i + 2 * (k // 2))
                      for i, k in zip(images.shape[1:], max_k))

    wsum = weights.sum(axis=0)
    avg = float((images * weights).sum() / max(wsum.sum(), 1e-9))
    psi = (images * weights).sum(axis=0)
    psi = np.where(wsum > 1e-9, psi / np.maximum(wsum, 1e-9), avg)
    floor = min_value * avg
    psi = np.maximum(psi, floor)

    def reg(p):
        if lam is not None:
            p = p / (1.0 + lam * p)
        return np.maximum(p, floor)

    for _ in range(n_iter):
        if scheme == "sequential":
            for v in range(len(psfs)):
                conv1 = np_conv(psi, psfs[v], fft_shape)
                q = np.clip(images[v] / np.maximum(conv1, 1e-12), 0.0, 1e4)
                conv2 = np_conv(q, k2s[v], fft_shape)
                psi = psi * (1.0 + osem * weights[v] * (conv2 - 1.0))
                psi = reg(psi)
        else:  # parallel
            factor = 1.0
            for v in range(len(psfs)):
                conv1 = np_conv(psi, psfs[v], fft_shape)
                q = np.clip(images[v] / np.maximum(conv1, 1e-12), 0.0, 1e4)
                conv2 = np_conv(q, k2s[v], fft_shape)
                factor = factor + weights[v] * (conv2 - 1.0)
            psi = reg(psi * factor)
    return psi


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    psfs = [_random_kernel(rng) for _ in range(N_VIEWS)]
    truth = np.zeros(SHAPE, np.float64)
    for _ in range(25):
        z, y, x = [rng.integers(3, s - 3) for s in SHAPE]
        truth[z, y, x] = rng.uniform(0.5, 2.0)
    fft_shape = tuple(_fft_size(i + 2 * (k // 2))
                      for i, k in zip(SHAPE, KSHAPE))
    images = np.stack([np_conv(truth, p, fft_shape) + 0.01 for p in psfs])
    w = rng.uniform(0.2, 1.0, size=(N_VIEWS,) + SHAPE)
    weights = w / w.sum(axis=0)
    return (images.astype(np.float32), weights.astype(np.float32),
            [p.astype(np.float32) for p in psfs])


ALL_VARIANTS = ["independent", "efficient_bayesian", "optimization_i",
                "optimization_ii"]


@pytest.mark.parametrize("psf_type", ALL_VARIANTS)
def test_compound_kernels_match_direct_construction(problem, psf_type):
    _, _, psfs = problem
    engine = compound_kernels(psfs, psf_type)
    port = np_compound_kernels([p.astype(np.float64) for p in psfs],
                               psf_type)
    assert len(engine) == len(port)
    for e, p in zip(engine, port):
        np.testing.assert_allclose(e, p, rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("psf_type", ALL_VARIANTS)
@pytest.mark.parametrize("scheme", ["sequential", "parallel"])
def test_engine_matches_numpy_port(problem, psf_type, scheme):
    images, weights, psfs = problem
    params = DeconvolutionParameters(
        num_iterations=3, psf_type=psf_type, scheme=scheme,
        osem_factor=1.5, tikhonov_lambda=0.0006, min_value=0.0001,
        conv_backend="fft")
    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=1.5)
    engine = np.asarray(DeconvolutionRunner(prep, params).run())
    port = np_rl(images, weights,
                 [p.astype(np.float64) for p in psfs],
                 psf_type, 3, 1.5, 0.0006, 0.0001, scheme)
    scale = float(port.max())
    np.testing.assert_allclose(engine, port, rtol=0, atol=2e-3 * scale)


def test_engine_matches_numpy_port_no_tikhonov(problem):
    images, weights, psfs = problem
    params = DeconvolutionParameters(
        num_iterations=2, psf_type="efficient_bayesian", scheme="sequential",
        osem_factor=2.0, tikhonov_lambda=0.0, min_value=0.0001)
    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=2.0)
    engine = np.asarray(DeconvolutionRunner(prep, params).run())
    port = np_rl(images, weights, [p.astype(np.float64) for p in psfs],
                 "efficient_bayesian", 2, 2.0, None, 0.0001, "sequential")
    scale = float(port.max())
    np.testing.assert_allclose(engine, port, rtol=0, atol=2e-3 * scale)
