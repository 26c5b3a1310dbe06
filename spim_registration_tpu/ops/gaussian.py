"""Separable 3D Gaussian smoothing and Difference-of-Gaussian.

The detection hot path (reference: ImgLib1 `DifferenceOfGaussianReal1` /
`GaussianConvolutionReal` and the CUDA `CUDASeparableConvolution` bridge,
SURVEY.md sections 2.3 and 2.8). TPU-native design: each axis convolution is
expressed as a matmul of the (flattened other-axes x axis) view with a
banded convolution matrix so it lands on the MXU; XLA fuses the three
passes. Mirror ("reflect without repeating the edge sample") boundary
handling matches the reference's `OutOfBoundsStrategyMirrorFactory`.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, dtype=np.float32) -> np.ndarray:
    """Sampled, normalized 1D Gaussian. Radius matches ImgLib's
    `Util.createGaussianKernel1DDouble`: radius = max(3, 2*ceil(3 sigma)+1)//2."""
    if sigma <= 0:
        return np.ones((1,), dtype=dtype)
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return k.astype(dtype)


def mirror_pad(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """Mirror padding without repeating the edge sample (ImgLib 'single
    boundary' mirror)."""
    if pad == 0:
        return x
    n = x.shape[axis]
    if pad > n - 1:
        # fall back to symmetric tiling for very small axes
        reps = int(math.ceil(pad / max(n - 1, 1))) + 1
        for _ in range(reps):
            x = mirror_pad(x, min(pad, x.shape[axis] - 1), axis)
            if x.shape[axis] >= n + 2 * pad:
                break
        sl = [slice(None)] * x.ndim
        start = (x.shape[axis] - (n + 2 * pad)) // 2
        sl[axis] = slice(start, start + n + 2 * pad)
        return x[tuple(sl)]
    lo = jax.lax.slice_in_dim(x, 1, pad + 1, axis=axis)
    hi = jax.lax.slice_in_dim(x, n - pad - 1, n - 1, axis=axis)
    return jnp.concatenate(
        [jnp.flip(lo, axis=axis), x, jnp.flip(hi, axis=axis)], axis=axis
    )


def conv_axis_valid(x: jnp.ndarray, kernel: jnp.ndarray, axis: int,
                    accum_dtype=None) -> jnp.ndarray:
    """'valid' 1D convolution along `axis` via a banded conv-matrix matmul.

    Input length n_in, kernel 2r+1 -> output n_in - 2r. The conv matrix C
    (n_out, n_in), C[i, i+j] = k[j], is a static constant folded by XLA and
    the contraction lands on the MXU — one big matmul per axis.

    `accum_dtype` overrides the matmul accumulation type (bf16 inputs
    with float32 accumulation run the MXU at full rate without the
    accumulation error); the output is in accum_dtype when given.

    This is also the halo-consuming building block of the sharded path:
    a block with h >= r halo rows convolves to its interior exactly.
    """
    r = (kernel.shape[0] - 1) // 2
    n_in = x.shape[axis]
    n_out = n_in - 2 * r
    i = jnp.arange(n_out)[:, None]
    j = jnp.arange(n_in)[None, :]
    band = j - i  # valid taps at 0..2r
    C = jnp.where(
        (band >= 0) & (band <= 2 * r),
        kernel[jnp.clip(band, 0, 2 * r)],
        0.0,
    ).astype(x.dtype)
    xm = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...p,np->...n", xm, C,
                     preferred_element_type=accum_dtype or x.dtype)
    return jnp.moveaxis(out, -1, axis)


def _conv_axis_matmul(x: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """'same'-size convolution with mirror boundary (pad then valid)."""
    r = (kernel.shape[0] - 1) // 2
    xp = mirror_pad(x, r, axis)
    return conv_axis_valid(xp, kernel, axis)


@partial(jax.jit, static_argnames=("sigmas",))
def gaussian_blur_3d(vol: jnp.ndarray, sigmas) -> jnp.ndarray:
    """Separable Gaussian blur; `sigmas` = (sz, sy, sx) static floats."""
    out = vol
    for axis, s in enumerate(sigmas):
        k = jnp.asarray(gaussian_kernel_1d(float(s)), dtype=vol.dtype)
        if k.shape[0] > 1:
            out = _conv_axis_matmul(out, k, axis)
    return out


def dog_sigmas(sigma: float, threshold: float, k: float | None = None,
               steps_per_octave: int = 4):
    """Reproduce the reference's DoG parameterization.

    ImgLib1 `DifferenceOfGaussianPeak` detection uses sigma1 = sigma and
    sigma2 = sigma * k with k = 2^(1/steps), and normalizes the DoG response
    by K_MIN1_INV = 1/(k-1) (so thresholds are comparable across k).
    Returns (sigma1, sigma2, norm).
    """
    if k is None:
        k = 2.0 ** (1.0 / steps_per_octave)
    return sigma, sigma * k, 1.0 / (k - 1.0)


@partial(jax.jit, static_argnames=("sigma1", "sigma2"))
def difference_of_gaussian_bf16(vol: jnp.ndarray, sigma1,
                                sigma2) -> jnp.ndarray:
    """DoG with bf16 matmul INPUTS at full MXU rate — restructured so no
    large-value cancellation ever happens in reduced precision:

        DoG = Z1 Y1 (X1-X2) + Z1 (Y1-Y2) X2 + (Z1-Z2) Y2 X2

    (telescoping; convs along different axes commute). Each chain
    applies its DIFFERENCE kernel FIRST, so every intermediate is
    already DoG-scale (bandpass-small) rather than image-scale — the
    naive bf16 g1-g2 would cancel two large blurs and lose the entire
    response to rounding. Accumulation is float32
    (preferred_element_type); inputs re-round to bf16 per pass, so the
    error floor is the input quantization (relative ~2^-9 of the LOCAL
    image value — dim marginal peaks on dark backgrounds are barely
    touched). 9 banded matmuls instead of 6, at 2x MXU rate and half
    the HBM bytes. Returns float32.
    """
    s1 = sigma1 if isinstance(sigma1, tuple) else (sigma1,) * 3
    s2 = sigma2 if isinstance(sigma2, tuple) else (sigma2,) * 3
    ks1 = [np.asarray(gaussian_kernel_1d(float(s), np.float64))
           for s in s1]
    ks2 = [np.asarray(gaussian_kernel_1d(float(s), np.float64))
           for s in s2]

    def diff_kernel(a, b):  # a - b, centered on the longer support
        if a.shape[0] < b.shape[0]:
            p = (b.shape[0] - a.shape[0]) // 2
            a = np.pad(a, (p, p))
        elif b.shape[0] < a.shape[0]:
            p = (a.shape[0] - b.shape[0]) // 2
            b = np.pad(b, (p, p))
        return a - b

    bf = jnp.bfloat16

    def conv(x, k_np, axis):
        k = jnp.asarray(k_np, bf)
        if k.shape[0] == 1:
            return (x.astype(jnp.float32) * jnp.float32(k_np[0])
                    if k_np[0] != 1.0 else x.astype(jnp.float32))
        r = (k.shape[0] - 1) // 2
        return conv_axis_valid(mirror_pad(x.astype(bf), r, axis), k,
                               axis, accum_dtype=jnp.float32)

    dkz, dky, dkx = (diff_kernel(a, b) for a, b in zip(ks1, ks2))
    v = vol.astype(bf)
    c = conv(v, ks2[2], 2)                       # X2 v   (image-scale)
    t3 = conv(conv(c, ks2[1], 1), dkz, 0)        # dZ Y2 X2 v
    t2 = conv(conv(c, dky, 1), ks1[0], 0)        # Z1 dY X2 v
    a1 = conv(v, dkx, 2)                         # dX v   (DoG-scale)
    t1 = conv(conv(a1, ks1[1], 1), ks1[0], 0)    # Z1 Y1 dX v
    return (t1 + t2 + t3).astype(jnp.float32)


@partial(jax.jit, static_argnames=("sigma1", "sigma2"))
def difference_of_gaussian(vol: jnp.ndarray, sigma1, sigma2) -> jnp.ndarray:
    """DoG response = blur(sigma1) - blur(sigma2) (bright blobs positive).

    sigma1 < sigma2; each may be a scalar or per-axis (sz, sy, sx) tuple.
    """
    s1 = sigma1 if isinstance(sigma1, tuple) else (sigma1,) * 3
    s2 = sigma2 if isinstance(sigma2, tuple) else (sigma2,) * 3
    g1 = gaussian_blur_3d(vol, s1)
    g2 = gaussian_blur_3d(vol, s2)
    return g1 - g2
