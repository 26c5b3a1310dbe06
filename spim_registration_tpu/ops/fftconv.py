"""FFT-based 3D convolution — the deconvolution hot kernel.

Reference parity: ImgLib2 `FFTConvolution` and the CUDA
`CUDAFourierConvolution` JNA bridge (`convolve3DCUDA`), SURVEY.md sections
2.7/2.8. TPU-native design: real-to-complex FFTs via XLA (`jnp.fft.rfftn`),
kernel FFTs precomputed once per deconvolution run and kept on device
(the reference re-uploads arrays over JNA every block — we never leave HBM).

Padding semantics follow the reference: the image is expanded by the kernel
half-support (mirror boundary), the kernel is zero-padded to the expanded
size and circularly shifted so its center sits at the origin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.gaussian import mirror_pad


def _fft_size(n: int) -> int:
    """Next FFT-friendly size (products of 2,3,5 — XLA handles these well)."""
    if n <= 1:
        return 1
    m = n
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1


# XLA-TPU's c2r inverse FFT (irfftn) with an innermost (real/halved)
# axis of 288 is NONDETERMINISTIC on transforms above ~22M elements:
# identical input, same executable, repeat-diff up to 0.46 (white
# spectrum) — measured r4/r5, examples/fft_determinism_probe.py. Every
# OTHER tested innermost size (256, 270, 300, 320, 360, 384, 400, 432,
# 480, 512, 576, 640) bit-repeats at 30M elements, as do all forward
# rfftn transforms. Policy: skip blocklisted innermost sizes above the
# threshold — for 256^3 + 33-tap kernels this bumps 288 -> 300 (+4%
# innermost-axis cost) and makes the exact-FFT engine bit-deterministic
# at the deployment shape (the accuracy gate runs at 256^3 since r5).
_IRFFT_BAD_INNERMOST = frozenset({288})
_IRFFT_DET_THRESHOLD = 16_000_000
# Sizes whose XLA-TPU FFT lowering is measured SLOW on every axis at
# large transforms (r5, examples/fft_determinism_probe.py region):
# 288^3-class roundtrips at 26.8 ms vs 300^3 at 16.0 ms (-40%!), and
# 576^3 at 190.8 vs 600^3 at 173.7 — skipping them is both the
# determinism fix AND a speed win (the exact-FFT engine gained 14%
# from the innermost skip alone, more with the all-axes skip).
_FFT_SLOW_SIZES = frozenset({288, 576})


def fft_shape_for(lengths) -> tuple:
    """FFT-friendly sizes for already-padded lengths: above the
    size threshold, skip measured-slow sizes on every axis and
    nondeterministic innermost sizes (see notes above)."""
    dims = [_fft_size(n) for n in lengths]
    total = int(np.prod(dims))
    if total > _IRFFT_DET_THRESHOLD:
        for d in range(len(dims)):
            bad = (_FFT_SLOW_SIZES | _IRFFT_BAD_INNERMOST
                   if d == len(dims) - 1 else _FFT_SLOW_SIZES)
            while dims[d] in bad:
                dims[d] = _fft_size(dims[d] + 1)
    return tuple(dims)


def pad_shape_for(img_shape, kernel_shape):
    """Expanded FFT shape: image + kernel support, rounded to friendly
    sizes (innermost axis restricted to bit-deterministic sizes for
    large transforms — see `fft_shape_for`)."""
    return fft_shape_for(
        [i + 2 * (k // 2) for i, k in zip(img_shape, kernel_shape)])


def prepare_kernel_fft(kernel: jnp.ndarray, fft_shape) -> jnp.ndarray:
    """Zero-pad kernel to fft_shape, circular-shift center to origin, rfftn."""
    pads = [(0, s - k) for s, k in zip(fft_shape, kernel.shape)]
    kp = jnp.pad(kernel, pads)
    shifts = [-(k // 2) for k in kernel.shape]
    kp = jnp.roll(kp, shifts, axis=(0, 1, 2))
    return jnp.fft.rfftn(kp)


@partial(jax.jit, static_argnames=("img_shape", "lo_pads"))
def _conv_padded(img_pad: jnp.ndarray, kfft: jnp.ndarray, img_shape,
                 lo_pads) -> jnp.ndarray:
    f = jnp.fft.rfftn(img_pad)
    out = jnp.fft.irfftn(f * kfft, s=img_pad.shape)
    sl = tuple(slice(lo, lo + n) for lo, n in zip(lo_pads, img_shape))
    return out[sl].astype(img_pad.dtype)


def fft_convolve(img: jnp.ndarray, kernel: jnp.ndarray,
                 kernel_fft: jnp.ndarray | None = None,
                 fft_shape=None, boundary: str = "mirror") -> jnp.ndarray:
    """Convolve img with kernel (same-size output).

    If `kernel_fft`/`fft_shape` are provided (precomputed via
    `prepare_kernel_fft(kernel, pad_shape_for(img.shape, kernel.shape))`),
    the kernel transform is reused — the per-iteration path in RL.
    """
    if fft_shape is None:
        fft_shape = pad_shape_for(img.shape, kernel.shape)
    if kernel_fft is None:
        kernel_fft = prepare_kernel_fft(kernel.astype(jnp.float32), fft_shape)

    lo = [(fs - s) // 2 for fs, s in zip(fft_shape, img.shape)]
    hi = [fs - s - l for fs, s, l in zip(fft_shape, img.shape, lo)]
    x = img
    for ax in range(3):
        if lo[ax] == 0 and hi[ax] == 0:
            continue
        if boundary == "mirror":
            pad = max(lo[ax], hi[ax])
            x = mirror_pad(x, pad, ax)
            sl = [slice(None)] * 3
            sl[ax] = slice(pad - lo[ax], pad - lo[ax] + img.shape[ax]
                           + lo[ax] + hi[ax])
            x = x[tuple(sl)]
        else:
            widths = [(0, 0)] * 3
            widths[ax] = (lo[ax], hi[ax])
            x = jnp.pad(x, widths)
    return _conv_padded(x, kernel_fft, img.shape, tuple(lo))


def direct_convolve(img: jnp.ndarray, kernel: jnp.ndarray,
                    boundary: str = "mirror") -> jnp.ndarray:
    """Direct 3D convolution via `lax.conv_general_dilated` (XLA lowers to
    MXU matmuls on TPU). For small PSFs (~15^3) this can beat the FFT path;
    the RL engine exposes it as `conv_backend='direct'`.
    """
    r = [k // 2 for k in kernel.shape]
    x = img
    for ax in range(3):
        if boundary == "mirror":
            x = mirror_pad(x, r[ax], ax)
        else:
            widths = [(0, 0)] * 3
            widths[ax] = (r[ax], r[ax])
            x = jnp.pad(x, widths)
    lhs = x[None, None]
    # conv_general_dilated computes correlation; flip for convolution
    rhs = jnp.flip(kernel, (0, 1, 2))[None, None]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1, 1), padding="VALID",
        preferred_element_type=jnp.float32)
    return out[0, 0].astype(img.dtype)


def direct_convolve_np(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """O(N*K) reference twin for tests (scipy-free)."""
    from numpy.lib.stride_tricks import sliding_window_view

    r = [k // 2 for k in kernel.shape]
    pad = np.pad(img, [(r[0], kernel.shape[0] - 1 - r[0]),
                       (r[1], kernel.shape[1] - 1 - r[1]),
                       (r[2], kernel.shape[2] - 1 - r[2])], mode="reflect")
    win = sliding_window_view(pad, kernel.shape)
    kf = kernel[::-1, ::-1, ::-1]
    return np.einsum("zyxijk,ijk->zyx", win, kf)
