"""Low-rank separable 3D convolution — the MXU-native conv backend.

TPU-first design note (no reference analog): the reference convolves with
measured PSFs via FFT (cuFFT / `FFTConvolution`; SURVEY.md section 2.8).
On TPU, FFTs are transpose/memory-bound while banded conv-matrix matmuls
run near MXU speed (see `ops/gaussian.py`, PERF.md). Measured bead PSFs
are near-separable (a perfect Gaussian is exactly rank 1), so we offer:

    kernel  ~=  sum_{r<R}  a_r (x) b_r (x) c_r     (CP / canonical form)

computed by greedy rank-1 deflation with alternating power iterations,
and convolve as R separable 3-axis passes, each a banded matmul. For the
RL engine this replaces a ~2 ms FFT conv with ~0.1 ms of matmuls when the
PSF admits a low-rank form (`DeconvolutionParameters.conv_backend`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.gaussian import conv_axis_valid, mirror_pad


def lowrank_decompose(kernel: np.ndarray, rank: int,
                      n_iter: int = 500, tol: float = 1e-12
                      ) -> Tuple[np.ndarray, np.ndarray,
                                 np.ndarray, float]:
    """Greedy CP decomposition of a 3D kernel.

    Returns (az, ay, ax) with shapes (R, kz), (R, ky), (R, kx) — the CP
    weight is folded into az — plus the relative Frobenius error of the
    reconstruction. Greedy rank-1 deflation (alternating power iteration)
    initializes the factors; joint CP-ALS sweeps refine them (greedy
    deflation alone is not optimal for rank > 1).
    """
    K = np.asarray(kernel, np.float64)
    kz, ky, kx = K.shape
    azs, ays, axs = [], [], []
    resid = K.copy()
    norm0 = np.linalg.norm(K) or 1.0
    for _ in range(rank):
        # init from the dominant separable structure of the residual
        a = np.abs(resid).sum(axis=(1, 2))
        b = np.abs(resid).sum(axis=(0, 2))
        c = np.abs(resid).sum(axis=(0, 1))
        for arr in (a, b, c):
            n = np.linalg.norm(arr)
            if n > 0:
                arr /= n
        for _ in range(n_iter):
            a = np.einsum("zyx,y,x->z", resid, b, c)
            na = np.linalg.norm(a)
            if na == 0:
                break
            a /= na
            b = np.einsum("zyx,z,x->y", resid, a, c)
            b /= np.linalg.norm(b) or 1.0
            c = np.einsum("zyx,z,y->x", resid, a, b)
            nc = np.linalg.norm(c)
            if nc == 0:
                break
            c /= nc
        w = float(np.einsum("zyx,z,y,x->", resid, a, b, c))
        azs.append(w * a)
        ays.append(b)
        axs.append(c)
        resid = resid - w * np.einsum("z,y,x->zyx", a, b, c)

    # joint ALS refinement over all R terms (factors as (k, R) matrices)
    A = np.stack(azs, axis=1)
    B = np.stack(ays, axis=1)
    C = np.stack(axs, axis=1)
    prev = np.inf
    for _ in range(n_iter):
        A = _als_update(K, B, C, mode=0)
        B = _als_update(K, A, C, mode=1)
        C = _als_update(K, A, B, mode=2)
        err = np.linalg.norm(
            K - np.einsum("zr,yr,xr->zyx", A, B, C)) / norm0
        if prev - err < tol:
            break
        prev = err
    recon = np.einsum("zr,yr,xr->zyx", A, B, C)
    err = float(np.linalg.norm(K - recon) / norm0)
    return (A.T.astype(np.float32), B.T.astype(np.float32),
            C.T.astype(np.float32), err)


def _als_update(K: np.ndarray, F1: np.ndarray, F2: np.ndarray,
                mode: int) -> np.ndarray:
    """One CP-ALS step: least-squares factor for `mode` given the others.

    F1/F2 are the factors of the other two modes IN AXIS ORDER (e.g. for
    mode=1, F1 is the z factor and F2 the x factor)."""
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[mode]
    Km = np.transpose(K, order).reshape(K.shape[mode], -1)
    # Khatri-Rao product of the other factors, rows ordered to match Km
    R = F1.shape[1]
    KR = (F1[:, None, :] * F2[None, :, :]).reshape(-1, R)
    G = (F1.T @ F1) * (F2.T @ F2)
    return Km @ KR @ np.linalg.pinv(G)


def conv_separable_lowrank(vol: jnp.ndarray, az: jnp.ndarray,
                           ay: jnp.ndarray, ax: jnp.ndarray) -> jnp.ndarray:
    """Same-size mirror-boundary CONVOLUTION with a sum-of-separable kernel.

    az/ay/ax: (R, taps) per-axis factor banks (odd taps) — CP factors of
    the kernel itself (`lowrank_decompose`). The R rank-1 passes vmap into
    batched matmuls; XLA keeps them on the MXU.

    `conv_axis_valid` computes correlation (out[i] = sum_j x[i+j] k[j]);
    true convolution needs each 1D factor flipped. Gaussian factors are
    symmetric so this is invisible for them — it matters for measured /
    rotated PSFs (regression-tested with asymmetric kernels).
    """
    az = jnp.flip(az, axis=1)
    ay = jnp.flip(ay, axis=1)
    ax = jnp.flip(ax, axis=1)

    def one_term(kz, ky, kx):
        out = vol
        for axis, k in enumerate((kz, ky, kx)):
            r = (k.shape[0] - 1) // 2
            if r > 0:
                out = conv_axis_valid(mirror_pad(out, r, axis), k, axis)
            else:
                out = out * k[0]
        return out

    terms = jax.vmap(one_term)(az, ay, ax)
    return jnp.sum(terms, axis=0)


def decompose_for_rl(kernel: np.ndarray, rank: int,
                     max_error: float = 0.05, adapt_tol: float = 5e-4):
    """Decompose an RL kernel; raise if the low-rank form is too lossy.

    Rank is ADAPTIVE: the smallest rank r <= `rank` whose relative error
    is <= `adapt_tol` is used (a Gaussian PSF and every pointwise/conv
    combination of axis-aligned Gaussians is exactly rank 1, so the RL
    compound kernels usually collapse to one separable pass — 3x fewer
    matmuls than a fixed rank-3 bank). If no rank meets `adapt_tol`, the
    full requested rank is kept and only `max_error` gates acceptance.

    RL kernels must keep total mass: the reconstruction is renormalized so
    its sum matches the kernel's (preserving flux in the multiplicative
    update)."""
    az = ay = ax = None
    err = np.inf
    for r in range(1, rank + 1):
        az, ay, ax, err = lowrank_decompose(kernel, r)
        if err <= adapt_tol:
            break
    if err > max_error:
        raise ValueError(
            f"PSF rank-{rank} separable approximation too lossy "
            f"(rel err {err:.3f} > {max_error}); use conv_backend='fft' "
            f"or raise psf_rank")
    total = float(np.asarray(kernel, np.float64).sum())
    approx = float(sum(
        az[r].sum() * ay[r].sum() * ax[r].sum() for r in range(az.shape[0])))
    if abs(approx) > 1e-12:
        az = az * (total / approx)
    return az, ay, ax, err
