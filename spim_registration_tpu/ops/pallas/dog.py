"""Fused Difference-of-Gaussian Pallas TPU kernel (alternative backend).

The detection hot op (SURVEY.md sections 2.3/2.8: the reference offloads
exactly this to CUDA via `CUDASeparableConvolution`). This kernel computes
BOTH blurs and their difference in one pass over the volume: each
(z, y)-slab's input window (with halos) is DMA'd to VMEM once, convolved
along z, y, x for both kernels with unrolled static-literal tap loops on
the VPU, and the DoG tile written once.

MEASURED (v5e, 256^3, sigma 1.8/2.26, forced-sync timing): this VPU
tap-loop kernel runs ~4.1 ms/iter while the default XLA path
(`ops.gaussian`'s banded-matmul formulation, which XLA fuses onto the MXU)
runs ~0.79 ms/iter (~21 Gvox/s). The XLA path therefore REMAINS the
default; this kernel is kept as an alternative backend and as the
blocked-DMA pattern template.

Mosaic alignment rules shape the layout: HBM slices must respect the
(8, 128) tiling of the last two dims, so
- x is never sliced: the input is padded to a 128-multiple width and each
  DMA copies full rows;
- y halos are rounded up to a multiple of 8 (extra taps have zero weight
  and are skipped in the unrolled loop);
- z (leading dim) slices freely.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.gaussian import gaussian_kernel_1d, mirror_pad


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _conv_axis_taps(x, kernel, axis, out_len):
    """Valid conv along `axis` as a sum of shifted static slices (VPU).

    `kernel` is a host numpy array; taps become float literals baked into
    the unrolled kernel body (Pallas kernels cannot capture array
    constants). Zero taps (alignment padding) cost nothing.
    """
    acc = None
    for t in range(kernel.shape[0]):
        w = float(kernel[t])
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + out_len)
        term = x[tuple(sl)] * w
        acc = term if acc is None else acc + term
    return acc


def _pad_kernel_to(k: np.ndarray, r: int) -> np.ndarray:
    kr = (k.shape[0] - 1) // 2
    if kr < r:
        k = np.pad(np.asarray(k), (r - kr, r - kr))
    return np.asarray(k, np.float32)


@partial(jax.jit, static_argnames=("sigma1", "sigma2", "bz", "by",
                                   "interpret"))
def dog_pallas(vol: jnp.ndarray, sigma1, sigma2,
               bz: int = 8, by: int = 64,
               interpret: bool = False) -> jnp.ndarray:
    """Fused DoG; numerically matches `difference_of_gaussian`.

    sigma1/sigma2: scalar or per-axis (sz, sy, sx) static floats.
    interpret=True runs in interpreter mode (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s1 = (sigma1,) * 3 if not isinstance(sigma1, tuple) else sigma1
    s2 = (sigma2,) * 3 if not isinstance(sigma2, tuple) else sigma2
    k1 = [gaussian_kernel_1d(float(s)) for s in s1]
    k2 = [gaussian_kernel_1d(float(s)) for s in s2]
    radii = [(max(a.shape[0], b.shape[0]) - 1) // 2
             for a, b in zip(k1, k2)]
    rz, ry, rx = radii
    ry_al = _round_up(ry, 8)  # aligned y halo

    Z, Y, X = vol.shape
    bz = min(bz, Z)
    by = min(_round_up(by, 8), _round_up(Y, 8))
    nz = math.ceil(Z / bz)
    ny = math.ceil(Y / by)
    Zc, Yc = nz * bz, ny * by
    X_out = _round_up(X, 128)
    X_in = _round_up(X_out + 2 * rx, 128)

    k1j = tuple(_pad_kernel_to(k, r)
                for k, r in zip(k1, (rz, ry_al, rx)))
    k2j = tuple(_pad_kernel_to(k, r)
                for k, r in zip(k2, (rz, ry_al, rx)))

    v = vol.astype(jnp.float32)
    v = mirror_pad(mirror_pad(mirror_pad(v, rz, 0), ry_al, 1), rx, 2)
    # round tiled axes up to block/alignment multiples (edge padding; the
    # excess output region is cropped away)
    v = jnp.pad(v, ((0, Zc - Z), (0, Yc - Y),
                    (0, X_in - (X + 2 * rx))), mode="edge")

    def _taps(k):
        return [(t, float(k[t])) for t in range(k.shape[0])
                if float(k[t]) != 0.0]

    def kernel(vol_hbm, out_ref, in_s, a_s, b_s, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            vol_hbm.at[pl.ds(i * bz, bz + 2 * rz),
                       pl.ds(j * by, by + 2 * ry_al), :],
            in_s,
            sem,
        )
        dma.start()
        dma.wait()

        # Explicit scratch accumulation (one live temporary per statement)
        # keeps the Mosaic VMEM stack small; a fully functional tap-sum
        # chain kept every term alive and blew the 16 MB scoped limit.
        for which, ks in enumerate((k1j, k2j)):
            for n, (t, w) in enumerate(_taps(ks[0])):
                term = in_s[t:t + bz] * w
                if n == 0:
                    a_s[:] = term
                else:
                    a_s[:] += term
            for n, (t, w) in enumerate(_taps(ks[1])):
                term = a_s[:, t:t + by] * w
                if n == 0:
                    b_s[:] = term
                else:
                    b_s[:] += term
            for n, (t, w) in enumerate(_taps(ks[2])):
                term = b_s[:, :, t:t + X_out] * w
                if which == 0 and n == 0:
                    out_ref[:] = term
                elif which == 0:
                    out_ref[:] += term
                else:
                    out_ref[:] -= term

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Zc, Yc, X_out), jnp.float32),
        grid=(nz, ny),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bz, by, X_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * rz, by + 2 * ry_al, X_in), jnp.float32),
            pltpu.VMEM((bz, by + 2 * ry_al, X_in), jnp.float32),
            pltpu.VMEM((bz, by, X_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(v)
    return out[:Z, :Y, :X]
