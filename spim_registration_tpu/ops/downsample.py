"""Downsampling for detection (per-axis powers of two).

Reference parity: `spim/process/interestpointdetection/Downsample.java` —
each halving step averages 2 adjacent samples along one axis (not a strided
subsample), and x/y/z factors are chosen independently (the GUI's
"downsample XY / Z" options; SURVEY.md section 2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _halve_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    n = x.shape[axis] - (x.shape[axis] % 2)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, n)
    x = x[tuple(sl)]
    a = jax.lax.slice_in_dim(x, 0, n, stride=2, axis=axis)
    b = jax.lax.slice_in_dim(x, 1, n, stride=2, axis=axis)
    return 0.5 * (a + b)


@partial(jax.jit, static_argnames=("factors",))
def downsample(vol: jnp.ndarray, factors) -> jnp.ndarray:
    """Downsample by per-axis power-of-two `factors` = (fz, fy, fx)."""
    out = vol
    for axis, f in enumerate(factors):
        if f & (f - 1):
            raise ValueError(f"downsample factor {f} is not a power of two")
        while f > 1:
            out = _halve_axis(out, axis)
            f //= 2
    return out


def upscale_coords(coords: jnp.ndarray, factors) -> jnp.ndarray:
    """Map detected (z,y,x) coords in downsampled space back to full res.

    A 2x averaging halving places downsampled sample i at full-res position
    2i + 0.5; composing s halvings per axis gives scale f and offset
    (f-1)/2.
    """
    f = jnp.asarray(factors, dtype=coords.dtype)
    return coords * f + (f - 1.0) * 0.5
