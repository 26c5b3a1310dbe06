"""Integral images and box means (Difference-of-Mean support).

Reference parity: ImgLib1 integral images used by `ProcessDOM` (SURVEY.md
section 2.3): DoM response = mean(box r1) - mean(box r2), r1 < r2 — a
cheaper, coarser blob detector than DoG.

TPU-native: the integral image is three chained cumsums (XLA scans); box
sums are 8-corner gathers expressed as shifted-array arithmetic, all VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def integral_image(vol: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 3D integral image: I[z,y,x] = sum(vol[:z,:y,:x])."""
    acc = jnp.cumsum(jnp.cumsum(jnp.cumsum(
        vol.astype(jnp.float32), axis=0), axis=1), axis=2)
    return jnp.pad(acc, ((1, 0), (1, 0), (1, 0)))


def _shift(ii: jnp.ndarray, dz: int, dy: int, dx: int,
           shape) -> jnp.ndarray:
    return jax.lax.dynamic_slice(ii, (dz, dy, dx), shape)


@partial(jax.jit, static_argnames=("radius",))
def box_mean(vol: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Mean over a (2r+1)^3 box, clamped at borders (truncated box)."""
    z, y, x = vol.shape
    r = radius
    ii = integral_image(jnp.pad(vol, r, mode="edge"))
    shape = (z, y, x)
    s = 2 * r + 1
    total = (
        _shift(ii, s, s, s, shape) - _shift(ii, 0, s, s, shape)
        - _shift(ii, s, 0, s, shape) - _shift(ii, s, s, 0, shape)
        + _shift(ii, 0, 0, s, shape) + _shift(ii, 0, s, 0, shape)
        + _shift(ii, s, 0, 0, shape) - _shift(ii, 0, 0, 0, shape)
    )
    return total / jnp.float32(s ** 3)


@partial(jax.jit, static_argnames=("r1", "r2"))
def difference_of_mean(vol: jnp.ndarray, r1: int, r2: int) -> jnp.ndarray:
    """DoM response (bright blobs positive); r1 < r2."""
    v = vol.astype(jnp.float32)
    return box_mean(v, r1) - box_mean(v, r2)
