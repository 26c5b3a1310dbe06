"""Trilinear affine resampling — the fusion inner loop.

Reference parity: ImgLib2 `AffineTransform3D` + `NLinearInterpolator` as
used per-output-voxel in `WeightedAverageFusion`/`ProcessFusion`
(SURVEY.md section 2.5, call stack 3.3). TPU-native design: the voxel loop
becomes one vectorized gather of 8 corners + lerp over the whole output
block; out-of-bounds contributions are masked, matching the reference's
"view does not contribute outside its interval" behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spim_registration_tpu.models.affine import apply_affine


def output_grid_coords(shape, offset=(0.0, 0.0, 0.0), dtype=jnp.float32):
    """World coordinates (Z,Y,X,3) of an output block's voxel centers."""
    z = jnp.arange(shape[0], dtype=dtype) + offset[0]
    y = jnp.arange(shape[1], dtype=dtype) + offset[1]
    x = jnp.arange(shape[2], dtype=dtype) + offset[2]
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([zz, yy, xx], axis=-1)


def trilinear_sample(vol: jnp.ndarray, coords: jnp.ndarray):
    """Sample `vol` at float (z,y,x) `coords` (..., 3) with trilinear interp.

    Returns (values (...,), inside (...,) bool). Outside samples are 0 with
    inside=False (the fusion weight machinery uses the mask).
    """
    shape = jnp.asarray(vol.shape, dtype=coords.dtype)
    inside = jnp.all((coords >= 0.0) & (coords <= shape - 1.0), axis=-1)
    c = jnp.clip(coords, 0.0, shape - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, (shape - 1.0).astype(jnp.int32))

    def gather(zi, yi, xi):
        return vol[zi, yi, xi]

    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    v = 0.0
    for dz, wz in ((0, 1 - fz), (1, fz)):
        zi = jnp.where(dz == 0, c0i[..., 0], c1i[..., 0])
        for dy, wy in ((0, 1 - fy), (1, fy)):
            yi = jnp.where(dy == 0, c0i[..., 1], c1i[..., 1])
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = jnp.where(dx == 0, c0i[..., 2], c1i[..., 2])
                v = v + wz * wy * wx * gather(zi, yi, xi)
    return jnp.where(inside, v, 0.0), inside


@partial(jax.jit, static_argnames=("out_shape",))
def resample_affine(vol: jnp.ndarray, world_to_view: jnp.ndarray,
                    out_shape, out_offset=jnp.zeros(3)):
    """Render `vol` into an output grid: for each output voxel at world
    coordinate w, sample vol at world_to_view @ w.

    `world_to_view` is the INVERSE of the view's model (view->world) affine.
    Returns (block (out_shape,), inside mask).
    """
    grid = output_grid_coords(out_shape, dtype=vol.dtype)
    grid = grid + jnp.asarray(out_offset, dtype=vol.dtype)
    view_coords = apply_affine(world_to_view.astype(vol.dtype), grid)
    return trilinear_sample(vol, view_coords)
