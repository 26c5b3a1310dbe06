"""Trilinear affine resampling — the fusion inner loop.

Reference parity: ImgLib2 `AffineTransform3D` + `NLinearInterpolator` as
used per-output-voxel in `WeightedAverageFusion`/`ProcessFusion`
(SURVEY.md section 2.5, call stack 3.3). TPU-native design: the voxel loop
becomes one vectorized gather of 8 corners + lerp over the whole output
block; out-of-bounds contributions are masked, matching the reference's
"view does not contribute outside its interval" behavior.

Two device formulations:

- General affine: a single flat 1D gather per corner (base linear index +
  static corner offsets) — measured ~1.3x the naive multidimensional
  gather on TPU, and XLA fuses the lerp arithmetic around it.
- Axis-aligned affine (zero off-diagonals — translation-model
  registration, calibration scaling, downsampling): trilinear is a
  separable tensor-product filter, so the WHOLE resample becomes three
  banded interpolation matmuls on the MXU (`separable_resample`), ~10x
  the gather path and bit-comparable (hat-function weights are exactly
  the per-axis lerp weights).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.models.affine import apply_affine

# volumes up to this many elements use the paired-corner (N, 8) gather
# view in `trilinear_sample` (~12N transient floats incl. the quad
# intermediate: ~3.2 GB at the cap, covering up to ~405^3 volumes) —
# larger volumes keep the copy-free 8-gather form
_QUAD_GATHER_MAX_ELEMS = 64 * 1024 * 1024


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
    # per-axis step to the +1 corner (0 at the exact top edge, where frac=0)
    step = jnp.minimum(c0i + 1, jnp.asarray(vol.shape, jnp.int32) - 1) - c0i

    YX = vol.shape[1] * vol.shape[2]
    X = vol.shape[2]
    flat = vol.reshape(-1)
    base = c0i[..., 0] * YX + c0i[..., 1] * X + c0i[..., 2]
    sz = step[..., 0] * YX
    sy = step[..., 1] * X
    sx = step[..., 2]

    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    if flat.shape[0] <= _QUAD_GATHER_MAX_ELEMS:
        # PAIRED-CORNER gather (r5, the fusion hot path): an (N, 8)
        # view whose row i holds ALL EIGHT cell corners
        # [v[i], v[i+1], v[i+X], v[i+X+1], same at i+YX] turns the 8
        # scalar gathers into ONE contiguous 32-byte ROW gather —
        # measured 2.65x (quad form) then a further step (octo form)
        # on the fusion stage (gathers are latency-bound on TPU). The
        # rolled rows wrap at the top z/y/x edges, but a wrapped corner
        # is only addressed when its coordinate sits EXACTLY on the
        # clamped edge, where its lerp weight is exactly 0 (frac = 0)
        # — finite garbage times zero: exact. Costs a transient
        # 12N-element copy, gated on volume size
        # (`_QUAD_GATHER_MAX_ELEMS`).
        quad = jnp.stack([flat, jnp.roll(flat, -1), jnp.roll(flat, -X),
                          jnp.roll(flat, -X - 1)], axis=-1)
        octo = jnp.concatenate([quad, jnp.roll(quad, -YX, axis=0)],
                               axis=-1)                      # (N, 8)
        g = jnp.take(octo, base, axis=0)
        wx0, wx1 = (1 - fx), fx
        wy0, wy1 = (1 - fy), fy

        def face(q):
            return (wy0 * (wx0 * q[..., 0] + wx1 * q[..., 1])
                    + wy1 * (wx0 * q[..., 2] + wx1 * q[..., 3]))

        v = (1 - fz) * face(g[..., :4]) + fz * face(g[..., 4:])
        return jnp.where(inside, v, 0.0), inside

    v = 0.0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        oz = base if dz == 0 else base + sz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            oy = oz if dy == 0 else oz + sy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                idx = oy if dx == 0 else oy + sx
                v = v + wz * wy * wx * jnp.take(flat, idx)
    return jnp.where(inside, v, 0.0), inside


def _hat_matrix(n_out, n_in, scale, shift, dtype=jnp.float32, nearest=False):
    """(n_out, n_in) linear-interpolation matrix for p(i) = scale*i + shift.

    Row i holds the 2-tap lerp weights of the clipped position p(i); rows
    whose unclipped position is outside [0, n_in-1] are still valid (edge
    clamp) — callers mask with the `inside` flags.
    """
    p = jnp.arange(n_out, dtype=dtype) * scale + shift
    if nearest:
        p = jnp.round(p)
    inside = (p >= 0.0) & (p <= n_in - 1.0)
    pc = jnp.clip(p, 0.0, n_in - 1.0)
    j = jnp.arange(n_in, dtype=dtype)
    W = jnp.maximum(0.0, 1.0 - jnp.abs(pc[:, None] - j[None, :]))
    return W, inside


@partial(jax.jit, static_argnames=("out_shape", "nearest"))
def separable_resample(vol: jnp.ndarray, scale: jnp.ndarray,
                       shift: jnp.ndarray, out_shape, nearest: bool = False):
    """Exact trilinear resample for an AXIS-ALIGNED map: output voxel i
    samples vol at (scale*i + shift) per axis. Three MXU matmuls.

    Returns (values (out_shape,), inside (out_shape,) bool) — identical
    semantics to `trilinear_sample` on the same coordinates.
    """
    hi = jax.lax.Precision.HIGHEST
    Wz, iz = _hat_matrix(out_shape[0], vol.shape[0], scale[0], shift[0],
                         vol.dtype, nearest)
    Wy, iy = _hat_matrix(out_shape[1], vol.shape[1], scale[1], shift[1],
                         vol.dtype, nearest)
    Wx, ix = _hat_matrix(out_shape[2], vol.shape[2], scale[2], shift[2],
                         vol.dtype, nearest)
    a = jnp.einsum("zi,iyx->zyx", Wz, vol, precision=hi)
    a = jnp.einsum("yj,zjx->zyx", Wy, a, precision=hi)
    a = jnp.einsum("xk,zyk->zyx", Wx, a, precision=hi)
    inside = iz[:, None, None] & iy[None, :, None] & ix[None, None, :]
    return jnp.where(inside, a, 0.0), inside


def is_axis_aligned(world_to_view: np.ndarray, tol: float = 1e-9) -> bool:
    """True if the (3,4) world->view matrix has negligible off-diagonals
    (so trilinear sampling separates into per-axis interpolation)."""
    M = np.asarray(world_to_view, np.float64)[:, :3]
    off = M - np.diag(np.diag(M))
    return bool(np.all(np.abs(off) <= tol * max(1.0, np.abs(M).max())))


@partial(jax.jit, static_argnames=("out_shape",))
def resample_affine(vol: jnp.ndarray, world_to_view: jnp.ndarray,
                    out_shape, out_offset=None):
    """Render `vol` into an output grid: for each output voxel at world
    coordinate w, sample vol at world_to_view @ w.

    `world_to_view` is the INVERSE of the view's model (view->world) affine.
    Returns (block (out_shape,), inside mask).
    """
    # default evaluated lazily: a jnp default argument would run a device
    # computation AT IMPORT TIME, initializing the XLA backend before
    # jax.distributed.initialize can be called (breaks multi-process)
    if out_offset is None:
        out_offset = jnp.zeros(3)
    grid = output_grid_coords(out_shape, dtype=vol.dtype)
    grid = grid + jnp.asarray(out_offset, dtype=vol.dtype)
    view_coords = apply_affine(world_to_view.astype(vol.dtype), grid)
    return trilinear_sample(vol, view_coords)


def resample_affine_auto(vol, world_to_view, out_shape, out_offset=(0, 0, 0)):
    """Host-side router: `world_to_view` as a CONCRETE (3,4) numpy matrix;
    picks the MXU separable path when axis-aligned, else the gather path."""
    M = np.asarray(world_to_view, np.float64)
    if is_axis_aligned(M):
        scale = jnp.asarray(np.diag(M[:, :3]), jnp.float32)
        shift = jnp.asarray(
            M[:, :3] @ np.asarray(out_offset, np.float64) + M[:, 3],
            jnp.float32)
        return separable_resample(jnp.asarray(vol, jnp.float32), scale,
                                  shift, tuple(out_shape))
    return resample_affine(jnp.asarray(vol, jnp.float32),
                           jnp.asarray(M, jnp.float32), tuple(out_shape),
                           jnp.asarray(out_offset, jnp.float32))
