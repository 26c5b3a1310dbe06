"""Streamed (out-of-core) deconvolution input preparation.

Reference parity: `ProcessForDeconvolution#fuseStacksAndGetPSFs`
(SURVEY.md call stack 3.4) for volumes whose transformed views do not
fit in RAM/HBM: the same transform + blending-weight math as
`deconv.prep.prepare_views_for_deconvolution`, but executed per z-slab
of the bounding box with ONE source view resident at a time, writing
per-view image/weight `RawVolumeStore`s (native threaded block IO).
The result plugs straight into `BlockedDeconvolutionRunner` (which
also takes a mesh — the full out-of-core multi-chip path, CLI
`deconvolve --out-of-core`).

Two passes:
  1. per view: transform + raw blending weight per slab -> img_v / w_v
     stores; accumulate the weight-sum store and the coverage-count
     scalar (for the OSEM factor).
  2. per slab: normalize every view's weights by the weight sum
     (sum_v w_v <= 1 where covered, exactly like the in-memory prep)
     and count covered voxels.

Disk footprint: (2V + 1) float32 volumes under `workdir`.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.deconv.blocked import BlockedDeconvolutionInputs
from spim_registration_tpu.fuse.weights import (
    BlendingParameters,
    blending_weight,
)
from spim_registration_tpu.models.affine import apply_affine
from spim_registration_tpu.ops.resample import (
    output_grid_coords,
    trilinear_sample,
)


def prepare_views_streamed(
    get_volume: Callable[[int], np.ndarray],
    models: Sequence[np.ndarray],
    psfs: Sequence[np.ndarray],
    bbox: BoundingBox,
    workdir: str,
    blending: BlendingParameters = BlendingParameters(
        border=(0.0, 0.0, 0.0), blending_range=(40.0, 40.0, 40.0)),
    slab_z: int = 64,
    osem_factor: Optional[float] = None,
    psf_factors: Optional[List] = None,
) -> BlockedDeconvolutionInputs:
    """Build disk-resident `BlockedDeconvolutionInputs` for `bbox`.

    `get_volume(v)` loads source view v (called once; only one source
    view plus one output slab are resident at a time). Matches
    `prepare_views_for_deconvolution` voxel-for-voxel (tested)."""
    from spim_registration_tpu.native_blocks import RawVolumeStore

    os.makedirs(workdir, exist_ok=True)
    Z, Y, X = bbox.shape
    shape = (Z, Y, X)
    V = len(models)

    def store(name):
        return RawVolumeStore(os.path.join(workdir, name), shape,
                              create=True)

    img_stores = [store(f"prep_img{v}.raw") for v in range(V)]
    w_stores = [store(f"prep_w{v}.raw") for v in range(V)]
    wsum = store("prep_wsum.raw")
    for z0 in range(0, Z, slab_z):
        zn = min(slab_z, Z - z0)
        wsum.write_block((z0, 0, 0), np.zeros((zn, Y, X), np.float32))

    sum_counts = 0.0
    for v in range(V):
        vol = np.asarray(get_volume(v), np.float32)
        A4 = np.vstack([np.asarray(models[v], np.float64), [0, 0, 0, 1]])
        inv = jnp.asarray(np.linalg.inv(A4)[:3], jnp.float32)
        volj = jnp.asarray(vol)
        for z0 in range(0, Z, slab_z):
            zn = min(slab_z, Z - z0)
            grid = output_grid_coords((zn, Y, X), dtype=jnp.float32)
            grid = grid + jnp.asarray(
                (bbox.min[0] + z0, bbox.min[1], bbox.min[2]), jnp.float32)
            vc = apply_affine(inv, grid)
            vals, inside = trilinear_sample(volj, vc)
            w = inside.astype(jnp.float32) * blending_weight(
                vc, vol.shape, blending)
            w_np = np.asarray(w)
            img_stores[v].write_block((z0, 0, 0), np.asarray(vals))
            w_stores[v].write_block((z0, 0, 0), w_np)
            acc = wsum.read_block((z0, 0, 0), (z0 + zn, Y, X))
            wsum.write_block((z0, 0, 0), acc + w_np)
            sum_counts += float((w_np > 1e-9).sum())
        del vol, volj

    covered = 0.0
    for z0 in range(0, Z, slab_z):
        zn = min(slab_z, Z - z0)
        ws = wsum.read_block((z0, 0, 0), (z0 + zn, Y, X))
        covered += float((ws > 1e-9).sum())
        denom = np.maximum(ws, 1e-9)
        mask = ws > 1e-9
        for v in range(V):
            wv = w_stores[v].read_block((z0, 0, 0), (z0 + zn, Y, X))
            w_stores[v].write_block(
                (z0, 0, 0), np.where(mask, wv / denom, 0.0)
                .astype(np.float32))

    if osem_factor is None:
        osem_factor = (sum_counts / covered) if covered > 0 else 1.0

    return BlockedDeconvolutionInputs(
        image_stores=img_stores,
        weight_stores=w_stores,
        psfs=[np.asarray(p, np.float32) for p in psfs],
        osem_factor=float(osem_factor),
        psf_factors=psf_factors,
    )
