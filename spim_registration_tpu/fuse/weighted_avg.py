"""Weighted-average multi-view fusion.

Reference parity: `spim/process/fusion/weightedavg/WeightedAverageFusion` /
`ProcessFusion` / `ProcessSequential` (SURVEY.md section 2.5, call stack
3.3): for every output voxel in the bounding box, inverse-transform into
each contributing view, interpolate, weight (blending x content), and
write sum(w*v)/sum(w).

TPU-native design: the reference's per-voxel thread loop (`ImagePortion`s,
P1) becomes one fused vectorized program per z-chunk of the output —
coordinates, trilinear gathers, cosine blending, and accumulation all in a
single XLA fusion. Views are accumulated sequentially on device (P2's
analog; keeps peak memory at one view block). The z-chunk loop is the
virtual/sequential processing seam: chunks can stream for
larger-than-memory outputs, or shard over a mesh axis in the distributed
path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.fuse.weights import (
    BlendingParameters,
    ContentBasedParameters,
    blending_weight,
    content_based_weight,
)
from spim_registration_tpu.models.affine import apply_affine
from spim_registration_tpu.ops.resample import output_grid_coords, trilinear_sample


@dataclasses.dataclass(frozen=True)
class FusionParameters:
    use_blending: bool = True
    use_content_based: bool = False
    blending: BlendingParameters = BlendingParameters()
    content: ContentBasedParameters = ContentBasedParameters()
    downsample: int = 1           # output downsampling factor
    z_chunk: int = 64             # output z rows per device step
    interpolation: str = "linear"  # linear | nearest (reference GUI choice)


@partial(jax.jit, static_argnames=("view_size", "params", "chunk_shape",
                                   "blend_size"))
def _accumulate_view_chunk(acc_v, acc_w, vol, weight_vol, world_to_view,
                           chunk_offset, view_size, params: FusionParameters,
                           chunk_shape, blend_size=None, blend_offset=None):
    """Add one view's contribution to one output chunk (device step).

    `blend_size`/`blend_offset`: when `vol` is a sub-region of the full
    view (streaming mode), the blending ramp must still be evaluated in
    FULL-view coordinates: full = sampled + blend_offset, ramp over
    blend_size.
    """
    grid = output_grid_coords(chunk_shape, dtype=jnp.float32)
    grid = grid + chunk_offset[None, None, None, :]
    vc = apply_affine(world_to_view.astype(jnp.float32), grid)
    if params.interpolation == "nearest":
        vals, inside = trilinear_sample(vol, jnp.round(vc))
    else:
        vals, inside = trilinear_sample(vol, vc)
    w = inside.astype(jnp.float32)
    if params.use_blending:
        bc = vc if blend_offset is None else vc + blend_offset
        w = w * blending_weight(
            bc, view_size if blend_size is None else blend_size,
            params.blending)
    if params.use_content_based and weight_vol is not None:
        cw, _ = trilinear_sample(weight_vol, vc)
        w = w * cw
    return acc_v + w * vals, acc_w + w


def fuse_views(
    volumes: Sequence[np.ndarray],
    models: Sequence[np.ndarray],
    bbox: BoundingBox,
    params: FusionParameters = FusionParameters(),
) -> np.ndarray:
    """Fuse registered views into the bounding box; returns (Z,Y,X) f32.

    `models[i]` maps view-i voxel coords to world coords (the concatenated
    ViewDescription.model()).
    """
    ds = params.downsample
    out_shape = tuple(s // ds for s in bbox.shape)
    if any(s == 0 for s in out_shape):
        raise ValueError(f"empty bounding box {bbox}")

    content_vols = []
    vols_j = []
    invs = []
    for vol, model in zip(volumes, models):
        v = jnp.asarray(vol, jnp.float32)
        vols_j.append(v)
        if params.use_content_based:
            content_vols.append(content_based_weight(v, params.content))
        else:
            content_vols.append(None)
        A4 = np.vstack([np.asarray(model, np.float64), [0, 0, 0, 1]])
        # output voxel (i) -> world = bbox.min + ds * i ; then world -> view
        S = np.array([[ds, 0, 0, bbox.min[0]],
                      [0, ds, 0, bbox.min[1]],
                      [0, 0, ds, bbox.min[2]],
                      [0, 0, 0, 1.0]])
        invs.append(jnp.asarray((np.linalg.inv(A4) @ S)[:3], jnp.float32))

    out = np.zeros(out_shape, np.float32)
    zc = min(params.z_chunk, out_shape[0])
    for z0 in range(0, out_shape[0], zc):
        z1 = min(z0 + zc, out_shape[0])
        chunk_shape = (z1 - z0, out_shape[1], out_shape[2])
        acc_v = jnp.zeros(chunk_shape, jnp.float32)
        acc_w = jnp.zeros(chunk_shape, jnp.float32)
        # offset is in OUTPUT voxel units (the affine S handles world)
        offset = jnp.asarray([z0, 0.0, 0.0], jnp.float32)
        for v, cw, inv, vol_np in zip(vols_j, content_vols, invs, volumes):
            acc_v, acc_w = _accumulate_view_chunk(
                acc_v, acc_w, v, cw, inv, offset,
                tuple(vol_np.shape), params, chunk_shape)
        chunk = jnp.where(acc_w > 1e-9, acc_v / jnp.maximum(acc_w, 1e-9), 0.0)
        out[z0:z1] = np.asarray(chunk)
    return out


def fuse_dataset(dataset, view_ids, bbox_name: Optional[str] = None,
                 params: FusionParameters = FusionParameters()) -> np.ndarray:
    """Fusion entry point over a Dataset (Image_Fusion plugin analog)."""
    from spim_registration_tpu.fuse.bounding_box import maximal_bounding_box

    vols = [dataset.get_image(v) for v in view_ids]
    models = [dataset.views[v].model() for v in view_ids]
    if bbox_name is not None and bbox_name in dataset.bounding_boxes:
        bbox = dataset.bounding_boxes[bbox_name]
    else:
        bbox = maximal_bounding_box([v.shape for v in vols], models)
    return fuse_views(vols, models, bbox, params)
