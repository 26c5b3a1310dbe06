"""Streaming (larger-than-memory) fusion over the native block store.

Reference parity: the virtual/lazy fusion variants (`ProcessVirtual`,
`TransformedRealRandomAccessibleInterval`, SURVEY.md sections 2.5 and 5
"long-context analog"): the fused output never materializes in RAM — it is
produced block by block into a `RawVolumeStore`, and each block reads only
the sub-regions of the source views its world extent maps into (computed
from the inverse transforms; the C++ store does the strided reads).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.fuse.weighted_avg import (
    FusionParameters,
    _accumulate_view_chunk,
)
from spim_registration_tpu.native_blocks import RawVolumeStore, decompose


def _view_subregion(model_inv: np.ndarray, world_lo, world_hi, view_shape,
                    margin: int = 2):
    """View-space AABB that the world block [lo, hi) maps into."""
    corners = np.array([[a, b, c]
                        for a in (world_lo[0], world_hi[0])
                        for b in (world_lo[1], world_hi[1])
                        for c in (world_lo[2], world_hi[2])], float)
    vc = corners @ model_inv[:, :3].T + model_inv[:, 3]
    lo = np.floor(vc.min(axis=0)).astype(int) - margin
    hi = np.ceil(vc.max(axis=0)).astype(int) + margin + 1
    lo = np.maximum(lo, 0)
    hi = np.minimum(hi, view_shape)
    return lo, hi


def fuse_views_streaming(
    view_stores: Sequence[RawVolumeStore],
    models: Sequence[np.ndarray],
    bbox: BoundingBox,
    out_store: RawVolumeStore,
    params: FusionParameters = FusionParameters(),
    block: Sequence[int] = (64, 128, 128),
) -> None:
    """Fuse disk-resident views into a disk-resident output, block-wise.

    `out_store` must have shape == bbox.shape. Content-based weights are
    not supported in streaming mode (they need a global pass); blending is.
    """
    if params.use_content_based:
        raise NotImplementedError(
            "content-based weights need a global pass; use fuse_views")
    out_shape = bbox.shape
    assert tuple(out_store.shape) == tuple(out_shape), \
        f"out store shape {out_store.shape} != bbox {out_shape}"

    invs = []
    for model in models:
        A4 = np.vstack([np.asarray(model, np.float64), [0, 0, 0, 1]])
        invs.append(np.linalg.inv(A4)[:3])

    blocks = decompose(out_shape, tuple(block), (0, 0, 0))
    for blk in blocks:
        blk_shape = tuple(h - l for l, h in zip(blk.out_lo, blk.out_hi))
        acc_v = jnp.zeros(blk_shape, jnp.float32)
        acc_w = jnp.zeros(blk_shape, jnp.float32)
        world_lo = [bbox.min[d] + blk.out_lo[d] for d in range(3)]
        world_hi = [bbox.min[d] + blk.out_hi[d] for d in range(3)]
        for store, model, inv in zip(view_stores, models, invs):
            vlo, vhi = _view_subregion(inv, world_lo, world_hi, store.shape)
            if np.any(vlo >= vhi):
                continue
            sub = store.read_block(vlo, vhi)
            # shift the world->view transform into subvolume coords:
            # subview(v) = view(v) - vlo ; out voxel i -> world
            # = world_lo + i -> view -> minus vlo
            S = np.vstack([inv, [0, 0, 0, 1]])
            T = np.array([[1, 0, 0, world_lo[0]],
                          [0, 1, 0, world_lo[1]],
                          [0, 0, 1, world_lo[2]],
                          [0, 0, 0, 1.0]])
            M = (S @ T)[:3]
            M[:, 3] -= vlo
            acc_v, acc_w = _accumulate_view_chunk(
                acc_v, acc_w, jnp.asarray(sub), None,
                jnp.asarray(M, jnp.float32),
                jnp.zeros(3, jnp.float32), tuple(sub.shape),
                _strip_content(params), blk_shape,
                blend_size=tuple(int(s) for s in store.shape),
                blend_offset=jnp.asarray(vlo, jnp.float32))
        out = jnp.where(acc_w > 1e-9, acc_v / jnp.maximum(acc_w, 1e-9), 0.0)
        out_store.write_block(blk.out_lo, np.asarray(out))


def _strip_content(params: FusionParameters) -> FusionParameters:
    import dataclasses

    return dataclasses.replace(params, use_content_based=False)
