"""Halo exchange for z-sharded volumes.

The first-class primitive the reference approximates with overlapping CUDA
`Block`s re-read from host memory (SURVEY.md section 2.8): each shard
swaps `h` boundary slices with its mesh neighbors over ICI
(`lax.ppermute`), and global volume edges are mirror-padded to match the
reference's out-of-bounds-mirror semantics.

Halos larger than the shard depth are supported via multi-hop neighbor
block gathering (thin shards x wide PSF support). Runs inside `shard_map`
with a named z axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange_z(x: jnp.ndarray, h: int, axis_name: str = "z",
                    boundary: str = "mirror") -> jnp.ndarray:
    """Return the local (zl, ...) block extended to (zl + 2h, ...).

    Interior shard boundaries receive true neighbor data (multi-hop when
    h > zl); the global top/bottom h slices use mirror
    (reflect-without-edge) or zero padding. Requires h <= Z - 1 for
    mirror semantics.
    """
    if h == 0:
        return x
    zl = x.shape[0]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    Z = n * zl
    if boundary not in ("mirror", "zero"):
        raise ValueError(f"unknown boundary {boundary!r}")
    if h > Z - 1:
        raise ValueError(f"halo {h} exceeds volume depth {Z} - 1")

    hops = -(-h // zl)
    # gather `hops` whole neighbor blocks on each side
    blocks = {0: x}
    for k in range(1, hops + 1):
        if n == 1:
            blocks[-k] = jnp.zeros_like(x)
            blocks[k] = jnp.zeros_like(x)
        else:
            # block from shard i-k: shift the previously received i-(k-1)
            # block one hop down the ring
            blocks[-k] = lax.ppermute(
                blocks[-(k - 1)], axis_name,
                [(j, j + 1) for j in range(n - 1)])
            blocks[k] = lax.ppermute(
                blocks[k - 1], axis_name,
                [(j + 1, j) for j in range(n - 1)])
    ext = jnp.concatenate([blocks[k] for k in range(-hops, hops + 1)],
                          axis=0)

    # fix the global edges: map each extended row's global z through the
    # boundary rule, then gather (interior rows map to themselves)
    e = jnp.arange(ext.shape[0])
    z = (idx - hops) * zl + e
    if boundary == "mirror":
        zr = jnp.where(z < 0, -z, z)
        zr = jnp.where(zr > Z - 1, 2 * (Z - 1) - zr, zr)
        src = jnp.clip(zr - (idx - hops) * zl, 0, ext.shape[0] - 1)
        ext = jnp.take(ext, src, axis=0)
    else:  # zero
        valid = (z >= 0) & (z <= Z - 1)
        shape = (ext.shape[0],) + (1,) * (ext.ndim - 1)
        ext = ext * valid.reshape(shape).astype(ext.dtype)

    start = hops * zl - h
    return lax.dynamic_slice_in_dim(ext, start, zl + 2 * h, axis=0)
