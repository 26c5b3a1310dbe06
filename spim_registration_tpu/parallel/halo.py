"""Halo exchange for z-sharded volumes.

The first-class primitive the reference approximates with overlapping CUDA
`Block`s re-read from host memory (SURVEY.md section 2.8): here each shard
swaps `h` boundary slices with its mesh neighbors over ICI
(`lax.ppermute`), and global volume edges are mirror-padded to match the
reference's out-of-bounds-mirror semantics.

Runs inside `shard_map` with a named z axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange_z(x: jnp.ndarray, h: int, axis_name: str = "z",
                    boundary: str = "mirror") -> jnp.ndarray:
    """Return the local (Zl, ...) block extended to (Zl + 2h, ...).

    Interior shard boundaries receive true neighbor data; the global top /
    bottom use mirror (reflect-without-edge) or zero padding.
    """
    if h == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    if n == 1:
        up = jnp.zeros_like(x[:h])
        down = jnp.zeros_like(x[:h])
    else:
        # top halo of shard i = bottom h rows of shard i-1
        up = lax.ppermute(x[-h:], axis_name,
                          [(j, j + 1) for j in range(n - 1)])
        # bottom halo of shard i = top h rows of shard i+1
        down = lax.ppermute(x[:h], axis_name,
                            [(j + 1, j) for j in range(n - 1)])

    if boundary == "mirror":
        top_fix = jnp.flip(x[1:h + 1], axis=0)
        bot_fix = jnp.flip(x[-h - 1:-1], axis=0)
    elif boundary == "zero":
        top_fix = jnp.zeros_like(x[:h])
        bot_fix = jnp.zeros_like(x[:h])
    else:
        raise ValueError(f"unknown boundary {boundary!r}")

    up = jnp.where(idx == 0, top_fix, up)
    down = jnp.where(idx == n - 1, bot_fix, down)
    return jnp.concatenate([up, x, down], axis=0)
