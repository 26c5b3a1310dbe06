"""Device mesh construction.

Replaces the reference's `CUDADevice`/`CUDATools` device enumeration
(SURVEY.md section 2.8) with `jax.sharding.Mesh` axes. Standard meshes:

- ("z",): volume z-sharding within a host (ICI) — the convolution axis;
- ("view", "z"): views data-parallel x z-sharded;
- ("host", "z") across processes (DCN x ICI) for multi-host runs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str] = ("z",),
              axis_sizes: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    With no `axis_sizes`, all devices go to the last axis and leading axes
    get size 1. Sizes must multiply to the device count used.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [n]
    total = int(np.prod(axis_sizes))
    if total > n:
        raise ValueError(f"mesh needs {total} devices, have {n}")
    dev = np.asarray(devices[:total]).reshape(tuple(axis_sizes))
    return Mesh(dev, tuple(axis_names))
