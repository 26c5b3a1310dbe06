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


def mesh_from_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Parse the production `--mesh` flag into a Mesh (or None).

    Accepted: None/""/"none"/"1" -> single-device (no mesh);
    "auto" -> all visible devices on a ("z",) axis (None if only one);
    "z=8" / "view=2,z=4" -> explicit axis names and sizes over
    `jax.devices()` in order. This is the single entry point through
    which the CLI / pipeline layers go distributed (SURVEY.md section 3
    L5->L4->L3 wiring): every stage dispatches to its sharded engine
    when a mesh is returned, and to the single-device engine otherwise.
    """
    if spec is None or spec in ("", "none", "1"):
        return None
    if spec == "auto":
        n = len(jax.devices())
        return make_mesh(("z",), (n,)) if n > 1 else None
    names, sizes = [], []
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not v:
            raise ValueError(f"bad --mesh component {part!r} "
                             "(want e.g. z=8 or view=2,z=4)")
        names.append(k.strip())
        sizes.append(int(v))
    return make_mesh(tuple(names), tuple(sizes))
