"""Difference-of-Mean interest-point detection (integral-image variant).

Reference parity: `spim/process/interestpointdetection/ProcessDOM` +
headless `DoM` (SURVEY.md sections 2.3, 2.10): box means with radii r1 < r2
on an integral image; faster and coarser than DoG, same peak machinery.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.downsample import downsample, upscale_coords
from spim_registration_tpu.ops.extrema import find_peaks, subpixel_localize
from spim_registration_tpu.ops.integral import difference_of_mean


@dataclasses.dataclass(frozen=True)
class DoMParameters:
    """Reference GUI defaults: radius1=2, radius2=3, threshold ~0.005."""

    radius1: int = 2
    radius2: int = 3
    threshold: float = 0.005
    max_peaks: int = 8192
    find_minima: bool = False
    downsample_xy: int = 1
    downsample_z: int = 1
    normalize: bool = True


@partial(jax.jit, static_argnames=("params",))
def _detect_device(vol: jnp.ndarray, params: DoMParameters):
    v = vol.astype(jnp.float32)
    if params.normalize:
        lo, hi = jnp.min(v), jnp.max(v)
        v = (v - lo) / jnp.maximum(hi - lo, 1e-12)
    factors = (params.downsample_z, params.downsample_xy, params.downsample_xy)
    if any(f > 1 for f in factors):
        v = downsample(v, factors)
    dom = difference_of_mean(v, params.radius1, params.radius2)
    coords, resp, valid = find_peaks(
        dom, params.threshold, params.max_peaks, params.find_minima
    )
    pos, val, ok = subpixel_localize(dom, coords, valid)
    pos = upscale_coords(pos, factors)
    # ONE packed array: each extra output is a full dispatch round trip
    # on the remote-TPU tunnel (same transfer discipline as detect/dog)
    return jnp.concatenate(
        [pos, val[:, None], ok.astype(jnp.float32)[:, None]], axis=1)


def detect_beads_dom(vol, params: DoMParameters = DoMParameters()):
    """DoM detection; returns (points (N,3), responses (N,)) valid rows."""
    packed = np.asarray(_detect_device(jnp.asarray(vol), params))
    ok = packed[:, 4] > 0.5
    return (packed[ok, :3].astype(np.float32),
            packed[ok, 3].astype(np.float32))
