"""Difference-of-Gaussian interest-point detection pipeline.

Reference parity: `spim/process/interestpointdetection/ProcessDOG` +
headless `DoG`/`DoGParameters` (SURVEY.md sections 2.3, 2.10, call stack
3.1). Per view: optional per-axis downsample -> DoG (sigma, sigma*k) ->
strict 26-neighborhood extrema above threshold -> iterative subpixel
quadratic localization -> coordinates mapped back to full resolution.

TPU-native: everything static-shape (top-k peak lists + validity masks);
the per-view loop is host-side (views differ in size), while all voxel work
is a single jitted device program per view shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.downsample import downsample, upscale_coords
from spim_registration_tpu.ops.extrema import find_peaks_localized
from spim_registration_tpu.ops.gaussian import (
    difference_of_gaussian,
    difference_of_gaussian_bf16,
    dog_sigmas,
)


@dataclasses.dataclass(frozen=True)
class DoGParameters:
    """Headless detection parameters (reference `DoGParameters` analog).

    sigma/threshold defaults follow the reference GUI defaults
    (sigma ~1.8, threshold ~0.008 on normalized images).
    """

    sigma: float = 1.8
    threshold: float = 0.008
    max_peaks: int = 8192
    find_minima: bool = False       # reference: detect min/max choice
    downsample_xy: int = 1          # power of two
    downsample_z: int = 1
    steps_per_octave: int = 4       # fixes k = 2^(1/steps)
    normalize: bool = True          # min/max normalize image first
    min_intensity: float | None = None
    max_intensity: float | None = None
    # anisotropic z: explicit z sigma, or derived from the voxel
    # calibration like the reference (DifferenceOfGaussian computes the
    # z sigma from the z/xy spacing ratio: a blob that is sigma wide in
    # xy voxels spans sigma * (xy_spacing / z_spacing) z voxels)
    sigma_z: float | None = None
    calibration_zyx: tuple | None = None  # (z, y, x) voxel spacing
    # "bfloat16": DoG conv with bf16 matmul inputs at full MXU rate via
    # the telescoping difference-first restructure (ops.gaussian
    # difference_of_gaussian_bf16) — error floor is the bf16 INPUT
    # quantization (relative to the local image value), which leaves
    # bead-scene peak sets identical to float32 (tested); marginal peaks
    # sitting ON a bright background may differ. Default float32.
    conv_dtype: str = "float32"


def effective_sigmas(params: DoGParameters) -> tuple:
    """Per-axis base sigma (sz, sy, sx) from the parameter ladder:
    explicit sigma_z > calibration-derived > isotropic."""
    s = float(params.sigma)
    if params.sigma_z is not None:
        sz = float(params.sigma_z)
    elif params.calibration_zyx is not None:
        cz, cy, _cx = (float(c) for c in params.calibration_zyx)
        sz = s * cy / cz
    else:
        sz = s
    return (sz, s, s)


# rows actually shipped to the host per view: peak lists are sorted by
# |response|, so when the valid count fits, only this many rows carry
# information — the (max_peaks, 5) packed array is mostly zeros, and on
# the remote-TPU tunnel the D2H transfer dominated the whole detection
# wall (~40 of 96 ms for 8 views at the 8192 budget, measured r3). The
# count travels in-band (row 0); overflow falls back to the full-budget
# program (exactness preserved, just slower — and only for scenes with
# more than HOT_ROWS peaks in one view).
HOT_ROWS = 2048


def _detect_core(vol: jnp.ndarray, params: DoGParameters):
    v = vol.astype(jnp.float32)
    if params.normalize:
        if params.min_intensity is not None and params.max_intensity is not None:
            lo = jnp.float32(params.min_intensity)
            hi = jnp.float32(params.max_intensity)
        else:
            lo = jnp.min(v)
            hi = jnp.max(v)
        v = (v - lo) / jnp.maximum(hi - lo, 1e-12)

    factors = (params.downsample_z, params.downsample_xy, params.downsample_xy)
    if any(f > 1 for f in factors):
        v = downsample(v, factors)

    sz, sy, sx = effective_sigmas(params)
    _, _, norm = dog_sigmas(params.sigma, params.threshold,
                            steps_per_octave=params.steps_per_octave)
    k = 2.0 ** (1.0 / params.steps_per_octave)
    s1 = (sz, sy, sx)
    s2 = tuple(s * k for s in s1)
    dog_fn = (difference_of_gaussian_bf16
              if params.conv_dtype == "bfloat16"
              else difference_of_gaussian)
    dog = dog_fn(v, s1, s2) * jnp.float32(norm)
    # FUSED peaks + strictness + subpixel (ops.extrema
    # find_peaks_localized): one 27-gather serves strictness AND the
    # first quadratic fit; the hot-slice gating (subpixel on 2048 rows
    # when the candidate count fits, full budget otherwise — exact
    # either way) lives inside it.
    pos, val, ok, cand_count = find_peaks_localized(
        dog, params.threshold, params.max_peaks, params.find_minima,
        hot_k=2048)
    pos = upscale_coords(pos, factors)
    # pack into ONE array: each host transfer costs a full dispatch round
    # trip on the remote-TPU tunnel (~27 ms), so 3 outputs -> 1
    packed = jnp.concatenate(
        [pos, val[:, None], ok.astype(jnp.float32)[:, None]], axis=1)
    return packed, cand_count


def _detect_impl(vol: jnp.ndarray, params: DoGParameters):
    return _detect_core(vol, params)[0]


def _detect_impl_hot(vol: jnp.ndarray, params: DoGParameters):
    """`_detect_core` truncated to HOT_ROWS result rows + the in-band
    CANDIDATE count (row 0, col 0) — rows are sorted by |response|, so
    cand_count <= HOT_ROWS guarantees every valid row was shipped. See
    HOT_ROWS."""
    packed, cand_count = _detect_core(vol, params)
    kh = min(HOT_ROWS, packed.shape[0])
    head = jnp.zeros((1, packed.shape[1]), packed.dtype).at[0, 0].set(
        cand_count.astype(packed.dtype))
    return jnp.concatenate([head, packed[:kh]], axis=0)


_detect_device = partial(jax.jit, static_argnames=("params",))(_detect_impl)
_detect_device_hot = partial(jax.jit,
                             static_argnames=("params",))(_detect_impl_hot)


@partial(jax.jit, static_argnames=("params",))
def _detect_device_batch(vols: jnp.ndarray, params: DoGParameters):
    """Detect over a stacked (V, Z, Y, X) batch of same-shape views in ONE
    device program (P2 per-view parallelism, SURVEY.md section 2.11):
    `lax.map` runs the views sequentially inside the program — one
    dispatch + one packed transfer for the whole batch, amortizing the
    remote-tunnel round trip (~24 ms measured) across views."""
    return jax.lax.map(lambda v: _detect_impl_hot(v, params), vols)


@partial(jax.jit, static_argnames=("params",))
def _detect_device_batch_full(vols: jnp.ndarray, params: DoGParameters):
    return jax.lax.map(lambda v: _detect_impl(v, params), vols)


def _unpack(rows):
    ok = rows[:, 4] > 0.5
    return (rows[ok, :3].astype(np.float32),
            rows[ok, 3].astype(np.float32))


def detect_beads_batch(vols, params: DoGParameters = DoGParameters()):
    """Detect interest points in a batch of same-shape views.

    `vols`: (V, Z, Y, X) array (device-resident preferred). Returns a
    list of (points (N,3), responses (N,)) per view — the multi-view
    fast path of `detect_beads` (one dispatch for the whole batch).
    """
    vols = jnp.asarray(vols)
    packed = np.asarray(_detect_device_batch(vols, params))
    counts = packed[:, 0, 0]
    kh = packed.shape[1] - 1
    if np.any(counts > kh):  # > HOT_ROWS peaks somewhere: exact refetch
        packed = np.asarray(_detect_device_batch_full(vols, params))
        return [_unpack(packed[v]) for v in range(packed.shape[0])]
    return [_unpack(packed[v, 1:]) for v in range(packed.shape[0])]


def detect_beads(vol, params: DoGParameters = DoGParameters()):
    """Detect interest points in one view volume.

    Returns (points (N,3) np.float32 full-res (z,y,x), responses (N,)) with
    only valid rows (host-side compaction — the device program is static).
    `vol` may be a device array (preferred in loops: avoids re-uploading
    the volume every call — a 256^3 upload over the remote tunnel costs
    ~1.6 s, 30x the detection program itself).
    """
    vol = jnp.asarray(vol)
    packed = np.asarray(_detect_device_hot(vol, params))
    kh = packed.shape[0] - 1
    if packed[0, 0] > kh:  # > HOT_ROWS peaks: exact full-budget refetch
        packed = np.asarray(_detect_device(vol, params))
        return _unpack(packed)
    return _unpack(packed[1:])


def detect_beads_dataset(dataset, view_ids=None, label: str = "beads",
                         params: DoGParameters = DoGParameters(),
                         max_batch_views: int = 8, mesh=None) -> None:
    """Run detection over dataset views and store InterestPoints (stage 1
    of the pipeline; the reference's Interest_Point_Detection plugin).

    Views are grouped by shape and each group runs through
    `detect_beads_batch` — ONE device program + ONE packed transfer per
    batch (P2 per-view parallelism; on the remote tunnel the per-call
    dispatch is ~25 ms, which dominated per-view dispatching).

    Memory: images are loaded lazily PER BATCH (at most `max_batch_views`
    views resident at once) so host RSS and the device upload stay
    bounded for realistic datasets (dozens of 512^3 views) instead of
    stacking the whole dataset up front.

    `mesh`: a `jax.sharding.Mesh` routes each view through the z-sharded
    multi-chip detection engine (`parallel.sharded_detect_beads`) — the
    production P5/P6 path: views too large for one chip are z-sharded,
    and on a multi-host mesh every process calls this with the same
    data."""
    if view_ids is None:
        view_ids = sorted(dataset.views)
    param_str = (f"DoG s={params.sigma} t={params.threshold} "
                 f"ds=xy{params.downsample_xy}/z{params.downsample_z}")

    if mesh is not None:
        from spim_registration_tpu.parallel.sharded_detect import (
            sharded_detect_beads,
        )

        axis = mesh.axis_names[-1]
        for vid in view_ids:
            img = np.asarray(dataset.get_image(vid))
            pts, resp = sharded_detect_beads(img, params, mesh,
                                             axis_name=axis)
            dataset.set_interest_points(vid, label, pts, resp,
                                        parameters=param_str)
        return

    by_shape: dict = {}
    for vid in view_ids:
        shape = tuple(dataset.views[vid].size) \
            if dataset.views[vid].size else None
        by_shape.setdefault(shape, []).append(vid)

    def _store(vids, results):
        for vid, (pts, resp) in zip(vids, results):
            dataset.set_interest_points(vid, label, pts, resp,
                                        parameters=param_str)

    for shape, vids in by_shape.items():
        for i in range(0, len(vids), max_batch_views):
            chunk = vids[i:i + max_batch_views]
            imgs = [np.asarray(dataset.get_image(v)) for v in chunk]
            if shape is None or any(im.shape != imgs[0].shape
                                    for im in imgs):
                # declared sizes were missing/stale: detect per view
                _store(chunk, [detect_beads(im, params) for im in imgs])
            elif len(chunk) == 1:
                _store(chunk, [detect_beads(imgs[0], params)])
            else:
                _store(chunk, detect_beads_batch(np.stack(imgs), params))
            del imgs
