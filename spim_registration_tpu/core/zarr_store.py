"""Zarr / BDV-N5 chunked volume store backed by TensorStore.

Reference parity: `spim/fiji/plugin/resave/Resave_HDF5` /
`Generic_Resave_HDF5` write BigDataViewer multi-resolution HDF5
(SURVEY.md section 2.2); SURVEY.md section 7.1 specifies our build's
store as "Zarr/TensorStore-backed volumes" and section 5 uses it as the
checkpoint substrate. This module provides:

- `TSVolume` — a chunked on-disk volume with the same blockwise
  read/write interface as the native `RawVolumeStore`
  (`native_blocks.py`), so streaming fusion and block decomposition work
  unchanged on top of compressed cloud-ready storage.
- `resave_zarr` / `zarr_loader` — our native multi-resolution layout
  (`t{tp:05d}/s{setup:02d}/{level}`, z/y/x order, mirroring the HDF5
  resave tree in `core/resave.py`).
- `resave_n5_bdv` / `n5_bdv_loader` — the BigDataViewer **bdv.n5**
  layout (`setup{s}/timepoint{t}/s{level}` with x/y/z dimension order and
  per-setup `downsamplingFactors`/`dataType` attributes), so exports open
  directly in BDV/Fiji — the interop the reference achieves with its
  HDF5 writer.
- `ZarrCheckpointer` — psi checkpoints for long deconvolutions
  (SURVEY.md section 5 checkpoint row).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from spim_registration_tpu.core.dataset import Dataset, ViewId

try:
    import tensorstore as ts
except ImportError:  # pragma: no cover - tensorstore is in the image
    ts = None


def _require_ts():
    if ts is None:  # pragma: no cover
        raise RuntimeError("tensorstore is not available")
    return ts


_NP_TO_TS = {
    np.dtype(np.float32): "float32",
    np.dtype(np.float64): "float64",
    np.dtype(np.uint16): "uint16",
    np.dtype(np.uint8): "uint8",
    np.dtype(np.int16): "int16",
    np.dtype(np.int32): "int32",
}


class TSVolume:
    """Chunked on-disk volume (zarr or n5) with blockwise IO.

    Duck-type compatible with `native_blocks.RawVolumeStore`: exposes
    `.shape`, `.read_block(lo, hi)`, `.write_block(lo, block)`; adds
    whole-array `read()` / `write()` and numpy-style slicing.
    """

    def __init__(self, store):
        self._store = store
        self.shape = tuple(int(s) for s in store.shape)
        self.dtype = np.dtype(store.dtype.numpy_dtype)

    # -- blockwise interface (RawVolumeStore parity) --------------------
    def read_block(self, lo, hi) -> np.ndarray:
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        return np.asarray(self._store[sl].read().result())

    def write_block(self, lo, block) -> None:
        block = np.asarray(block, self.dtype)
        sl = tuple(slice(int(a), int(a) + s)
                   for a, s in zip(lo, block.shape))
        self._store[sl].write(block).result()

    # -- convenience -----------------------------------------------------
    def read(self) -> np.ndarray:
        return np.asarray(self._store.read().result())

    def write(self, arr) -> None:
        self._store[...].write(np.asarray(arr, self.dtype)).result()

    def __getitem__(self, sl) -> np.ndarray:
        return np.asarray(self._store[sl].read().result())


def _spec(driver: str, path: str) -> dict:
    return {"driver": driver,
            "kvstore": {"driver": "file", "path": path}}


def create_volume(path: str, shape: Sequence[int],
                  dtype=np.float32,
                  chunks: Sequence[int] = (64, 64, 64),
                  driver: str = "zarr") -> TSVolume:
    """Create a chunked volume at `path` (zarr by default)."""
    t = _require_ts()
    dt = _NP_TO_TS[np.dtype(dtype)]
    chunks = tuple(min(int(c), int(s)) for c, s in zip(chunks, shape))
    store = t.open(
        _spec(driver, path), create=True, delete_existing=True,
        dtype=getattr(t, dt), shape=[int(s) for s in shape],
        chunk_layout=t.ChunkLayout(chunk_shape=list(chunks)),
    ).result()
    return TSVolume(store)


def open_volume(path: str, driver: str = "zarr") -> TSVolume:
    t = _require_ts()
    return TSVolume(t.open(_spec(driver, path)).result())


# ---------------------------------------------------------------- resave


def _mipmap_levels(shape, max_levels=4):
    levels = [(1, 1, 1)]
    f = np.array([1, 1, 1])
    while len(levels) < max_levels:
        nxt = f * 2
        if any(s // x < 32 for s, x in zip(shape, nxt)):
            break
        f = nxt
        levels.append(tuple(int(v) for v in f))
    return levels


def _pyramid(vol: np.ndarray, levels, dtype):
    """Yield (level_index, factors, level_volume) downsampled on device."""
    import jax.numpy as jnp

    from spim_registration_tpu.ops.downsample import downsample

    cur = jnp.asarray(vol, jnp.float32)
    prev = (1, 1, 1)
    for li, factor in enumerate(levels):
        step = tuple(f2 // f1 for f1, f2 in zip(prev, factor))
        if any(s > 1 for s in step):
            cur = downsample(cur, step)
            prev = factor
        yield li, factor, np.asarray(cur, dtype=dtype)


def resave_zarr(dataset: Dataset, base_path: str, view_ids=None,
                max_levels: int = 4,
                chunk: Tuple[int, int, int] = (16, 64, 64),
                dtype=np.float32) -> None:
    """Write views (+pyramids) as zarr arrays; attach a zarr loader.

    Layout mirrors the HDF5 resave tree (`core/resave.py`):
    `{base}/t{tp:05d}/s{setup:02d}/{level}` arrays in (z, y, x) order,
    with per-setup `resolutions` recorded in `{base}/meta.json`.
    """
    if view_ids is None:
        view_ids = sorted(dataset.views)
    meta = {"format": "spim-zarr", "setups": {}}
    for vid in view_ids:
        tp, setup = vid
        vol = np.asarray(dataset.get_image(vid))
        levels = _mipmap_levels(vol.shape, max_levels)
        meta["setups"].setdefault(
            str(setup), {"resolutions": [list(lv) for lv in levels]})
        for li, _factor, arr in _pyramid(vol, levels, dtype):
            path = os.path.join(base_path, f"t{tp:05d}", f"s{setup:02d}",
                                str(li))
            create_volume(path, arr.shape, dtype=dtype,
                          chunks=chunk).write(arr)
    os.makedirs(base_path, exist_ok=True)
    with open(os.path.join(base_path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    dataset.loader = zarr_loader(base_path)


def zarr_loader(base_path: str, level: int = 0
                ) -> Callable[[ViewId], np.ndarray]:
    """Loader seam over a `resave_zarr` tree."""

    def load(view_id: ViewId) -> np.ndarray:
        tp, setup = view_id
        path = os.path.join(base_path, f"t{tp:05d}", f"s{setup:02d}",
                            str(level))
        return open_volume(path).read()

    return load


def _merge_attributes(dataset_dir: str, extra: dict) -> None:
    """Merge keys into an n5 dataset's attributes.json (tensorstore wrote
    the array metadata; BDV additionally reads custom attributes)."""
    p = os.path.join(dataset_dir, "attributes.json")
    attrs = {}
    if os.path.exists(p):
        with open(p) as f:
            attrs = json.load(f)
    attrs.update(extra)
    with open(p, "w") as f:
        json.dump(attrs, f)


_N5_DTYPES = {np.dtype(np.uint16): "uint16", np.dtype(np.float32): "float32",
              np.dtype(np.uint8): "uint8", np.dtype(np.int16): "int16"}


def resave_n5_bdv(dataset: Dataset, base_path: str, view_ids=None,
                  max_levels: int = 4,
                  chunk: Tuple[int, int, int] = (16, 64, 64),
                  dtype=np.uint16, scale: Optional[float] = None) -> None:
    """Write views as a BigDataViewer **bdv.n5** container.

    Layout (matches bigdataviewer-core's N5ImageLoader, the modern
    equivalent of the reference's `Resave_HDF5` BDV export):
    `setup{s}/timepoint{t}/s{level}` datasets with x/y/z dimension order,
    per-setup attributes `{downsamplingFactors, dataType}`, per-dataset
    `downsamplingFactors`. `scale` rescales float data into the uint16
    range (auto: 65535 / global max when dtype is uint16).
    """
    if view_ids is None:
        view_ids = sorted(dataset.views)
    dtype = np.dtype(dtype)
    if scale is None and dtype == np.uint16:
        gmax = max(float(np.asarray(dataset.get_image(v)).max())
                   for v in view_ids) or 1.0
        scale = 65535.0 / gmax
    os.makedirs(base_path, exist_ok=True)
    _merge_attributes(base_path, {"n5": "2.0.0"})
    done_setups = set()
    for vid in view_ids:
        tp, setup = vid
        vol = np.asarray(dataset.get_image(vid), np.float32)
        if scale is not None and dtype != np.float32:
            vol = np.clip(vol * scale, 0,
                          np.iinfo(dtype).max if dtype.kind in "ui"
                          else np.inf)
        levels = _mipmap_levels(vol.shape, max_levels)
        setup_dir = os.path.join(base_path, f"setup{setup}")
        if setup not in done_setups:
            os.makedirs(setup_dir, exist_ok=True)
            _merge_attributes(setup_dir, {
                # BDV lists factors in x,y,z order
                "downsamplingFactors": [list(lv[::-1]) for lv in levels],
                "dataType": _N5_DTYPES[dtype],
            })
            done_setups.add(setup)
        for li, factor, arr in _pyramid(vol, levels, dtype):
            path = os.path.join(setup_dir, f"timepoint{tp}", f"s{li}")
            # N5 dimension order is x,y,z (fastest first): store the
            # transposed volume so BDV reads the geometry correctly.
            v = create_volume(path, arr.T.shape, dtype=dtype,
                              chunks=chunk[::-1], driver="n5")
            v.write(np.ascontiguousarray(arr.T))
            _merge_attributes(path, {
                "downsamplingFactors": list(factor[::-1])})
    dataset.loader = n5_bdv_loader(base_path)


def n5_bdv_loader(base_path: str, level: int = 0
                  ) -> Callable[[ViewId], np.ndarray]:
    """Loader over a bdv.n5 tree; returns (z, y, x) float32."""

    def load(view_id: ViewId) -> np.ndarray:
        tp, setup = view_id
        path = os.path.join(base_path, f"setup{setup}", f"timepoint{tp}",
                            f"s{level}")
        return np.ascontiguousarray(
            open_volume(path, driver="n5").read().T).astype(np.float32)

    return load


# ------------------------------------------------------------ checkpoints


class ZarrCheckpointer:
    """psi checkpoints for long RL runs (pass `.save` as `checkpoint_fn`
    to `DeconvolutionRunner.run_checkpointed`); `.load_latest()` resumes.
    """

    def __init__(self, base_path: str,
                 chunks: Sequence[int] = (32, 128, 128)):
        self.base = base_path
        self.chunks = tuple(chunks)
        os.makedirs(base_path, exist_ok=True)
        self._state_path = os.path.join(base_path, "state.json")

    def save(self, iteration: int, psi: np.ndarray) -> None:
        vol = create_volume(os.path.join(self.base, "psi"), psi.shape,
                            dtype=np.float32, chunks=self.chunks)
        vol.write(psi)
        with open(self._state_path, "w") as f:
            json.dump({"iteration": int(iteration),
                       "shape": list(psi.shape)}, f)

    def load_latest(self):
        """Returns (iteration, psi) or (0, None) when no checkpoint."""
        if not os.path.exists(self._state_path):
            return 0, None
        with open(self._state_path) as f:
            state = json.load(f)
        psi = open_volume(os.path.join(self.base, "psi")).read()
        return int(state["iteration"]), psi
