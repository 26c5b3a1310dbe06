"""Pluggable image loaders.

Reference parity: `spim/fiji/spimdata/imgloaders/` (SURVEY.md section 2.1)
— TIFF stacks (StackImgLoaderIJ), BDV HDF5, plus modern conveniences
(npy/npz, in-memory). Proprietary formats (CZI/MicroManager/DHM) keep the
loader seam but are out of scope without Bio-Formats (section 2.12).

A loader is `(view_id) -> np.ndarray (z, y, x)`; `Dataset.loader` holds one.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Sequence, Tuple

import numpy as np

ViewId = Tuple[int, int]


def memory_loader(volumes: Dict[ViewId, np.ndarray]) -> Callable:
    """Views held in RAM (tests / simulation)."""

    def load(view_id: ViewId) -> np.ndarray:
        return volumes[view_id]

    return load


def npy_loader(base_path: str, pattern: str = "tp{tp}_setup{setup}.npy"
               ) -> Callable:
    def load(view_id: ViewId) -> np.ndarray:
        tp, setup = view_id
        return np.load(os.path.join(base_path,
                                    pattern.format(tp=tp, setup=setup)))

    return load


def tiff_stack_loader(base_path: str,
                      pattern: str = "tp{tp}_setup{setup}.tif") -> Callable:
    """3D multi-page TIFF per view (the StackImgLoaderIJ layout)."""

    def load(view_id: ViewId) -> np.ndarray:
        import imageio.v3 as iio

        tp, setup = view_id
        path = os.path.join(base_path, pattern.format(tp=tp, setup=setup))
        vol = np.asarray(iio.imread(path))
        if vol.ndim == 2:
            vol = vol[None]
        return vol

    return load


def save_tiff_stack(path: str, vol: np.ndarray) -> None:
    """Write a (z, y, x) volume as a multi-page TIFF (Save3dTIFF analog)."""
    import imageio.v3 as iio

    iio.imwrite(path, np.asarray(vol))


def hdf5_loader(h5_path: str, level: int = 0) -> Callable:
    """Read views from a BDV-style HDF5 written by `resave_hdf5`
    (`t{tp:05d}/s{setup:02d}/{level}/cells`)."""

    def load(view_id: ViewId) -> np.ndarray:
        import h5py

        tp, setup = view_id
        with h5py.File(h5_path, "r") as f:
            return f[f"t{tp:05d}/s{setup:02d}/{level}/cells"][()]

    return load
