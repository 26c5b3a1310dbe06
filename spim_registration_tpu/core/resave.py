"""Resave a dataset to multi-resolution BDV-style HDF5.

Reference parity: `spim/fiji/plugin/resave/Resave_HDF5` /
`Generic_Resave_HDF5` (SURVEY.md section 2.2): every view is written as a
mipmap pyramid `t{tp:05d}/s{setup:02d}/{level}/cells` with per-level
subsampling factors recorded under `s{setup:02d}/resolutions`, chunked for
blockwise access — the layout BigDataViewer reads. (We write the same
group structure; BDV additionally expects int16 + custom attributes, which
`dtype` can emulate.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from spim_registration_tpu.core.dataset import Dataset
from spim_registration_tpu.ops.downsample import downsample


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


def _write_setup_meta(f, setup, levels, chunk) -> None:
    if f"s{setup:02d}" not in f:
        g = f.require_group(f"s{setup:02d}")
        # BDV stores resolutions as (x, y, z) per level
        g.create_dataset(
            "resolutions",
            data=np.asarray([lv[::-1] for lv in levels], np.float64))
        g.create_dataset(
            "subdivisions",
            data=np.asarray([chunk[::-1]] * len(levels), np.int32))


def _write_view_pyramid(f, tp, setup, vol, levels, chunk, dtype) -> None:
    import jax.numpy as jnp

    cur = jnp.asarray(vol, jnp.float32)
    prev_factor = (1, 1, 1)
    for li, factor in enumerate(levels):
        step = tuple(f2 // f1 for f1, f2 in zip(prev_factor, factor))
        if any(s > 1 for s in step):
            cur = downsample(cur, step)
            prev_factor = factor
        arr = np.asarray(cur, dtype=dtype)
        ck = tuple(min(c, s) for c, s in zip(chunk, arr.shape))
        f.create_dataset(
            f"t{tp:05d}/s{setup:02d}/{li}/cells", data=arr,
            chunks=ck, compression="gzip", compression_opts=1)


def resave_hdf5(dataset: Dataset, h5_path: str,
                view_ids=None, max_levels: int = 4,
                chunk: Tuple[int, int, int] = (16, 64, 64),
                dtype=np.float32) -> None:
    """Write views (+pyramids) to HDF5; attach an hdf5 loader to dataset."""
    import h5py

    from spim_registration_tpu.core.imgloaders import hdf5_loader

    if view_ids is None:
        view_ids = sorted(dataset.views)
    with h5py.File(h5_path, "w") as f:
        for vid in view_ids:
            tp, setup = vid
            vol = np.asarray(dataset.get_image(vid))
            levels = _mipmap_levels(vol.shape, max_levels)
            _write_setup_meta(f, setup, levels, chunk)
            _write_view_pyramid(f, tp, setup, vol, levels, chunk, dtype)
    dataset.loader = hdf5_loader(h5_path)


def append_fused_hdf5(dataset: Dataset, h5_path: str, volume: np.ndarray,
                      timepoint: int, bbox=None, setup_id=None,
                      max_levels: int = 4,
                      chunk: Tuple[int, int, int] = (16, 64, 64),
                      dtype=np.float32, xml_path=None):
    """Append a fused/deconvolved volume as a NEW view setup of an
    EXISTING BDV-HDF5 dataset.

    Reference parity: `spim/process/fusion/export/AppendSpimData2HDF5` /
    `ExportSpimData2HDF5` (SURVEY.md section 2.5 export row; VERDICT r2
    missing #6): fusion output becomes a first-class view — mipmap
    pyramid written into the same HDF5 (append mode), a new ViewSetup
    registered in the dataset with a translation transform placing the
    volume at `bbox.min` in world coordinates, and (optionally) the XML
    saved. The dataset's loader is extended so BOTH the original views
    (whatever loader they use) and the appended setup load transparently.

    Returns the new (timepoint, setup_id) view id.
    """
    import h5py

    from spim_registration_tpu.core.dataset import (
        ViewDescription,
        ViewTransform,
    )
    from spim_registration_tpu.core.imgloaders import hdf5_loader

    volume = np.asarray(volume)
    if setup_id is None:
        existing = set(dataset.setups())
        with h5py.File(h5_path, "a") as f:
            for k in f:
                if k.startswith("s") and k[1:].isdigit():
                    existing.add(int(k[1:]))
        setup_id = max(existing, default=-1) + 1
    vid = (int(timepoint), int(setup_id))

    levels = _mipmap_levels(volume.shape, max_levels)
    with h5py.File(h5_path, "a") as f:
        _write_setup_meta(f, setup_id, levels, chunk)
        _write_view_pyramid(f, timepoint, setup_id, volume, levels, chunk,
                            dtype)

    offset = np.zeros(3) if bbox is None else np.asarray(bbox.min, float)
    A = np.concatenate([np.eye(3), offset[:, None]], axis=1)
    vd = ViewDescription(
        view_id=vid, size=tuple(int(s) for s in volume.shape),
        transforms=[ViewTransform("fused bounding box offset", A)])
    dataset.add_view(vd)

    # composite loader: appended setup from the HDF5, everything else
    # through the previous loader (the original dataset may be TIFF/CZI)
    prev = dataset.loader
    new_load = hdf5_loader(h5_path)
    appended = {vid}

    def load(view_id):
        if view_id in appended or prev is None:
            return new_load(view_id)
        return prev(view_id)

    dataset.loader = load

    if xml_path is not None:
        from spim_registration_tpu.core.xml_io import save_dataset

        save_dataset(dataset, xml_path)
    return vid
