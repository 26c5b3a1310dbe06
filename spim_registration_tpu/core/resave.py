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


def resave_hdf5(dataset: Dataset, h5_path: str,
                view_ids=None, max_levels: int = 4,
                chunk: Tuple[int, int, int] = (16, 64, 64),
                dtype=np.float32) -> None:
    """Write views (+pyramids) to HDF5; attach an hdf5 loader to dataset."""
    import h5py
    import jax.numpy as jnp

    from spim_registration_tpu.core.imgloaders import hdf5_loader

    if view_ids is None:
        view_ids = sorted(dataset.views)
    with h5py.File(h5_path, "w") as f:
        done_setups = set()
        for vid in view_ids:
            tp, setup = vid
            vol = np.asarray(dataset.get_image(vid))
            levels = _mipmap_levels(vol.shape, max_levels)
            if setup not in done_setups:
                g = f.require_group(f"s{setup:02d}")
                # BDV stores resolutions as (x, y, z) per level
                g.create_dataset(
                    "resolutions",
                    data=np.asarray([lv[::-1] for lv in levels], np.float64))
                g.create_dataset(
                    "subdivisions",
                    data=np.asarray([chunk[::-1]] * len(levels), np.int32))
                done_setups.add(setup)
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
    dataset.loader = hdf5_loader(h5_path)
