"""Dataset definition from raw files on disk.

Reference parity: `Define_Multi_View_Dataset` + the `StackList*` dataset
managers (SURVEY.md section 2.2): build the dataset XML from a filename
pattern with {tp}/{setup} (or {angle}/{channel}/{illum}/{tile})
placeholders, probing each file for its size. Supports .tif stacks and
.npy volumes.
"""

from __future__ import annotations

import glob
import itertools
import os
import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from spim_registration_tpu.core.dataset import Dataset, ViewDescription
from spim_registration_tpu.core.imgloaders import (
    npy_loader,
    tiff_stack_loader,
)


def _probe_shape(path: str) -> Tuple[int, int, int]:
    if path.endswith(".npy"):
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _f, _dt = np.lib.format._read_array_header(f, version)
        return tuple(shape)
    import imageio.v3 as iio

    vol = iio.imread(path)
    return tuple(vol.shape) if vol.ndim == 3 else (1,) + tuple(vol.shape)


def define_dataset(
    base_path: str,
    pattern: str,
    timepoints: Optional[Sequence[int]] = None,
    setups: Optional[Sequence[int]] = None,
    angles: Optional[Dict[int, int]] = None,
    voxel_size: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Dataset:
    """Build a Dataset from files matching `pattern`.

    Pattern placeholders: {tp} and {setup}. If timepoints/setups are not
    given, they are discovered by globbing.
    """
    ds = Dataset(base_path=base_path)
    if timepoints is None or setups is None:
        rx = re.escape(pattern)
        rx = rx.replace(r"\{tp\}", r"(?P<tp>\d+)")
        rx = rx.replace(r"\{setup\}", r"(?P<setup>\d+)")
        tps, sts = set(), set()
        for f in os.listdir(base_path):
            m = re.fullmatch(rx, f)
            if m:
                tps.add(int(m.group("tp")))
                sts.add(int(m.group("setup")))
        if not tps:
            raise FileNotFoundError(
                f"no files matching {pattern!r} in {base_path}")
        timepoints = sorted(tps) if timepoints is None else timepoints
        setups = sorted(sts) if setups is None else setups

    for tp, s in itertools.product(timepoints, setups):
        path = os.path.join(base_path, pattern.format(tp=tp, setup=s))
        if not os.path.exists(path):
            vd = ViewDescription(view_id=(tp, s), present=False)
            ds.add_view(vd)
            continue
        shape = _probe_shape(path)
        vd = ViewDescription(
            view_id=(tp, s),
            angle=(angles or {}).get(s, s),
            size=shape, voxel_size=voxel_size)
        ds.add_view(vd)

    if voxel_size != (1.0, 1.0, 1.0):
        from spim_registration_tpu.pipeline.tools import specify_calibration

        specify_calibration(ds, voxel_size)

    if pattern.endswith(".npy"):
        ds.loader = npy_loader(base_path, pattern)
    else:
        ds.loader = tiff_stack_loader(base_path, pattern)
    return ds
