"""Format loaders: CZI (LightSheetZ1), MicroManager, DHM, and the
attribute-pattern dataset definition (SURVEY.md sections 2.1/2.2)."""

import json
import os

import numpy as np
import pytest

import imageio.v3 as iio

from spim_registration_tpu.core.czi import (
    CziFile,
    czi_setups,
    define_dataset_czi,
    write_czi,
)
from spim_registration_tpu.core.define import define_dataset
from spim_registration_tpu.core.dhm import define_dataset_dhm, read_timestamps
from spim_registration_tpu.core.micromanager import (
    define_dataset_micromanager,
)


# -- CZI -------------------------------------------------------------------

def _multiview_czi(tmp_path, dtype=np.uint16, n_tp=2, n_angles=3,
                   n_channels=2, shape=(5, 16, 12)):
    rng = np.random.default_rng(0)
    vols = {}
    for t in range(n_tp):
        for v in range(n_angles):
            for c in range(n_channels):
                arr = rng.integers(0, 1000, size=shape).astype(dtype) \
                    if np.issubdtype(dtype, np.integer) \
                    else rng.random(shape).astype(dtype)
                vols[(t, v, c, 0)] = arr
    path = str(tmp_path / "acq.czi")
    write_czi(path, vols, voxel_size_um=(2.0, 0.5, 0.5))
    return path, vols


def test_czi_roundtrip(tmp_path):
    path, vols = _multiview_czi(tmp_path)
    czi = CziFile(path)
    assert czi.dimension_range("T") == [0, 1]
    assert czi.dimension_range("V") == [0, 1, 2]
    assert czi.angle_dim == "V"
    assert czi.voxel_size_um() == pytest.approx((2.0, 0.5, 0.5))
    for (t, v, c, i), truth in vols.items():
        got = czi.read_view(timepoint=t, angle=v, channel=c, illumination=i)
        np.testing.assert_array_equal(got, truth)


def test_czi_float_and_scene_fallback(tmp_path):
    vols = {(0, 0, 0, 0): np.random.default_rng(1).random(
        (3, 8, 8)).astype(np.float32)}
    path = str(tmp_path / "f.czi")
    write_czi(path, vols, angle_dim="S")  # scenes instead of views
    czi = CziFile(path)
    assert czi.angle_dim == "S"
    got = czi.read_view(timepoint=0, angle=0)
    np.testing.assert_array_equal(got, vols[(0, 0, 0, 0)])
    assert got.dtype == np.float32


def test_czi_define_dataset(tmp_path):
    path, vols = _multiview_czi(tmp_path, n_tp=1)
    ds = define_dataset_czi(path)
    assert ds.timepoints() == [0]
    assert len(ds.setups()) == 6  # 3 angles x 2 channels
    setups = czi_setups(CziFile(path))
    for s, (a, c, i, m) in enumerate(setups):
        vd = ds.views[(0, s)]
        assert (vd.angle, vd.channel, vd.illumination, vd.tile) \
            == (a, c, i, m)
        np.testing.assert_array_equal(ds.get_image((0, s)),
                                      vols[(0, a, c, i)])
    # anisotropic calibration transform attached
    assert any(t.name == "calibration" for t in ds.views[(0, 0)].transforms)


def test_czi_missing_view_raises(tmp_path):
    path, _ = _multiview_czi(tmp_path, n_tp=1, n_angles=1, n_channels=1)
    with pytest.raises(KeyError):
        CziFile(path).read_view(timepoint=5)


# -- MicroManager ----------------------------------------------------------

def _mm_dataset(tmp_path, frames=2, slices=4, channels=2, positions=2,
                slices_first=False):
    rng = np.random.default_rng(2)
    truth = {}  # (frame, channel, pos) -> stack
    base = tmp_path / "mm"
    base.mkdir()
    for pos in range(positions):
        pages = []
        for f in range(frames):
            planes = {}
            for c in range(channels):
                stack = rng.integers(0, 4000, size=(
                    slices, 10, 12)).astype(np.uint16)
                truth[(f, c, pos)] = stack
                planes[c] = stack
            if slices_first:
                for c in range(channels):
                    pages.extend(planes[c])
            else:
                for s in range(slices):
                    for c in range(channels):
                        pages.append(planes[c][s])
        iio.imwrite(str(base / f"acq_MMStack_Pos{pos}.ome.tif"),
                    np.stack(pages))
    summary = {"Summary": {
        "Frames": frames, "Slices": slices, "Channels": channels,
        "Positions": positions, "SlicesFirst": slices_first,
        "z-step_um": 1.5, "PixelSize_um": 0.5}}
    (base / "metadata.txt").write_text(json.dumps(summary))
    return str(base), truth


@pytest.mark.parametrize("slices_first", [False, True])
def test_micromanager_roundtrip(tmp_path, slices_first):
    base, truth = _mm_dataset(tmp_path, slices_first=slices_first)
    ds = define_dataset_micromanager(base)
    assert ds.timepoints() == [0, 1]
    assert len(ds.setups()) == 4  # 2 positions x 2 channels
    for (f, c, pos), stack in truth.items():
        vd = ds.views[(f, pos * 2 + c)]
        assert (vd.channel, vd.tile) == (c, pos)
        np.testing.assert_array_equal(ds.get_image((f, pos * 2 + c)), stack)
    assert ds.views[(0, 0)].voxel_size == (1.5, 0.5, 0.5)


# -- DHM -------------------------------------------------------------------

def test_dhm_dataset(tmp_path):
    rng = np.random.default_rng(3)
    base = tmp_path / "dhm"
    truth = {}
    for c, sub in enumerate(["Amplitude", "Phase"]):
        (base / sub).mkdir(parents=True)
        for tp in range(3):
            img = rng.integers(0, 255, size=(9, 11)).astype(np.uint8)
            truth[(tp, c)] = img
            iio.imwrite(str(base / sub / f"frame_{tp:04d}.tif"), img)
    (base / "timestamps.txt").write_text("0 0.0\n1 2.5\n2 5.0\n")
    ds = define_dataset_dhm(str(base))
    assert ds.timepoints() == [0, 1, 2]
    assert ds.setups() == [0, 1]
    for (tp, c), img in truth.items():
        vol = ds.get_image((tp, c))
        assert vol.shape == (1, 9, 11)
        np.testing.assert_array_equal(vol[0], img)
    assert read_timestamps(str(base)) == [0.0, 2.5, 5.0]


# -- attribute-pattern define ---------------------------------------------

def test_define_attribute_pattern(tmp_path):
    rng = np.random.default_rng(4)
    base = tmp_path / "raw"
    base.mkdir()
    truth = {}
    for tp in range(2):
        for a in (0, 90):
            for c in range(2):
                vol = rng.random((4, 6, 8)).astype(np.float32)
                truth[(tp, a, c)] = vol
                np.save(str(base / f"spim_tp{tp}_a{a}_c{c}.npy"), vol)
    ds = define_dataset(str(base), "spim_tp{tp}_a{angle}_c{channel}.npy")
    assert ds.timepoints() == [0, 1]
    assert len(ds.setups()) == 4  # 2 angles x 2 channels
    for (tp, s), vd in sorted(ds.views.items()):
        assert vd.present
        np.testing.assert_array_equal(
            ds.get_image((tp, s)), truth[(tp, vd.angle, vd.channel)])
    angles = sorted({v.angle for v in ds.views.values()})
    assert angles == [0, 90]


def test_define_attribute_pattern_with_holes(tmp_path):
    base = tmp_path / "raw2"
    base.mkdir()
    np.save(str(base / "v_tp0_a0.npy"), np.zeros((2, 3, 4), np.float32))
    np.save(str(base / "v_tp0_a1.npy"), np.zeros((2, 3, 4), np.float32))
    np.save(str(base / "v_tp1_a0.npy"), np.zeros((2, 3, 4), np.float32))
    ds = define_dataset(str(base), "v_tp{tp}_a{angle}.npy")
    assert ds.views[(1, 1)].present is False
    assert ds.views[(1, 0)].present is True
