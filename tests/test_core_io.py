"""Dataset model + XML/HDF5/TIFF persistence tests."""

import os

import numpy as np
import pytest

from spim_registration_tpu.core.dataset import (
    BoundingBox,
    Dataset,
    ViewDescription,
)
from spim_registration_tpu.core.imgloaders import (
    hdf5_loader,
    memory_loader,
    save_tiff_stack,
    tiff_stack_loader,
)
from spim_registration_tpu.core.resave import resave_hdf5
from spim_registration_tpu.core.xml_io import (
    affine_zyx_to_xyz,
    load_dataset,
    save_dataset,
)


def _make_dataset(rng, tmp_path):
    ds = Dataset(base_path=str(tmp_path))
    vols = {}
    for tp in range(2):
        for s in range(3):
            vd = ViewDescription(view_id=(tp, s), angle=s * 45, channel=0,
                                 illumination=0, tile=0, size=(16, 20, 24),
                                 voxel_size=(2.0, 0.5, 0.5))
            A = np.concatenate([np.eye(3), rng.normal(size=(3, 1))], axis=1)
            vd.set_transform("calibration", A)
            ds.add_view(vd)
            vols[(tp, s)] = rng.uniform(size=(16, 20, 24)).astype(np.float32)
    ds.loader = memory_loader(vols)
    ds.set_interest_points((0, 1), "beads",
                           rng.uniform(0, 16, (7, 3)),
                           rng.uniform(size=7), parameters="sigma=1.8")
    ds.views[(0, 1)].interest_points["beads"].correspondences.append(
        (0, (0, 2), "beads", 3))
    ds.bounding_boxes["bb"] = BoundingBox("bb", (1, 2, 3), (11, 12, 13))
    return ds, vols


def test_affine_roundtrip(rng):
    A = rng.normal(size=(3, 4))
    B = affine_zyx_to_xyz(affine_zyx_to_xyz(A))
    np.testing.assert_allclose(A, B)
    # xyz transform must act on reversed coords identically
    p = rng.normal(size=3)
    w_zyx = A[:, :3] @ p + A[:, 3]
    Ax = affine_zyx_to_xyz(A)
    w_xyz = Ax[:, :3] @ p[::-1] + Ax[:, 3]
    np.testing.assert_allclose(w_zyx, w_xyz[::-1])


def test_xml_roundtrip(rng, tmp_path):
    ds, _ = _make_dataset(rng, tmp_path)
    xml = str(tmp_path / "dataset.xml")
    save_dataset(ds, xml)
    ds2 = load_dataset(xml)
    assert sorted(ds2.views) == sorted(ds.views)
    vd, vd2 = ds.views[(1, 2)], ds2.views[(1, 2)]
    assert vd2.angle == vd.angle
    assert vd2.size == vd.size
    assert vd2.voxel_size == vd.voxel_size
    np.testing.assert_allclose(vd2.model(), vd.model(), atol=1e-9)
    ips = ds2.views[(0, 1)].interest_points["beads"]
    np.testing.assert_allclose(
        ips.points, ds.views[(0, 1)].interest_points["beads"].points,
        atol=1e-5)
    assert ips.correspondences == [(0, (0, 2), "beads", 3)]
    assert ips.parameters == "sigma=1.8"
    bb = ds2.bounding_boxes["bb"]
    assert bb.min == (1, 2, 3) and bb.max == (11, 12, 13)


def test_xml_backups(rng, tmp_path):
    ds, _ = _make_dataset(rng, tmp_path)
    xml = str(tmp_path / "dataset.xml")
    save_dataset(ds, xml)
    save_dataset(ds, xml)
    save_dataset(ds, xml)
    assert os.path.exists(xml)
    assert os.path.exists(xml + "~1")
    assert os.path.exists(xml + "~2")


def test_tiff_roundtrip(rng, tmp_path):
    vol = (rng.uniform(0, 65535, (5, 6, 7))).astype(np.uint16)
    path = str(tmp_path / "tp0_setup0.tif")
    save_tiff_stack(path, vol)
    loader = tiff_stack_loader(str(tmp_path))
    out = loader((0, 0))
    np.testing.assert_array_equal(out, vol)


def test_resave_hdf5_pyramid(rng, tmp_path):
    ds, vols = _make_dataset(rng, tmp_path)
    # bigger volume so we get >1 level
    big = {k: rng.uniform(size=(64, 64, 64)).astype(np.float32)
           for k in vols}
    for vd in ds.views.values():
        vd.size = (64, 64, 64)
    ds.loader = memory_loader(big)
    h5 = str(tmp_path / "data.h5")
    resave_hdf5(ds, h5, max_levels=2)
    out = ds.get_image((0, 1))  # loader now points at hdf5
    np.testing.assert_allclose(out, big[(0, 1)], atol=1e-6)
    l1 = hdf5_loader(h5, level=1)((0, 1))
    assert l1.shape == (32, 32, 32)
    manual = big[(0, 1)][:2, :2, :2].mean()
    np.testing.assert_allclose(l1[0, 0, 0], manual, rtol=1e-4)


def test_append_fused_hdf5_roundtrip(rng, tmp_path):
    """AppendSpimData2HDF5 analog: a fused volume becomes a NEW view
    setup of an existing BDV-HDF5 dataset — re-opened through the XML +
    hdf5 loader, with the bbox offset on the transform chain."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.core.resave import append_fused_hdf5
    from spim_registration_tpu.core.xml_io import load_dataset

    ds, vols = _make_dataset(rng, tmp_path)
    big = {k: rng.uniform(size=(64, 64, 64)).astype(np.float32)
           for k in vols}
    for vd in ds.views.values():
        vd.size = (64, 64, 64)
    ds.loader = memory_loader(big)
    h5 = str(tmp_path / "data.h5")
    resave_hdf5(ds, h5, max_levels=2)

    fused = rng.uniform(size=(64, 80, 80)).astype(np.float32)
    bbox = BoundingBox("fbb", (4, 8, 8), (68, 88, 88))
    xml = str(tmp_path / "appended.xml")
    vid = append_fused_hdf5(ds, h5, fused, timepoint=0, bbox=bbox,
                            xml_path=xml)
    # new setup id past the existing ones; original views still load
    assert vid[1] == max(s for s in ds.setups() if s != vid[1]) + 1
    np.testing.assert_allclose(ds.get_image((0, 1)), big[(0, 1)],
                               atol=1e-6)
    np.testing.assert_allclose(ds.get_image(vid), fused, atol=1e-6)

    # round-trip through the saved XML + a fresh hdf5 loader
    ds2 = load_dataset(xml)
    assert vid in ds2.views
    ds2.loader = hdf5_loader(h5)
    np.testing.assert_allclose(ds2.get_image(vid), fused, atol=1e-6)
    # the bbox-min offset sits on the transform chain
    np.testing.assert_allclose(ds2.views[vid].model()[:, 3],
                               [4.0, 8.0, 8.0])
    # appended setup has its own mipmap pyramid
    l1 = hdf5_loader(h5, level=1)(vid)
    assert l1.shape == (32, 40, 40)
