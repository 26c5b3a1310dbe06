"""TensorStore-backed zarr/n5 store: roundtrips, resave pyramids,
streaming fusion on compressed storage, RL checkpoint/resume."""

import json
import os

import numpy as np
import pytest

ts = pytest.importorskip("tensorstore")

from spim_registration_tpu.core.dataset import (  # noqa: E402
    BoundingBox,
    Dataset,
    ViewDescription,
)
from spim_registration_tpu.core.imgloaders import memory_loader  # noqa: E402
from spim_registration_tpu.core.zarr_store import (  # noqa: E402
    ZarrCheckpointer,
    create_volume,
    n5_bdv_loader,
    open_volume,
    resave_n5_bdv,
    resave_zarr,
    zarr_loader,
)


def _make_dataset(rng, tmp_path, shape=(64, 64, 64), n_tp=1, n_setup=2):
    ds = Dataset(base_path=str(tmp_path))
    vols = {}
    for tp in range(n_tp):
        for s in range(n_setup):
            vd = ViewDescription(view_id=(tp, s), angle=s * 45, channel=0,
                                 illumination=0, tile=0, size=shape,
                                 voxel_size=(1.0, 1.0, 1.0))
            ds.add_view(vd)
            vols[(tp, s)] = rng.uniform(size=shape).astype(np.float32)
    ds.loader = memory_loader(vols)
    return ds, vols


def test_volume_roundtrip_blocks(tmp_path):
    v = create_volume(str(tmp_path / "a"), (16, 24, 32), chunks=(8, 8, 8))
    data = np.arange(16 * 24 * 32, dtype=np.float32).reshape(16, 24, 32)
    v.write(data)
    np.testing.assert_array_equal(v.read(), data)
    blk = v.read_block((2, 3, 4), (10, 11, 12))
    np.testing.assert_array_equal(blk, data[2:10, 3:11, 4:12])
    v.write_block((0, 0, 0), np.zeros((4, 4, 4), np.float32))
    assert v[0, 0, 0] == 0.0
    reopened = open_volume(str(tmp_path / "a"))
    assert reopened.shape == (16, 24, 32)
    np.testing.assert_array_equal(reopened[5], data[5])


def test_resave_zarr_pyramid(rng, tmp_path):
    ds, vols = _make_dataset(rng, tmp_path)
    base = str(tmp_path / "data.zarr")
    resave_zarr(ds, base, max_levels=2)
    # loader attached, reads full res back
    np.testing.assert_allclose(ds.get_image((0, 1)), vols[(0, 1)],
                               atol=1e-6)
    # level 1 is the 2x downsample
    l1 = zarr_loader(base, level=1)((0, 1))
    assert l1.shape == (32, 32, 32)
    manual = vols[(0, 1)][:2, :2, :2].mean()
    np.testing.assert_allclose(l1[0, 0, 0], manual, rtol=1e-4)
    meta = json.load(open(os.path.join(base, "meta.json")))
    assert meta["setups"]["1"]["resolutions"] == [[1, 1, 1], [2, 2, 2]]


def test_resave_n5_bdv_layout(rng, tmp_path):
    ds, vols = _make_dataset(rng, tmp_path, shape=(32, 48, 64))
    base = str(tmp_path / "data.n5")
    resave_n5_bdv(ds, base, max_levels=1, dtype=np.uint16)
    # BDV layout: setup{s}/timepoint{t}/s{level}, x/y/z dims
    attrs = json.load(open(os.path.join(base, "setup0",
                                        "attributes.json")))
    assert attrs["dataType"] == "uint16"
    assert attrs["downsamplingFactors"] == [[1, 1, 1]]
    dset = json.load(open(os.path.join(base, "setup0", "timepoint0", "s0",
                                       "attributes.json")))
    assert dset["dimensions"] == [64, 48, 32]  # x, y, z
    # loader transposes back to (z, y, x) and preserves values to
    # uint16 quantization
    out = n5_bdv_loader(base)((0, 0))
    assert out.shape == (32, 48, 64)
    gmax = max(float(v.max()) for v in vols.values())
    np.testing.assert_allclose(out * gmax / 65535.0, vols[(0, 0)],
                               atol=gmax / 65535.0 + 1e-6)


def test_streaming_fusion_into_zarr(rng, tmp_path):
    from spim_registration_tpu.fuse import FusionParameters, fuse_views
    from spim_registration_tpu.fuse.streaming import fuse_views_streaming
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    scene = make_multiview_scene(rng, n_views=2, shape=(48, 48, 48),
                                 n_beads=20, noise=0.0)
    bbox = BoundingBox("b", (8, 8, 8), (40, 40, 40))
    params = FusionParameters()
    ref = fuse_views(scene.volumes, scene.models, bbox, params)

    stores = []
    for i, vol in enumerate(scene.volumes):
        st = create_volume(str(tmp_path / f"v{i}"), vol.shape,
                           chunks=(16, 16, 16))
        st.write(vol)
        stores.append(st)
    out = create_volume(str(tmp_path / "fused"), bbox.shape,
                        chunks=(16, 16, 16))
    fuse_views_streaming(stores, scene.models, bbox, out, params,
                         block=(16, 32, 32))
    np.testing.assert_allclose(out.read(), ref, atol=2e-4)


def test_zarr_checkpoint_resume(rng, tmp_path):
    ck = ZarrCheckpointer(str(tmp_path / "ckpt"))
    it0, psi0 = ck.load_latest()
    assert it0 == 0 and psi0 is None
    psi = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    ck.save(12, psi)
    it, restored = ck.load_latest()
    assert it == 12
    np.testing.assert_array_equal(restored, psi)


def test_cli_resave_zarr(rng, tmp_path):
    from spim_registration_tpu.cli import main
    from spim_registration_tpu.core.xml_io import save_dataset

    ds, vols = _make_dataset(rng, tmp_path, shape=(32, 32, 32))
    # persist images so the CLI can reload them
    resave_zarr(ds, str(tmp_path / "orig.zarr"), max_levels=1)
    xml = str(tmp_path / "dataset.xml")
    save_dataset(ds, xml)
    rc = main(["resave", xml, "--format", "zarr",
               "--out", str(tmp_path / "re.zarr"), "--levels", "1"])
    assert not rc
    out = zarr_loader(str(tmp_path / "re.zarr"))((0, 0))
    np.testing.assert_allclose(out, vols[(0, 0)], atol=1e-6)
