"""Streaming fusion must equal in-memory fusion block for block."""

import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.fuse import FusionParameters, fuse_views
from spim_registration_tpu.fuse.streaming import fuse_views_streaming
from spim_registration_tpu.native_blocks import RawVolumeStore
from spim_registration_tpu.utils.simulation import make_multiview_scene


def test_streaming_fusion_matches_in_memory(rng, tmp_path):
    scene = make_multiview_scene(rng, n_views=3, shape=(64, 64, 64),
                                 n_beads=40, noise=0.0)
    bbox = BoundingBox("b", (8, 8, 8), (56, 56, 56))
    params = FusionParameters()

    ref = fuse_views(scene.volumes, scene.models, bbox, params)

    stores = []
    for v, vol in enumerate(scene.volumes):
        st = RawVolumeStore(str(tmp_path / f"v{v}.raw"), vol.shape,
                            create=True)
        st.write_block((0, 0, 0), vol)
        stores.append(st)
    out_store = RawVolumeStore(str(tmp_path / "out.raw"), bbox.shape,
                               create=True)
    fuse_views_streaming(stores, scene.models, bbox, out_store, params,
                         block=(16, 32, 32))
    out = out_store.read_block((0, 0, 0), bbox.shape)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_streaming_fusion_partial_coverage(rng, tmp_path):
    """Blocks whose world extent misses a view entirely must be handled."""
    vol = rng.uniform(0.1, 1.0, (32, 32, 32)).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    # bbox extends well beyond the view
    bbox = BoundingBox("b", (-16, 0, 0), (48, 32, 32))
    st = RawVolumeStore(str(tmp_path / "v.raw"), vol.shape, create=True)
    st.write_block((0, 0, 0), vol)
    out_store = RawVolumeStore(str(tmp_path / "o.raw"), bbox.shape,
                               create=True)
    fuse_views_streaming([st], [ident], bbox, out_store,
                         FusionParameters(use_blending=False),
                         block=(16, 32, 32))
    out = out_store.read_block((0, 0, 0), bbox.shape)
    np.testing.assert_allclose(out[16:48], vol, atol=1e-5)
    assert np.all(out[:15] == 0)
