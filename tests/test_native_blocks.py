"""Native block decomposition + raw volume store tests."""

import numpy as np
import pytest

from spim_registration_tpu.native_blocks import (
    RawVolumeStore,
    decompose,
    get_lib,
)


def test_native_lib_builds():
    # the image has g++; the native path must actually be exercised
    assert get_lib() is not None


def test_decompose_covers_volume():
    dims = (37, 20, 51)
    blocks = decompose(dims, (16, 16, 16), (4, 4, 4))
    covered = np.zeros(dims, np.int32)
    for b in blocks:
        covered[b.out_lo[0]:b.out_hi[0], b.out_lo[1]:b.out_hi[1],
                b.out_lo[2]:b.out_hi[2]] += 1
        # in range must include out range +/- halo clamped
        for d in range(3):
            assert b.in_lo[d] == max(b.out_lo[d] - 4, 0)
            assert b.in_hi[d] == min(b.out_hi[d] + 4, dims[d])
            assert b.pad_lo[d] == max(0, 4 - b.out_lo[d])
    assert covered.min() == 1 and covered.max() == 1  # exact partition


def test_raw_store_roundtrip(rng, tmp_path):
    shape = (24, 18, 30)
    vol = rng.normal(size=shape).astype(np.float32)
    path = str(tmp_path / "vol.raw")
    store = RawVolumeStore(path, shape, create=True)
    store.write_block((0, 0, 0), vol)
    out = store.read_block((0, 0, 0), shape)
    np.testing.assert_array_equal(out, vol)
    # strided sub-block
    sub = store.read_block((5, 3, 7), (20, 11, 29))
    np.testing.assert_array_equal(sub, vol[5:20, 3:11, 7:29])
    # partial write
    patch = rng.normal(size=(4, 4, 4)).astype(np.float32)
    store.write_block((10, 10, 10), patch)
    out = store.read_block((10, 10, 10), (14, 14, 14))
    np.testing.assert_array_equal(out, patch)


def test_padded_block_read_mirrors(rng, tmp_path):
    shape = (16, 16, 16)
    vol = rng.normal(size=shape).astype(np.float32)
    path = str(tmp_path / "vol.raw")
    store = RawVolumeStore(path, shape, create=True)
    store.write_block((0, 0, 0), vol)
    blocks = decompose(shape, (8, 8, 8), (2, 2, 2))
    ref = np.pad(vol, 2, mode="reflect")
    for b in blocks:
        got = store.read_block_padded(b)
        want = ref[b.out_lo[0]:b.out_hi[0] + 4,
                   b.out_lo[1]:b.out_hi[1] + 4,
                   b.out_lo[2]:b.out_hi[2] + 4]
        np.testing.assert_array_equal(got, want)
