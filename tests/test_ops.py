"""Kernel unit tests against numpy/scipy-style reference twins."""

import jax.numpy as jnp
import numpy as np
import pytest

from spim_registration_tpu.ops.downsample import downsample, upscale_coords
from spim_registration_tpu.ops.extrema import find_peaks, subpixel_localize
from spim_registration_tpu.ops.fftconv import (
    direct_convolve_np,
    fft_convolve,
    pad_shape_for,
    prepare_kernel_fft,
)
from spim_registration_tpu.ops.gaussian import (
    difference_of_gaussian,
    gaussian_blur_3d,
    gaussian_kernel_1d,
    mirror_pad,
)
from spim_registration_tpu.ops.integral import box_mean, integral_image
from spim_registration_tpu.ops.resample import resample_affine, trilinear_sample


def gaussian_blur_np(vol, sigma):
    """Separable reference implementation in numpy (mirror boundary)."""
    out = vol.astype(np.float64)
    for ax in range(3):
        k = gaussian_kernel_1d(sigma, np.float64)
        r = (len(k) - 1) // 2
        pad_widths = [(0, 0)] * 3
        pad_widths[ax] = (r, r)
        p = np.pad(out, pad_widths, mode="reflect")
        out = np.apply_along_axis(
            lambda m: np.convolve(m, k[::-1], mode="valid"), ax, p
        )
    return out


def test_mirror_pad_matches_numpy_reflect(rng):
    x = jnp.asarray(rng.normal(size=(5, 6, 7)).astype(np.float32))
    out = mirror_pad(x, 2, 1)
    ref = np.pad(np.asarray(x), ((0, 0), (2, 2), (0, 0)), mode="reflect")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_gaussian_blur_matches_reference(rng):
    vol = rng.normal(size=(16, 20, 24)).astype(np.float32)
    out = gaussian_blur_3d(jnp.asarray(vol), (1.5, 1.5, 1.5))
    ref = gaussian_blur_np(vol, 1.5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_gaussian_preserves_mean(rng):
    vol = rng.uniform(size=(12, 12, 12)).astype(np.float32)
    out = gaussian_blur_3d(jnp.asarray(vol), (2.0, 2.0, 2.0))
    # mirror boundary preserves total mass approximately
    assert abs(float(jnp.mean(out)) - vol.mean()) < 1e-2


def test_dog_finds_single_bead():
    vol = np.zeros((32, 32, 32), np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(32)] * 3, indexing="ij")
    c = (15.3, 16.7, 14.2)
    vol += np.exp(-(((zz - c[0]) ** 2 + (yy - c[1]) ** 2
                     + (xx - c[2]) ** 2) / (2 * 2.0 ** 2)))
    dog = difference_of_gaussian(jnp.asarray(vol), 1.8, 1.8 * 2 ** 0.25)
    coords, resp, valid = find_peaks(dog, 1e-4, max_peaks=8)
    pos, val, ok = subpixel_localize(dog, coords, valid)
    assert int(np.sum(np.asarray(ok))) >= 1
    best = np.asarray(pos)[np.asarray(ok)][0]
    assert np.linalg.norm(best - np.array(c)) < 0.3


def test_downsample_and_coordinate_fixup(rng):
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    out = downsample(jnp.asarray(vol), (2, 2, 2))
    assert out.shape == (8, 8, 8)
    ref = vol.reshape(8, 2, 8, 2, 8, 2)[:, :, :, :, :, 0]
    # averaging along each axis: compare one voxel manually
    manual = vol[0:2, 0:2, 0:2].mean()
    np.testing.assert_allclose(float(out[0, 0, 0]), manual, atol=1e-5)
    c = upscale_coords(jnp.asarray([[1.0, 2.0, 3.0]]), (2, 2, 2))
    np.testing.assert_allclose(np.asarray(c)[0], [2.5, 4.5, 6.5])


def test_integral_box_mean(rng):
    vol = rng.uniform(size=(10, 11, 12)).astype(np.float32)
    out = box_mean(jnp.asarray(vol), 1)
    # interior voxel: mean of 3^3 neighborhood
    ref = vol[2:5, 3:6, 4:7].mean()
    np.testing.assert_allclose(float(out[3, 4, 5]), ref, rtol=1e-4)


def test_fft_convolve_matches_direct(rng):
    img = rng.uniform(size=(12, 13, 14)).astype(np.float32)
    kernel = rng.uniform(size=(5, 5, 3)).astype(np.float32)
    kernel /= kernel.sum()
    out = fft_convolve(jnp.asarray(img), jnp.asarray(kernel))
    ref = direct_convolve_np(img, kernel)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_fft_convolve_precomputed_kernel(rng):
    img = rng.uniform(size=(16, 16, 16)).astype(np.float32)
    kernel = rng.uniform(size=(7, 7, 7)).astype(np.float32)
    fshape = pad_shape_for(img.shape, kernel.shape)
    kfft = prepare_kernel_fft(jnp.asarray(kernel), fshape)
    out1 = fft_convolve(jnp.asarray(img), jnp.asarray(kernel))
    out2 = fft_convolve(jnp.asarray(img), jnp.asarray(kernel),
                        kernel_fft=kfft, fft_shape=fshape)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_trilinear_sample_exact_on_grid(rng):
    vol = rng.uniform(size=(8, 9, 10)).astype(np.float32)
    coords = jnp.asarray([[2.0, 3.0, 4.0], [0.0, 0.0, 0.0],
                          [7.0, 8.0, 9.0]])
    vals, inside = trilinear_sample(jnp.asarray(vol), coords)
    np.testing.assert_allclose(
        np.asarray(vals), [vol[2, 3, 4], vol[0, 0, 0], vol[7, 8, 9]],
        rtol=1e-5)
    assert bool(jnp.all(inside))


def test_trilinear_outside_masked():
    vol = jnp.ones((4, 4, 4), jnp.float32)
    vals, inside = trilinear_sample(vol, jnp.asarray([[-1.0, 0.0, 0.0],
                                                      [2.5, 2.0, 2.0]]))
    assert not bool(inside[0])
    assert bool(inside[1])
    assert float(vals[0]) == 0.0


def test_resample_identity(rng):
    vol = rng.uniform(size=(6, 7, 8)).astype(np.float32)
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    out, inside = resample_affine(jnp.asarray(vol), eye, (6, 7, 8))
    np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-5)
    assert bool(jnp.all(inside))


def test_resample_translation(rng):
    vol = rng.uniform(size=(8, 8, 8)).astype(np.float32)
    # world_to_view shifting sampling by +1 in z: out[z] = vol[z+1]
    A = jnp.concatenate([jnp.eye(3), jnp.asarray([[1.0], [0.0], [0.0]])],
                        axis=1)
    out, inside = resample_affine(jnp.asarray(vol), A, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(out)[:7], vol[1:], rtol=1e-5)
    assert not bool(inside[7, 0, 0])


def test_segmented_compact_topk_matches_two_stage(rng):
    """The r3 sparse-compaction peak selection returns exactly the same
    (value, index) set as the r2 two-stage top_k on sparse fields."""
    from spim_registration_tpu.ops.extrema import (
        _segmented_compact_topk,
        _two_stage_topk,
    )

    n = 64 * 64 * 64
    score = np.full(n, -np.inf, np.float32)
    idx = rng.choice(n, size=500, replace=False)
    score[idx] = rng.uniform(0.1, 1.0, 500).astype(np.float32)
    s = jnp.asarray(score)
    v1, i1 = _segmented_compact_topk(s, 256)
    v2, i2 = _two_stage_topk(s, 256)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_segmented_compact_topk_overflow_guard(rng):
    """A dense field (every segment holds > rounds candidates) must take
    the exact fallback and still return the true top-k."""
    from spim_registration_tpu.ops.extrema import _segmented_compact_topk

    n = 4096
    score = rng.uniform(0.0, 1.0, n).astype(np.float32)  # all finite
    v, i = _segmented_compact_topk(jnp.asarray(score), 16)
    ref = np.sort(score)[::-1][:16]
    np.testing.assert_allclose(np.asarray(v), ref, rtol=1e-6)


def test_detect_beads_batch_matches_single(rng):
    """One-dispatch multi-view detection == per-view detection."""
    from spim_registration_tpu.detect.dog import (
        DoGParameters,
        detect_beads,
        detect_beads_batch,
    )
    from spim_registration_tpu.utils.simulation import render_beads

    params = DoGParameters(sigma=1.6, threshold=0.01, max_peaks=256)
    vols = []
    for v in range(3):
        r = np.random.default_rng(10 + v)
        pts = r.uniform(6, 42, size=(25, 3))
        vols.append(render_beads(pts, (48, 48, 48), sigma=1.5)
                    + r.normal(0, 0.003, (48, 48, 48)).astype(np.float32))
    batch = detect_beads_batch(np.stack(vols), params)
    for v, vol in enumerate(vols):
        p_ref, r_ref = detect_beads(vol, params)
        np.testing.assert_allclose(batch[v][0], p_ref, atol=1e-6)
        np.testing.assert_allclose(batch[v][1], r_ref, atol=1e-6)


def test_find_peaks_hot_slice_fallback(rng):
    """The hot-slice strictness/subpixel tiering must be exact: force
    the fallback by setting hot_k below the candidate count and compare
    against the default path."""
    from spim_registration_tpu.detect.dog import DoGParameters, detect_beads
    from spim_registration_tpu.ops.extrema import find_peaks
    from spim_registration_tpu.ops.gaussian import difference_of_gaussian
    from spim_registration_tpu.utils.simulation import render_beads

    r = np.random.default_rng(3)
    pts = r.uniform(5, 43, size=(60, 3))
    vol = render_beads(pts, (48, 48, 48), sigma=1.4).astype(np.float32)
    dog = difference_of_gaussian(jnp.asarray(vol), (1.6,) * 3, (1.9,) * 3)
    # hot_k=4 << 60 candidates -> fallback branch; hot_k large -> hot path
    c1, r1, v1 = find_peaks(dog, 1e-4, 256, hot_k=4)
    c2, r2, v2 = find_peaks(dog, 1e-4, 256, hot_k=256)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # end-to-end: max_peaks > 2048 engages the subpixel hot tier; peaks
    # must match a small-budget run that skips it
    p_big, _ = detect_beads(vol, DoGParameters(sigma=1.6, threshold=0.01,
                                               max_peaks=4096))
    p_small, _ = detect_beads(vol, DoGParameters(sigma=1.6, threshold=0.01,
                                                 max_peaks=1024))
    np.testing.assert_allclose(p_big, p_small, atol=1e-6)


def test_fft_shape_policy():
    """The deterministic/fast FFT shape policy: 5-smooth sizes, skip the
    blocklisted sizes on large transforms, leave small transforms
    untouched (r5; measured in examples/fft_determinism_probe.py)."""
    from spim_registration_tpu.ops.fftconv import (
        _fft_size,
        fft_shape_for,
        pad_shape_for,
    )

    assert _fft_size(17) == 18 and _fft_size(128) == 128
    # large transforms skip 288/576 everywhere
    assert pad_shape_for((256,) * 3, (33,) * 3) == (300, 300, 300)
    assert pad_shape_for((512,) * 3, (33,) * 3) == (600, 600, 600)
    # small transforms keep the minimal 5-smooth size (288 incl.)
    assert fft_shape_for((288, 64, 64)) == (288, 64, 64)
    # the innermost axis is never a blocklisted size on large transforms
    for n in (250, 256, 280, 300):
        fs = fft_shape_for((n, 320, 288))
        assert fs[-1] != 288, fs


def test_solve3x3_matches_numpy(rng):
    """Closed-form adjugate 3x3 solve == np.linalg.solve on batched
    well-conditioned systems (the RANSAC fit hot path)."""
    from spim_registration_tpu.models.affine import _solve3x3

    A = rng.standard_normal((64, 3, 3)).astype(np.float32)
    A += 3.0 * np.eye(3, dtype=np.float32)  # well-conditioned
    B = rng.standard_normal((64, 3, 3)).astype(np.float32)
    want = np.linalg.solve(A.astype(np.float64), B.astype(np.float64))
    got = np.asarray(_solve3x3(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_trilinear_row_gather_matches_scalar_gather(rng):
    """The (N, 8) all-corners row gather == the copy-free 8-gather form
    on random coords INCLUDING exact-edge and out-of-bounds positions
    (wrapped rows must only ever be weighted by exactly zero)."""
    from spim_registration_tpu.ops import resample as rs

    vol = jnp.asarray(rng.standard_normal((13, 11, 17)), jnp.float32)
    Z, Y, X = vol.shape
    coords = np.concatenate([
        rng.uniform(-2, np.array([Z, Y, X]) + 1, size=(300, 3)),
        # exact edges and corners (the wrap-read positions)
        np.array([[0.0, 0.0, 0.0], [Z - 1.0, Y - 1.0, X - 1.0],
                  [Z - 1.0, 0.0, X - 1.0], [5.0, Y - 1.0, 3.0],
                  [Z - 1.0, 4.4, 2.2], [3.3, 2.2, X - 1.0]]),
    ]).astype(np.float32)
    v_fast, in_fast = rs.trilinear_sample(vol, jnp.asarray(coords))
    import unittest.mock as mock

    with mock.patch.object(rs, "_QUAD_GATHER_MAX_ELEMS", 0):
        v_ref, in_ref = rs.trilinear_sample(vol, jnp.asarray(coords))
    np.testing.assert_array_equal(np.asarray(in_fast), np.asarray(in_ref))
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                               atol=1e-6)
