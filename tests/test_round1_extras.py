"""Parallel RL scheme, phase-correlation init, dataset define, multihost."""

import os

import numpy as np
import pytest

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.core.define import define_dataset
from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    deconvolve,
    gaussian_psf,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.ops.fftconv import direct_convolve_np
from spim_registration_tpu.pipeline.phase_init import translation_init
from spim_registration_tpu.utils.simulation import render_beads


def test_parallel_scheme_converges(rng):
    pts = rng.uniform(8, 40, (20, 3))
    truth = render_beads(pts, (48, 48, 48), sigma=1.0)
    psf_a = gaussian_psf((9, 9, 9), (2.5, 1.0, 1.0))
    psf_b = gaussian_psf((9, 9, 9), (1.0, 1.0, 2.5))
    va = direct_convolve_np(truth, psf_a).astype(np.float32)
    vb = direct_convolve_np(truth, psf_b).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (48, 48, 48))
    prep = prepare_views_for_deconvolution([va, vb], [ident, ident],
                                           [psf_a, psf_b], bbox)

    def nrmse(a):
        return np.sqrt(np.mean((a - truth) ** 2)) / truth.max()

    base = nrmse(np.mean([va, vb], axis=0))
    out_par = deconvolve(prep, DeconvolutionParameters(
        num_iterations=15, scheme="parallel", psf_type="independent"))
    assert nrmse(out_par) < base * 0.7
    # sequential OSEM converges at least as fast per iteration
    out_seq = deconvolve(prep, DeconvolutionParameters(
        num_iterations=15, scheme="sequential", psf_type="independent"))
    assert nrmse(out_seq) <= nrmse(out_par) * 1.05


def test_phase_correlation_init(rng):
    pts = rng.uniform(15, 80, (80, 3))
    shifts = [np.zeros(3), np.array([6.0, -4.0, 9.0]),
              np.array([-5.0, 8.0, 3.0])]
    vols = [render_beads(pts - s, (96, 96, 96), 1.5)
            + rng.normal(0, 0.01, (96, 96, 96)).astype(np.float32)
            for s in shifts]
    models = translation_init(vols)
    for v in range(3):
        got = models[v][:, 3]
        want = shifts[v] - shifts[0]
        np.testing.assert_allclose(got, want, atol=0.5)


def test_define_dataset_npy(rng, tmp_path):
    for tp in range(2):
        for s in range(3):
            np.save(str(tmp_path / f"tp{tp}_setup{s}.npy"),
                    rng.uniform(size=(8, 10, 12)).astype(np.float32))
    ds = define_dataset(str(tmp_path), "tp{tp}_setup{setup}.npy",
                        voxel_size=(2.0, 0.5, 0.5))
    assert ds.timepoints() == [0, 1]
    assert ds.setups() == [0, 1, 2]
    vd = ds.views[(1, 2)]
    assert vd.size == (8, 10, 12)
    # calibration transform applied (z anisotropy 4x)
    assert abs(vd.model()[0, 0] - 4.0) < 1e-9
    img = ds.get_image((0, 1))
    assert img.shape == (8, 10, 12)


def test_define_dataset_missing_view(rng, tmp_path):
    np.save(str(tmp_path / "tp0_setup0.npy"),
            rng.uniform(size=(4, 4, 4)).astype(np.float32))
    np.save(str(tmp_path / "tp1_setup0.npy"),
            rng.uniform(size=(4, 4, 4)).astype(np.float32))
    np.save(str(tmp_path / "tp0_setup1.npy"),
            rng.uniform(size=(4, 4, 4)).astype(np.float32))
    ds = define_dataset(str(tmp_path), "tp{tp}_setup{setup}.npy")
    assert not ds.views[(1, 1)].present
    assert ds.views[(0, 1)].present


def test_multihost_single_process_helpers():
    from spim_registration_tpu.parallel.multihost import (
        host_z_mesh,
        initialize_multihost,
        shard_timepoints,
    )

    initialize_multihost()  # no-op single process
    mesh = host_z_mesh()
    assert mesh.shape["host"] == 1
    assert shard_timepoints([0, 1, 2, 3]) == [0, 1, 2, 3]
