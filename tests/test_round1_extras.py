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


def test_automatic_reorientation(rng):
    from spim_registration_tpu.fuse.bounding_box import (
        automatic_reorientation,
    )

    # elongated cloud along a diagonal
    t = rng.uniform(0, 100, 200)
    pts = np.stack([t, 0.5 * t + rng.normal(0, 2, 200),
                    0.2 * t + rng.normal(0, 2, 200)], axis=1) + 50
    rot, bb = automatic_reorientation(pts, margin=5)
    moved = pts @ rot[:, :3].T + rot[:, 3]
    ext = moved.max(axis=0) - moved.min(axis=0)
    # after reorientation the extent is concentrated on the first axis
    assert ext[0] > 3 * ext[1] and ext[0] > 3 * ext[2]
    assert np.prod(bb.shape) < np.prod(
        np.ptp(pts, axis=0).astype(int) + 11)


def test_anisotropic_calibration_registration(rng):
    """Property test matching real SPIM use: anisotropic z acquisition +
    calibration transform; registration must recover the true transform
    in calibrated (isotropic world) space."""
    from spim_registration_tpu.detect.dog import DoGParameters, detect_beads
    from spim_registration_tpu.pipeline import (
        RegistrationConfig,
        register_views,
    )
    from spim_registration_tpu.match.pairwise import PairwiseParameters
    from spim_registration_tpu.utils.simulation import (
        make_multiview_scene,
        render_beads,
    )

    # simulate isotropic world, acquire with z downsampled 2x
    scene = make_multiview_scene(rng, n_views=2, shape=(64, 96, 96),
                                 n_beads=80, noise=0.0, bead_sigma=1.7)
    vols_aniso = [v[::2] for v in scene.volumes]  # (32, 96, 96), z aniso
    calib = np.array([[2.0, 0, 0, 0.5], [0, 1, 0, 0], [0, 0, 1, 0.0]])
    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=1.8, threshold=0.004),
        pairwise=PairwiseParameters(model="affine", max_points=256))
    res = register_views(vols_aniso, cfg,
                         initial_models=[calib, calib])
    assert res.global_result is not None and res.mean_error < 0.7
    # view-1 world transform must match scene truth (gauge: view 0)
    # compose: est = B_1 o calib ; true relation maps aniso view-1 coords
    # through calib^-1? Simpler check: corresponding world positions agree.
    p0 = res.points[0]
    p1 = res.points[1]
    A0, A1 = res.models
    # map both views' points to world; matched bead pairs should coincide
    w0 = p0 @ A0[:, :3].T + A0[:, 3]
    w1 = p1 @ A1[:, :3].T + A1[:, 3]
    d = np.linalg.norm(w0[:, None] - w1[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.5


def test_fallback_to_rgldm(rng):
    """A sparse cloud where geometric hashing fails must be rescued by the
    RGLDM fallback."""
    from spim_registration_tpu.pipeline import (
        RegistrationConfig,
        register_views,
    )
    from spim_registration_tpu.match.pairwise import PairwiseParameters
    from spim_registration_tpu.utils.simulation import random_rotation

    n = 25
    a = rng.uniform(0, 120, (n, 3)).astype(np.float32)
    R = random_rotation(rng, 10.0)
    b = (a @ R.T + rng.uniform(-3, 3, 3)).astype(np.float32)
    cfg = RegistrationConfig(
        pairwise=PairwiseParameters(model="rigid", max_points=64,
                                    ratio_of_distance=1e9),  # GH can't pass
        fallback_method="rgldm")
    res = register_views(None, cfg, points=[a, b])
    assert res.global_result is not None
    assert res.pair_results[(0, 1)].valid
