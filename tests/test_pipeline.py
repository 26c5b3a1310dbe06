"""Full-pipeline tests: 6-view registration + fusion + deconvolution."""

import numpy as np
import pytest

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    deconvolve,
    extract_psf,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.detect.dog import DoGParameters
from spim_registration_tpu.fuse import FusionParameters, fuse_views
from spim_registration_tpu.match.pairwise import PairwiseParameters
from spim_registration_tpu.pipeline import RegistrationConfig, register_views
from spim_registration_tpu.utils.simulation import (
    make_multiview_scene,
    render_beads,
)


def _transform_error(est, true, pts):
    """Mean voxel error of estimated vs true transform over bead cloud."""
    e = pts @ est[:, :3].T + est[:, 3]
    t = pts @ true[:, :3].T + true[:, 3]
    return float(np.mean(np.linalg.norm(e - t, axis=1)))


@pytest.fixture(scope="module")
def scene6():
    rng = np.random.default_rng(7)
    return make_multiview_scene(rng, n_views=6, shape=(96, 96, 96),
                                n_beads=90, max_perturb_deg=3.0, noise=0.005)


@pytest.fixture(scope="module")
def registered6(scene6):
    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=1.8, threshold=0.004),
        pairwise=PairwiseParameters(model="affine", max_points=256),
    )
    return register_views(scene6.volumes, cfg)


def test_six_view_registration(scene6, registered6):
    """BASELINE config #2: 6-view global optimization, residual < 0.5 px."""
    res = registered6
    assert res.global_result is not None
    assert res.mean_error < 0.5, res.mean_error
    # every view transform must match truth to sub-pixel over the cloud
    for v in range(6):
        err = _transform_error(res.models[v], scene6.models[v],
                               scene6.view_points[v])
        assert err < 0.5, (v, err)


def test_six_view_fusion(scene6, registered6):
    out = fuse_views(scene6.volumes, registered6.models,
                     BoundingBox("b", (12, 12, 12), (84, 84, 84)),
                     FusionParameters())
    truth = render_beads(scene6.world_points - 12.0, (72, 72, 72), sigma=1.7)
    corr = np.corrcoef(out.ravel(), truth.ravel())[0, 1]
    assert corr > 0.97, corr


def test_multiview_deconvolution_e2e(rng):
    """BASELINE config #4-lite: point-like beads blurred per view ->
    PSF extraction through the view transforms -> RL deconvolution
    re-concentrates the light at the bead positions (beads act as
    sub-resolution point sources, like real SPIM bead data)."""
    scene = make_multiview_scene(
        rng, n_views=4, shape=(72, 72, 72), n_beads=40, noise=0.0,
        bead_sigma=0.7,
        psf_sigmas=[(3.0, 1.0, 1.0), (1.0, 1.0, 3.0),
                    (2.5, 1.2, 1.2), (1.2, 1.2, 2.5)])
    bbox = BoundingBox("b", (10, 10, 10), (62, 62, 62))
    psfs = []
    for v in range(4):
        psf, n = extract_psf(scene.volumes[v], scene.models[v],
                             scene.view_points[v], psf_shape=(15, 15, 15))
        assert n > 10
        psfs.append(psf)
    prep = prepare_views_for_deconvolution(
        scene.volumes, scene.models, psfs, bbox)
    out = deconvolve(prep, DeconvolutionParameters(num_iterations=10))
    fused = np.where(prep.weights.sum(0) > 0,
                     (prep.images * prep.weights).sum(0), 0.0)

    def concentration(vol):
        """Fraction of total intensity within 2 px of a true bead."""
        mask = np.zeros(vol.shape, bool)
        for p in scene.world_points - 10.0:
            c = np.round(p).astype(int)
            lo = np.maximum(c - 2, 0)
            hi = np.minimum(c + 3, vol.shape)
            mask[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
        return float(vol[mask].sum() / max(vol.sum(), 1e-9))

    c_out, c_fused = concentration(out), concentration(fused)
    assert c_out > c_fused * 1.5, (c_out, c_fused)
    assert c_out > 0.5, c_out
    # intensity at the true bead voxels must grow (sharpening)
    pk_out = np.mean([out[tuple(np.round(p).astype(int))]
                      for p in scene.world_points - 10.0])
    pk_fused = np.mean([fused[tuple(np.round(p).astype(int))]
                        for p in scene.world_points - 10.0])
    assert pk_out > 2 * pk_fused
