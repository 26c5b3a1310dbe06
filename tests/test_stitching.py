"""Tile stitching: phase-correlation init + bead refinement + fusion
(BASELINE config #5 machinery, scaled down)."""

import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.detect.dog import DoGParameters, detect_beads
from spim_registration_tpu.fuse import FusionParameters, fuse_views
from spim_registration_tpu.fuse.bounding_box import maximal_bounding_box
from spim_registration_tpu.match.pairwise import PairwiseParameters
from spim_registration_tpu.pipeline import RegistrationConfig, register_views
from spim_registration_tpu.pipeline.phase_init import translation_init
from spim_registration_tpu.utils.simulation import render_beads


def test_two_tile_stitching(rng):
    """A wide sample imaged as two overlapping tiles: phase correlation
    finds the coarse offset, bead registration refines it sub-pixel, and
    fusion reconstructs the full extent."""
    # ground truth sample: 64 x 64 x 112 with beads everywhere
    full_shape = (64, 64, 112)
    pts = rng.uniform(8, np.array(full_shape) - 8, size=(120, 3))
    # tile A: x in [0, 64); tile B: x in [48, 112) -> 16 px overlap
    true_off = np.array([0.0, 0.0, 48.0]) + rng.uniform(-1.5, 1.5, 3)
    tile_a = render_beads(pts, (64, 64, 64), 1.6)
    tile_b = render_beads(pts - true_off, (64, 64, 64), 1.6)
    tile_a += rng.normal(0, 0.005, tile_a.shape).astype(np.float32)
    tile_b += rng.normal(0, 0.005, tile_b.shape).astype(np.float32)

    init = translation_init([tile_a, tile_b], min_correlation=0.05)
    # coarse offset within 1 px
    np.testing.assert_allclose(init[1][:, 3], true_off, atol=1.0)

    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=1.8, threshold=0.008),
        pairwise=PairwiseParameters(model="translation", max_points=256,
                                    ratio_of_distance=5.0),
    )
    res = register_views([tile_a, tile_b], cfg, initial_models=init)
    assert res.global_result is not None
    # refined tile-B offset sub-pixel accurate
    np.testing.assert_allclose(res.models[1][:, 3], true_off, atol=0.2)

    bbox = maximal_bounding_box([tile_a.shape, tile_b.shape], res.models)
    fused = fuse_views([tile_a, tile_b], res.models, bbox,
                       FusionParameters())
    assert fused.shape[2] >= 110  # covers the full stitched extent
    # beads in the overlap region must appear once (no doubling): peak
    # intensity there matches the single-tile rendering
    truth = render_beads(pts - np.array(bbox.min, float), fused.shape, 1.6)
    overlap = (slice(8, 56), slice(8, 56), slice(50, 62))
    corr = np.corrcoef(fused[overlap].ravel(), truth[overlap].ravel())[0, 1]
    assert corr > 0.97, corr
