"""Fusion tests: weights and weighted-average output quality."""

import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.fuse import (
    BlendingParameters,
    FusionParameters,
    blending_weight,
    bounding_box_from_points,
    content_based_weight,
    fuse_views,
    intersect_bounding_box,
    maximal_bounding_box,
)

from synth import make_two_view_scene, render_beads


def test_blending_weight_profile():
    size = (64, 64, 64)
    coords = jnp.asarray([
        [0.0, 32.0, 32.0],    # on a face -> 0
        [32.0, 32.0, 32.0],   # center -> 1
        [7.5, 32.0, 32.0],    # mid-ramp (range 15) -> 0.5
        [-3.0, 32.0, 32.0],   # outside -> 0
    ])
    w = blending_weight(coords, size, BlendingParameters())
    w = np.asarray(w)
    assert w[0] == 0.0
    assert abs(w[1] - 1.0) < 1e-6
    assert abs(w[2] - 0.5) < 0.01
    assert w[3] == 0.0


def test_content_based_weight_highlights_texture(rng):
    vol = np.zeros((48, 48, 48), np.float32)
    vol[:, :, 24:] += rng.normal(0, 1.0, (48, 48, 24)).astype(np.float32)
    from spim_registration_tpu.fuse import ContentBasedParameters
    w = np.asarray(content_based_weight(
        jnp.asarray(vol), ContentBasedParameters(sigma1=3.0, sigma2=6.0)))
    assert w[:, :, 30:].mean() > 3 * w[:, :, :18].mean()


def test_bounding_boxes():
    sizes = [(10, 10, 10), (10, 10, 10)]
    shift = np.concatenate([np.eye(3), np.array([[2.0], [0], [0]])], axis=1)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bb = maximal_bounding_box(sizes, [ident, shift])
    assert bb.min == (0, 0, 0) and bb.max == (12, 10, 10)
    ov = intersect_bounding_box(sizes, [ident, shift])
    assert ov.min == (2, 0, 0) and ov.max == (10, 10, 10)
    pts = np.array([[5.0, 5.0, 5.0], [20.0, 8.0, 9.0]])
    pb = bounding_box_from_points(pts, margin=2)
    assert pb.min == (3, 3, 3) and pb.max == (23, 11, 12)


def test_fuse_identity_view_roundtrip(rng):
    vol = rng.uniform(0.1, 1.0, (32, 32, 32)).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (32, 32, 32))
    out = fuse_views([vol], [ident], bbox,
                     FusionParameters(use_blending=False))
    np.testing.assert_allclose(out, vol, rtol=1e-4)


def test_fuse_two_views_matches_ground_truth(rng):
    """BASELINE config #2-lite: fusion of two registered synthetic views
    should approximate the ground-truth bead rendering."""
    scene = make_two_view_scene(rng, shape=(64, 64, 64), n_beads=40,
                                max_angle_deg=6.0, noise=0.0)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    models = [ident, scene["b_to_world"]]
    bbox = BoundingBox("b", (8, 8, 8), (56, 56, 56))
    out = fuse_views([scene["vol_a"], scene["vol_b"]], models, bbox,
                     FusionParameters())
    truth = render_beads(scene["world_points"] - 8.0, (48, 48, 48), sigma=1.7)
    err = np.abs(out - truth)
    assert err.mean() < 0.01, err.mean()
    corr = np.corrcoef(out.ravel(), truth.ravel())[0, 1]
    assert corr > 0.98, corr


def test_fuse_downsampled_output(rng):
    vol = rng.uniform(0.1, 1.0, (32, 32, 32)).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (32, 32, 32))
    out = fuse_views([vol], [ident], bbox,
                     FusionParameters(use_blending=False, downsample=2))
    assert out.shape == (16, 16, 16)
    # downsampled fusion samples at stride-2 world positions
    np.testing.assert_allclose(out, vol[::2, ::2, ::2], rtol=1e-4)
