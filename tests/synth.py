"""Synthetic scene helpers for tests (thin wrapper over the package's
simulation module, plus the legacy two-view fixture)."""

from __future__ import annotations

import numpy as np

from spim_registration_tpu.utils.simulation import (  # noqa: F401
    MultiViewScene,
    make_multiview_scene,
    random_rotation,
    render_beads,
    rotation_about_axis,
)


def make_two_view_scene(rng, shape=(96, 96, 96), n_beads=80,
                        max_angle_deg=10.0, noise=0.01, bead_sigma=1.7):
    """Ground-truth cloud + two views. View A = identity; view B given by a
    known affine mapping view-B coords -> view-A(world) coords.

    Returns dict with world_points, volumes, and the true B->A affine.
    """
    margin = 12
    world = rng.uniform(margin, np.array(shape) - margin, size=(n_beads, 3))
    R = random_rotation(rng, max_angle_deg)
    center = np.array(shape) / 2.0
    t = rng.uniform(-4, 4, size=3)
    # view B -> world:  w = R (b - c) + c + t
    A_b2w = np.concatenate([R, (center + t - R @ center)[:, None]], axis=1)
    # bead positions inside view B = inverse transform of world points
    Rinv = np.linalg.inv(R)
    b_pts = (world - (center + t - R @ center)) @ Rinv.T
    vol_a = render_beads(world, shape, bead_sigma)
    vol_b = render_beads(b_pts, shape, bead_sigma)
    if noise:
        vol_a = vol_a + rng.normal(0, noise, shape).astype(np.float32)
        vol_b = vol_b + rng.normal(0, noise, shape).astype(np.float32)
    return {
        "world_points": world,
        "view_b_points": b_pts,
        "vol_a": vol_a.astype(np.float32),
        "vol_b": vol_b.astype(np.float32),
        "b_to_world": A_b2w,
        "shape": shape,
    }
