"""Synthetic multi-view bead data generation for tests and benchmarks.

The analog of the reference lab's `multiview-simulation` fixtures
(SURVEY.md section 4): a ground-truth bead cloud rendered into each view
through a known affine, with Gaussian PSF blur and noise. Recovering the
known transforms to sub-pixel accuracy is the core property test.
"""

from __future__ import annotations

import numpy as np


def random_rotation(rng, max_angle_deg=15.0):
    """Small random 3D rotation matrix."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rng.uniform(-max_angle_deg, max_angle_deg))
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def render_beads(points, shape, sigma=1.7, amplitude=1.0):
    """Render gaussian beads at float (z,y,x) positions into a volume."""
    vol = np.zeros(shape, np.float32)
    r = int(np.ceil(3 * sigma))
    for c in points:
        ci = np.round(c).astype(int)
        lo = np.maximum(ci - r, 0)
        hi = np.minimum(ci + r + 1, shape)
        if np.any(lo >= hi):
            continue
        zz, yy, xx = np.meshgrid(*[np.arange(l, h) for l, h in zip(lo, hi)],
                                 indexing="ij")
        vol[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] += amplitude * np.exp(
            -(((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
              / (2 * sigma ** 2))
        )
    return vol


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
