"""Generate the committed, bit-deterministic PSF fixtures for bench.py.

Round-2 verdict: the bench extracted PSFs from beads DETECTED on whatever
CPU backend was present, so the kernels (and the lowrank accuracy-gate
value) drifted between the builder's and the driver's environments
(VERDICT.md weak #2). This script removes every backend dependency:

  * the scene is rendered with pure NumPy (seeded) — same as bench.py;
  * beads come from the scene's GROUND-TRUTH view-space positions
    (isolation-filtered exactly like the bench's ThinOut step), not from
    a DoG detection pass;
  * extraction is a float64 NumPy port of deconv/psf.py extract_psf
    (trilinear gather through the view transform on the world grid);
  * conditioning (taper + floor + low-rank projection) is already pure
    host f64 (deconv/psf.py condition_psf).

The resulting conditioned PSFs are written to psfs.npz and COMMITTED, so
the driver and the builder measure identical kernels bit-for-bit. Rerun
this script only to change the fixture (and commit the new npz).

Realism is unchanged: the kernels are still world-oriented rotated PSFs
extracted from noisy rendered volumes through the 45-degree-step view
transforms (the hardest, least-separable case for the lowrank backend).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))

SCENE_SHAPE = (128, 128, 128)
SCENE_BEADS = 250
PSF_SHAPE = (19, 19, 19)
ISOLATION_MIN_D = 13.0


def isolated(pts: np.ndarray, min_d: float) -> np.ndarray:
    """Beads with no neighbor closer than min_d (same as bench _isolated)."""
    if len(pts) == 0:
        return pts
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    np.fill_diagonal(d2, np.inf)
    return pts[d2.min(1) >= min_d ** 2]


def trilinear_np(vol: np.ndarray, coords: np.ndarray):
    """f64 trilinear sampling; coords (..., 3) in (z,y,x) voxel units.

    Returns (values, inside) with inside = full 8-neighborhood in bounds
    (matches ops/resample.py trilinear_sample semantics).
    """
    shape = np.array(vol.shape)
    c = coords.reshape(-1, 3)
    f = np.floor(c).astype(np.int64)
    t = c - f
    inside = np.all((f >= 0) & (f + 1 <= shape - 1), axis=1)
    fc = np.clip(f, 0, shape - 2)
    out = np.zeros(len(c), np.float64)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (np.where(dz, t[:, 0], 1 - t[:, 0])
                     * np.where(dy, t[:, 1], 1 - t[:, 1])
                     * np.where(dx, t[:, 2], 1 - t[:, 2]))
                out += w * vol[fc[:, 0] + dz, fc[:, 1] + dy, fc[:, 2] + dx]
    return (out.reshape(coords.shape[:-1]),
            inside.reshape(coords.shape[:-1]))


def extract_psf_np(vol: np.ndarray, view_to_world: np.ndarray,
                   points_view: np.ndarray, psf_shape=PSF_SHAPE):
    """f64 NumPy port of deconv/psf.py extract_psf (same semantics)."""
    vol = np.asarray(vol, np.float64)
    A4 = np.vstack([view_to_world, [0, 0, 0, 1]])
    w2v = np.linalg.inv(A4)[:3]
    pts_world = points_view @ view_to_world[:, :3].T + view_to_world[:, 3]
    offs = np.stack(np.meshgrid(
        *[np.arange(s, dtype=np.float64) - s // 2 for s in psf_shape],
        indexing="ij"), axis=-1)
    acc = np.zeros(psf_shape, np.float64)
    n = 0
    for pw in pts_world:
        coords_w = pw[None, None, None, :] + offs
        coords_v = coords_w @ w2v[:, :3].T + w2v[:, 3]
        vals, inside = trilinear_np(vol, coords_v)
        if np.all(inside):
            acc += vals
            n += 1
    psf = acc / max(n, 1)
    psf = np.maximum(psf - psf.min(), 0.0)
    return psf / max(psf.sum(), 1e-12), n


def main():
    from spim_registration_tpu.deconv.psf import condition_psf
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    rng = np.random.default_rng(7)
    scene = make_multiview_scene(
        rng, n_views=8, shape=SCENE_SHAPE, n_beads=SCENE_BEADS,
        full_circle=True, max_perturb_deg=2.0, max_shift=3.0, noise=5e-4,
        bead_sigma=1.0, psf_sigmas=[(3.0, 1.0, 1.0)] * 8)

    psfs, counts, arrs = [], [], {}
    for v in range(8):
        iso = isolated(scene.view_points[v], ISOLATION_MIN_D)
        raw, n = extract_psf_np(scene.volumes[v], scene.models[v], iso)
        psf, (az, ay, ax) = condition_psf(raw, taper_radius=6.0, floor=2e-3,
                                          denoise_rank=16,
                                          return_factors=True)
        psfs.append(np.asarray(psf, np.float32))
        counts.append(n)
        # exact CP factors of the conditioned PSF (f64): the lowrank conv
        # backend consumes these verbatim (decompose_for_rl `factors=`)
        arrs[f"az_{v}"] = az
        arrs[f"ay_{v}"] = ay
        arrs[f"ax_{v}"] = ax
        print(f"view {v}: {len(iso)} isolated beads, {n} patches used, "
              f"cp rank {az.shape[0]}")

    out = Path(__file__).parent / "psfs.npz"
    np.savez_compressed(
        out, psfs=np.stack(psfs), n_beads_used=np.array(counts),
        scene_shape=np.array(SCENE_SHAPE), seed=np.array(7), **arrs)
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
