"""Out-of-core LOWRANK RL on a beyond-HBM volume (VERDICT r3 next #3).

Deconvolves a 768^3 x 2-view problem (images + weights + psi + scratch
~ 14 GB of float32 state, beyond a single chip's HBM working set once
conv intermediates are counted) by streaming z-slab blocks through the
`BlockedDeconvolutionRunner` with conv_backend="lowrank" — z band
matmuls over halos re-read from the ping-pong psi store — and compares
throughput against the exact-FFT blocked backend on the same stores.

    python examples/blocked_lowrank_outofcore.py [--shape 768] \
        [--iters 2] [--workdir /tmp/spim_ooc]

Prints one JSON line: {"lowrank_voxel_updates_per_s": ..., "fft_...": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_root = Path(__file__).resolve().parent.parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))

import numpy as np


class RampWeightStore:
    """Blending-ramp weights computed on the fly (nothing on disk):
    separable cosine ramp / n_views — the bench's `_ramp_weights`, block
    by block."""

    def __init__(self, shape, n_views, rng_px=40.0):
        self.shape = tuple(shape)
        self.n_views = n_views
        self._ax = [self._ramp1d(n, rng_px) for n in self.shape]

    @staticmethod
    def _ramp1d(n, rng_px):
        x = np.arange(n, dtype=np.float32)
        d = np.minimum(x, n - 1 - x)
        return np.where(d >= rng_px, 1.0,
                        (1.0 - np.cos(np.pi * d / rng_px)) * 0.5)

    def read_block(self, lo, hi):
        r = (self._ax[0][lo[0]:hi[0], None, None]
             * self._ax[1][None, lo[1]:hi[1], None]
             * self._ax[2][None, None, lo[2]:hi[2]])
        return np.where(r > 0, 1.0 / self.n_views, 0.0).astype(np.float32)


def synthesize_views(shape, psfs, workdir, n_beads=2000, seed=0):
    """Ground-truth beads blurred per view with host FFT, streamed to
    RawVolumeStores slab by slab (host RAM never holds > 2 volumes)."""
    import numpy.fft as nfft

    from spim_registration_tpu.native_blocks import RawVolumeStore
    from spim_registration_tpu.utils.simulation import render_beads

    rng = np.random.default_rng(seed)
    pts = rng.uniform(24, shape[0] - 24, size=(n_beads, 3))
    t0 = time.time()
    truth = render_beads(pts, shape, sigma=1.3).astype(np.float32)
    print(f"truth rendered in {time.time()-t0:.1f}s", file=sys.stderr)
    axes = (0, 1, 2)
    tf = nfft.rfftn(truth.astype(np.float64), shape, axes)
    del truth
    stores = []
    for v, p in enumerate(psfs):
        kp = np.zeros(shape, np.float64)
        kp[:p.shape[0], :p.shape[1], :p.shape[2]] = p
        kp = np.roll(kp, [-(s // 2) for s in p.shape], axis=axes)
        t0 = time.time()
        img = nfft.irfftn(tf * nfft.rfftn(kp, shape, axes), shape,
                          axes).astype(np.float32)
        img = np.maximum(img, 0.0) + 1e-4
        store = RawVolumeStore(os.path.join(workdir, f"img{v}.raw"),
                               shape, create=True)
        store.write_block((0, 0, 0), img)
        stores.append(store)
        print(f"view {v} blurred+written in {time.time()-t0:.1f}s",
              file=sys.stderr)
        del img
    return stores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=768)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--block-z", type=int, default=None)
    ap.add_argument("--workdir", default="/tmp/spim_ooc")
    ap.add_argument("--backends", default="lowrank,fft")
    ap.add_argument("--mesh", type=int, default=0,
                    help="round-robin z-blocks across an N-device mesh "
                         "(mesh x out-of-core; 0 = single device)")
    args = ap.parse_args()
    shape = (args.shape,) * 3
    os.makedirs(args.workdir, exist_ok=True)

    from spim_registration_tpu.deconv import DeconvolutionParameters
    from spim_registration_tpu.deconv.blocked import (
        BlockedDeconvolutionInputs,
        BlockedDeconvolutionRunner,
    )
    from spim_registration_tpu.native_blocks import RawVolumeStore

    # the bench's committed rotated-view PSF fixtures (non-separable)
    d = np.load(_root / "bench_fixtures" / "psfs.npz")
    order = [1, 3, 5, 7, 0, 2, 4, 6]
    psfs = [np.asarray(d["psfs"][order[i]], np.float32)
            for i in range(args.views)]
    factors = [(d[f"az_{order[i]}"], d[f"ay_{order[i]}"],
                d[f"ax_{order[i]}"]) for i in range(args.views)]

    img_stores = synthesize_views(shape, psfs, args.workdir)
    inputs = BlockedDeconvolutionInputs(
        image_stores=img_stores,
        weight_stores=[RampWeightStore(shape, args.views)] * args.views,
        psfs=psfs, osem_factor=float(args.views), psf_factors=factors)

    results = {"shape": list(shape), "views": args.views,
               "iters": args.iters}
    vox_updates = float(np.prod(shape)) * args.views * args.iters
    for backend in args.backends.split(","):
        params = DeconvolutionParameters(
            num_iterations=args.iters, psf_type="efficient_bayesian",
            conv_backend=backend, psf_rank=24, psf_rank_tol=5e-5,
            psf_rank_hard=48)
        psi = RawVolumeStore(
            os.path.join(args.workdir, f"psi_{backend}.raw"), shape,
            create=True)
        mesh = None
        if args.mesh:
            import jax
            from jax.sharding import Mesh

            mesh = Mesh(np.array(jax.devices()[:args.mesh]), ("z",))
        runner = BlockedDeconvolutionRunner(
            inputs, psi, params, block_z=args.block_z, mesh=mesh)
        print(f"{backend}: block_z={runner.bz} hz={runner.hz}",
              file=sys.stderr)
        t0 = time.time()
        runner.run()
        wall = time.time() - t0
        results[f"{backend}_wall_s"] = round(wall, 2)
        results[f"{backend}_voxel_updates_per_s"] = vox_updates / wall
        print(f"{backend}: {wall:.1f}s -> "
              f"{vox_updates / wall:.3e} voxel-updates/s",
              file=sys.stderr)
        # clean the scratch twin to bound disk usage
        try:
            os.remove(psi.path + ".scratch")
        except OSError:
            pass
    print(json.dumps(results))


if __name__ == "__main__":
    main()
