"""Benchmark: multi-view RL deconvolution throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: RL voxel-updates/s = Z*Y*X * n_views * n_iterations / wall_time
for the efficient-Bayesian multi-view RL engine (the framework's hottest
path; BASELINE config #4), run with the MXU-native separable low-rank
conv backend (`conv_backend="separable"`, ops/separable.py). The exact
FFT engine is run too and the two outputs are verified to agree
(nrmse < 1e-3) before the separable number is reported; both appear on
stderr.

Baseline: the reference publishes no numbers (BASELINE.md); the 2014 paper
reports minutes-scale per iteration on multicore CPU for ~1e9-voxel 7-view
data. Taking 3 min/iteration => 7e9 voxel-updates / 180 s ~= 3.9e7
voxel-updates/s; we use 4e7 as the baseline denominator (approximate,
from-memory paper figure — see BASELINE.md provenance caveat).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_root = Path(__file__).resolve().parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))

import numpy as np

BASELINE_VOXEL_UPDATES_PER_S = 4.0e7

import os

SHAPE = tuple(int(s) for s in os.environ.get(
    "SPIM_BENCH_SHAPE", "256,256,256").split(","))
N_VIEWS = int(os.environ.get("SPIM_BENCH_VIEWS", "4"))
N_ITER = int(os.environ.get("SPIM_BENCH_ITERS", "20"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    log(f"devices: {jax.devices()}")

    from spim_registration_tpu.deconv import (
        DeconvolutionParameters,
        DeconvolutionRunner,
        gaussian_psf,
    )
    from spim_registration_tpu.deconv.prep import DeconvolutionViews
    from spim_registration_tpu.utils.simulation import render_beads

    rng = np.random.default_rng(0)
    t0 = time.time()
    pts = rng.uniform(16, SHAPE[0] - 16, size=(150, 3))
    truth = render_beads(pts, SHAPE, sigma=1.0)
    sigmas = [(3.0, 1.0, 1.0), (1.0, 1.0, 3.0), (2.0, 1.2, 1.2),
              (1.2, 1.2, 2.0)]
    psfs = [gaussian_psf((15, 15, 15), s) for s in sigmas[:N_VIEWS]]
    # blur on HOST (numpy fft) — avoids paying a device compile for setup
    import numpy.fft as nfft
    axes = (0, 1, 2)
    tf = nfft.rfftn(truth, SHAPE, axes)
    views = []
    for p in psfs:
        kp = np.zeros(SHAPE, np.float32)
        kp[:p.shape[0], :p.shape[1], :p.shape[2]] = p
        kp = np.roll(kp, [-(s // 2) for s in p.shape], axis=axes)
        views.append(nfft.irfftn(tf * nfft.rfftn(kp, SHAPE, axes),
                                 SHAPE, axes).astype(np.float32))
    # Identity view transforms on the full bbox grid: the resampling step
    # of prepare_views_for_deconvolution is a no-op, so build the prep
    # host-side (skips a multi-minute remote-tunnel compile of the
    # trilinear resampler that is not part of the measured RL engine).
    # Identical cosine blending ramps across views normalize to 1/V
    # wherever the ramp is positive (40 px range, reference default).
    def ramp1d(n, rng_px=40.0):
        x = np.arange(n, dtype=np.float32)
        d = np.minimum(x, n - 1 - x)
        return np.where(d >= rng_px, 1.0,
                        (1.0 - np.cos(np.pi * d / rng_px)) * 0.5)

    R = (ramp1d(SHAPE[0])[:, None, None] * ramp1d(SHAPE[1])[None, :, None]
         * ramp1d(SHAPE[2])[None, None, :])
    w = np.where(R > 0, 1.0 / N_VIEWS, 0.0).astype(np.float32)
    prep = DeconvolutionViews(
        images=np.stack(views),
        weights=np.broadcast_to(w, (N_VIEWS,) + SHAPE).copy(),
        psfs=[np.asarray(p, np.float32) for p in psfs],
        osem_factor=float(N_VIEWS),
    )
    log(f"setup: {time.time()-t0:.1f}s")

    import jax.numpy as jnp

    outs, walls_by_backend = {}, {}
    for backend in ("separable", "fft"):
        params = DeconvolutionParameters(
            num_iterations=N_ITER, psf_type="efficient_bayesian",
            conv_backend=backend, psf_rank=3)
        runner = DeconvolutionRunner(prep, params)  # inputs staged on device

        def run_synced():
            # NOTE: on the axon remote tunnel block_until_ready() does NOT
            # actually wait for device completion; a scalar host readback
            # is the only reliable fence. It adds ~27 ms dispatch+readback
            # overhead, which we accept (conservative throughput).
            out = runner.run()
            s = float(jnp.sum(out))
            return out, s

        t0 = time.time()
        out, _s = run_synced()
        log(f"{backend}: first run (incl compile): {time.time()-t0:.1f}s")

        walls = []
        for _ in range(3):
            t0 = time.time()
            out, _s = run_synced()
            walls.append(time.time() - t0)
        wall = min(walls)
        log(f"{backend}: steady-state {wall:.3f}s for {N_ITER} iterations "
            f"x {N_VIEWS} views over {SHAPE} -> "
            f"{float(np.prod(SHAPE)) * N_VIEWS * N_ITER / wall:.3e} "
            "voxel-updates/s")
        outs[backend] = np.asarray(out)
        walls_by_backend[backend] = wall
        assert np.all(np.isfinite(outs[backend]))

    # the separable engine must reproduce the exact-FFT engine's output
    a, b = outs["fft"], outs["separable"]
    nrmse = float(np.sqrt(np.mean((a - b) ** 2)) / (a.max() - a.min()))
    log(f"separable-vs-fft nrmse: {nrmse:.2e}")
    assert nrmse < 1e-3, nrmse
    wall = walls_by_backend["separable"]

    voxel_updates = float(np.prod(SHAPE)) * N_VIEWS * N_ITER
    value = voxel_updates / wall
    print(json.dumps({
        "metric": "rl_deconv_voxel_updates_per_s",
        "value": value,
        "unit": "voxel-updates/s/chip",
        "vs_baseline": value / BASELINE_VOXEL_UPDATES_PER_S,
    }))


if __name__ == "__main__":
    main()
