"""Scaling-efficiency harness for sharded multi-view RL (VERDICT r2 #4).

Two measurement modes, matching what the available hardware can honestly
support (BASELINE: ">=70% multi-host scaling efficiency"):

1. CPU virtual mesh (default; JAX_PLATFORMS=cpu + forced host devices):
   runs the REAL sharded program on n = 1, 2, 4, 8 virtual devices.
   Virtual devices share the same physical cores, so wall time cannot
   show true speedup — what this mode verifies is STRUCTURE: the total
   work (sum over shards) should stay ~flat as n grows (halo-compute
   overhead = (zl + 2h)/zl per z pass), and the program compiles and
   runs at every mesh size. Prints per-n wall and the halo-overhead
   model.

2. Real chip (run under the axon TPU tunnel without JAX_PLATFORMS=cpu):
   times the exact PER-SHARD program of an N-chip member — a 1-device
   mesh over a (Z/N, Y, X) slab; halo rows are mirror instead of
   neighbor data, which is identical compute. Modeled efficiency(N) =
   T(full) / (N * T(slab_N)). The neglected ICI transfer is ~2h*Y*X*4B
   per conv (~3 MB at 256^2, ~30 us at ICI bandwidth) — three orders of
   magnitude below the ms-scale convs it overlaps with. bench.py runs a
   compact version of this mode every benchmark run
   (rl_scaling_modeled_efficiency in BENCH_EXTRA.json).

Usage:
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/scaling_efficiency.py          # mode 1
  python examples/scaling_efficiency.py              # mode 2 (TPU)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))


def make_prep(shape, n_views=2):
    from spim_registration_tpu.deconv import gaussian_psf
    from spim_registration_tpu.deconv.prep import DeconvolutionViews
    from spim_registration_tpu.ops.fftconv import direct_convolve_np
    from spim_registration_tpu.utils.simulation import render_beads

    rng = np.random.default_rng(0)
    pts = rng.uniform(8, min(shape) - 8, size=(40, 3))
    truth = render_beads(pts, shape, sigma=1.2)
    sigmas = [(2.5, 1.0, 1.0), (1.0, 1.0, 2.5)]
    psfs = [gaussian_psf((11, 11, 11), sigmas[v % 2])
            for v in range(n_views)]
    views = [direct_convolve_np(truth, p).astype(np.float32) for p in psfs]
    w = np.full((n_views,) + shape, 1.0 / n_views, np.float32)
    return DeconvolutionViews(images=np.stack(views), weights=w,
                              psfs=psfs, osem_factor=float(n_views))


def time_runner(run, repeats=3):
    import jax.numpy as jnp

    def fence():
        # scalar fence: a full-psi D2H costs seconds on the remote
        # tunnel and would dominate the wall (it did in r3's first
        # scaling model)
        return float(jnp.sum(run()))

    t0 = time.time()
    fence()
    first = time.time() - t0
    walls = []
    for _ in range(repeats):
        t0 = time.time()
        fence()
        walls.append(time.time() - t0)
    return min(walls), first


def main():
    import jax

    from spim_registration_tpu.deconv import DeconvolutionParameters
    from spim_registration_tpu.parallel import (
        make_mesh,
        sharded_deconvolution_runner,
    )

    platform = jax.devices()[0].platform
    params = DeconvolutionParameters(
        num_iterations=5, psf_type="efficient_bayesian",
        conv_backend="lowrank", psf_rank=8, psf_rank_tol=1e-3,
        psf_rank_hard=16)

    if platform == "cpu":
        # mode 1: real sharded program on 1..8 virtual devices
        shape = (64, 96, 96)
        prep = make_prep(shape)
        print(f"CPU virtual mesh, {shape}, 2 views, 5 iters (structural)")
        base = None
        for n in (1, 2, 4, 8):
            if len(jax.devices()) < n:
                break
            mesh = make_mesh(("z",), (n,), jax.devices()[:n])
            run = sharded_deconvolution_runner(prep, params, mesh,
                                              device_result=True)
            wall, first = time_runner(run)
            base = base or wall
            # virtual devices share cores: wall ~ total work / cores
            print(f"  n={n}: wall {wall:.3f}s (first {first:.1f}s) — "
                  f"total-work ratio vs n=1: {wall/base:.2f}")
        h = 5  # 11^3 kernel z half-support
        zl = shape[0] // 8
        print(f"halo-compute overhead model at n=8: (zl+2h)/zl = "
              f"{(zl + 2*h)/zl:.2f} per z pass (z pass is 1/3 of conv)")
        return

    # mode 2: real chip — per-shard slab timing
    from spim_registration_tpu.deconv.prep import DeconvolutionViews

    shape = (256, 256, 256)
    prep = make_prep(shape, n_views=2)
    mesh1 = make_mesh(("z",), (1,), jax.devices()[:1])
    print(f"TPU slab model, {shape}, 2 views, 5 iters")
    walls = {}
    for n in (1, 2, 4, 8):
        zl = shape[0] // n
        slab = DeconvolutionViews(
            images=np.asarray(prep.images)[:, :zl],
            weights=np.asarray(prep.weights)[:, :zl],
            psfs=prep.psfs, osem_factor=prep.osem_factor)
        run = sharded_deconvolution_runner(slab, params, mesh1,
                                           device_result=True)
        walls[n], first = time_runner(run)
        print(f"  slab Z/{n}: {walls[n]:.3f}s (first {first:.1f}s)")
    # decomposed model (see bench.py bench_rl_scaling / PERF.md): never
    # report shape-driven superlinearity as "efficiency"
    ici_bw, h_z, n_iter, n_views = 5.0e10, 16, 5, 2
    for n in walls:
        shape_f = walls[1] / (n * walls[n])
        t_ici = (0.0 if n == 1 else n_iter * n_views * 3
                 * 2 * h_z * shape[1] * shape[2] * 4 / ici_bw)
        comm = walls[n] / (walls[n] + t_ici)
        print(f"  N={n}: predicted efficiency "
              f"{min(1.0, shape_f * comm) * 100:.0f}% "
              f"(shape factor x{shape_f:.2f}, comm {comm * 100:.0f}%)")


if __name__ == "__main__":
    main()
