"""512^3 x 4-view RL capacity benchmark (one chip).

The r4 record ran this configuration on the XLA rank-chunked chain
(the Pallas kernel was VMEM-gated off at 512^2 cross-sections) at
8.7e8 voxel-updates/s. Round 5 removes the gate (raised scoped-VMEM
limit) and replaces rank chunking with z-slab processing in the fused
path (no per-chunk f32 accumulator round trips) — this script measures
the same configuration end to end: 4 rotated-view fixture PSFs,
efficient-Bayesian compound kernels, 10 iterations, median of N walls.

    python examples/capacity_512.py [iters=10] [reps=3]
"""
import sys
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_root))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    import bench
    from spim_registration_tpu.deconv.lucy_richardson import (
        DeconvolutionRunner,
    )
    from spim_registration_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shape = (512, 512, 512)
    psfs, factors = bench.load_psf_fixtures()
    psfs = [np.asarray(p, np.float32) for p in psfs[:4]]
    factors = factors[:4]
    t0 = time.time()
    prep = bench._make_rl_prep(shape, psfs, factors, n_beads=400)
    log(f"prep built in {time.time() - t0:.1f}s")
    runner = DeconvolutionRunner(prep, bench._rl_params("lowrank", iters))
    t0 = time.time()
    float(jnp.sum(runner.run()))
    log(f"first run (incl compile): {time.time() - t0:.1f}s")
    walls = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(runner.run()))
        walls.append(time.time() - t0)
    w = float(np.median(walls))
    vox = np.prod(shape) * 4 * iters
    log(f"walls: {['%.3f' % x for x in walls]}")
    log(f"512^3 x 4 views x {iters} EB iters: {w:.2f} s median "
        f"-> {vox / w:.3e} voxel-updates/s")


if __name__ == "__main__":
    main()
