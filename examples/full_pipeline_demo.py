"""Full 6-view pipeline demo: simulate -> detect -> match -> solve ->
fuse -> deconvolve (BASELINE configs #2 + #4).

    env -u PYTHONPATH JAX_PLATFORMS=cpu python examples/full_pipeline_demo.py
"""

import sys
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_root))

from spim_registration_tpu.core.dataset import BoundingBox  # noqa: E402
from spim_registration_tpu.deconv import (  # noqa: E402
    DeconvolutionParameters,
    deconvolve,
    extract_psf,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.detect.dog import DoGParameters  # noqa: E402
from spim_registration_tpu.fuse import FusionParameters, fuse_views  # noqa: E402
from spim_registration_tpu.match.pairwise import PairwiseParameters  # noqa: E402
from spim_registration_tpu.pipeline import (  # noqa: E402
    RegistrationConfig,
    register_views,
)
from spim_registration_tpu.utils.simulation import make_multiview_scene  # noqa: E402


def main():
    rng = np.random.default_rng(11)
    t0 = time.time()
    scene = make_multiview_scene(
        rng, n_views=6, shape=(96, 96, 96), n_beads=90,
        bead_sigma=0.8, noise=0.003,
        psf_sigmas=[(2.5, 1.0, 1.0), (1.0, 1.0, 2.5), (2.0, 1.2, 1.2),
                    (1.2, 1.2, 2.0), (1.8, 1.0, 1.4), (1.4, 1.0, 1.8)])
    print(f"[{time.time()-t0:6.1f}s] simulated 6 views of 96^3")

    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=2.0, threshold=0.008),
        pairwise=PairwiseParameters(model="affine", max_points=256),
    )
    reg = register_views(scene.volumes, cfg)
    n_valid = sum(1 for r in reg.pair_results.values() if r.valid)
    print(f"[{time.time()-t0:6.1f}s] registered: {n_valid}/"
          f"{len(reg.pair_results)} pairs valid, "
          f"residual mean={reg.mean_error:.3f} max={reg.max_error:.3f} px")

    # transform error vs ground truth
    errs = []
    for v in range(6):
        p = scene.view_points[v]
        e = p @ reg.models[v][:, :3].T + reg.models[v][:, 3]
        t = p @ scene.models[v][:, :3].T + scene.models[v][:, 3]
        errs.append(np.mean(np.linalg.norm(e - t, axis=1)))
    print(f"         transform error vs truth per view: "
          f"{['%.3f' % e for e in errs]}")

    bbox = BoundingBox("b", (12, 12, 12), (84, 84, 84))
    fused = fuse_views(scene.volumes, reg.models, bbox, FusionParameters())
    print(f"[{time.time()-t0:6.1f}s] fused -> {fused.shape}")

    psfs = []
    for v in range(6):
        ips = reg.points[v]
        psf, n = extract_psf(scene.volumes[v], reg.models[v], ips,
                             psf_shape=(13, 13, 13))
        psfs.append(psf)
    prep = prepare_views_for_deconvolution(scene.volumes, reg.models, psfs,
                                           bbox)
    deconv = deconvolve(prep, DeconvolutionParameters(num_iterations=8))
    print(f"[{time.time()-t0:6.1f}s] deconvolved (8 EB iterations)")

    # sharpening check: peak intensity at true bead positions
    pk_f = np.mean([fused[tuple(np.clip(np.round(p).astype(int) - 12, 0,
                                        71))]
                    for p in scene.world_points])
    pk_d = np.mean([deconv[tuple(np.clip(np.round(p).astype(int) - 12, 0,
                                         71))]
                    for p in scene.world_points])
    print(f"         bead peak intensity: fused={pk_f:.4f} "
          f"deconv={pk_d:.4f} (x{pk_d/max(pk_f,1e-9):.1f})")
    assert max(errs) < 0.5, "registration must be sub-0.5px"
    assert pk_d > 1.5 * pk_f, "deconvolution must sharpen beads"
    print("OK")


if __name__ == "__main__":
    main()
