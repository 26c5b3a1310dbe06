"""Real-scale pipeline check on the TPU chip (BASELINE configs #2/#4).

6 views of 256^3: simulate -> detect -> match -> solve -> fuse ->
deconvolve, with forced-sync stage timings. Writes a JSON summary to
stdout at the end. Run with the default (TPU) platform:

    python examples/tpu_scale_check.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_root))

SHAPE = (256, 256, 256)
N_VIEWS = 6
N_BEADS = 400


def main():
    import jax
    import jax.numpy as jnp

    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.deconv import (
        DeconvolutionParameters,
        DeconvolutionRunner,
        extract_psf,
        gaussian_psf,
        prepare_views_for_deconvolution,
    )
    from spim_registration_tpu.detect.dog import DoGParameters, detect_beads
    from spim_registration_tpu.fuse import FusionParameters, fuse_views
    from spim_registration_tpu.match.pairwise import PairwiseParameters
    from spim_registration_tpu.ops.fftconv import (
        fft_convolve,
        pad_shape_for,
        prepare_kernel_fft,
    )
    from spim_registration_tpu.pipeline import (
        RegistrationConfig,
        register_views,
    )
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    t = {}
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    t0 = time.time()
    rng = np.random.default_rng(0)
    scene = make_multiview_scene(rng, n_views=N_VIEWS, shape=SHAPE,
                                 n_beads=N_BEADS, bead_sigma=1.2,
                                 noise=0.0, max_perturb_deg=4.0)
    # blur on device with per-view PSFs (one compile, reused)
    sigmas = [(2.5, 1.0, 1.0), (1.0, 1.0, 2.5), (2.0, 1.2, 1.2),
              (1.2, 1.2, 2.0), (1.8, 1.0, 1.5), (1.5, 1.0, 1.8)]
    psfs = [gaussian_psf((15, 15, 15), s) for s in sigmas]
    fshape = pad_shape_for(SHAPE, (15, 15, 15))
    views = []
    for v in range(N_VIEWS):
        kf = prepare_kernel_fft(jnp.asarray(psfs[v]), fshape)
        out = fft_convolve(jnp.asarray(scene.volumes[v]), None,
                           kernel_fft=kf, fft_shape=fshape)
        views.append(np.asarray(out) + rng.normal(
            0, 0.0003, SHAPE).astype(np.float32))
    t["simulate_s"] = round(time.time() - t0, 2)
    print(f"simulated in {t['simulate_s']}s", file=sys.stderr, flush=True)

    t0 = time.time()
    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=1.8, threshold=0.004,
                                max_peaks=4096),
        pairwise=PairwiseParameters(model="affine", max_points=512),
    )
    reg = register_views(views, cfg)
    t["register_s"] = round(time.time() - t0, 2)
    t["register_detect_s"] = round(reg.timings.get("detect", 0), 2)
    t["register_match_s"] = round(reg.timings.get("match", 0), 2)
    t["residual_px"] = round(reg.mean_error, 4)
    t["valid_pairs"] = sum(r.valid for r in reg.pair_results.values())
    errs = []
    for v in range(N_VIEWS):
        p = scene.view_points[v]
        e = p @ reg.models[v][:, :3].T + reg.models[v][:, 3]
        tr = p @ scene.models[v][:, :3].T + scene.models[v][:, 3]
        errs.append(float(np.mean(np.linalg.norm(e - tr, axis=1))))
    t["transform_err_px"] = round(max(errs), 4)
    print(f"registered in {t['register_s']}s: residual="
          f"{t['residual_px']}px, worst transform err="
          f"{t['transform_err_px']}px", file=sys.stderr, flush=True)

    t0 = time.time()
    bbox = BoundingBox("b", (16, 16, 16),
                       (SHAPE[0] - 16, SHAPE[1] - 16, SHAPE[2] - 16))
    fused = fuse_views(views, reg.models, bbox,
                       FusionParameters(z_chunk=112))
    t["fuse_s"] = round(time.time() - t0, 2)
    print(f"fused {fused.shape} in {t['fuse_s']}s", file=sys.stderr,
          flush=True)

    t0 = time.time()
    epsfs = []
    for v in range(N_VIEWS):
        psf, _n = extract_psf(views[v], reg.models[v], reg.points[v],
                              psf_shape=(15, 15, 15))
        epsfs.append(psf)
    prep = prepare_views_for_deconvolution(views, reg.models, epsfs, bbox)
    t["deconv_prep_s"] = round(time.time() - t0, 2)

    runner = DeconvolutionRunner(prep, DeconvolutionParameters(
        num_iterations=10))
    t0 = time.time()
    out = runner.run()
    s = float(jnp.sum(out))
    t["deconv_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    out = runner.run()
    s = float(jnp.sum(out))
    t["deconv_steady_s"] = round(time.time() - t0, 2)
    vox_updates = float(np.prod(bbox.shape)) * N_VIEWS * 10
    t["deconv_voxel_updates_per_s"] = round(
        vox_updates / t["deconv_steady_s"])
    print(json.dumps(t))


if __name__ == "__main__":
    main()
