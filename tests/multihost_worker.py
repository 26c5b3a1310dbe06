"""Worker process for the real multi-process jax.distributed test.

Launched by tests/test_multihost_multiprocess.py: each of 2 processes
owns 4 virtual CPU devices; together they form an 8-device global mesh
with a coordinator, and run (a) one z-sharded RL step spanning both
hosts (halo hops cross the process boundary) and (b) the 2D
(host=view x z) parallel-RL scheme whose update factor psum-reduces
ACROSS PROCESSES. Process 0 writes the results for the parent to check.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# the persistent compile cache may hold AOT results compiled under a
# different XLA device config (feature-mismatch warnings); CPU test
# compiles are cheap, keep the worker hermetic
os.environ["SPIM_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def tiny_prep(shape, n_views=2):
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.deconv import (
        gaussian_psf,
        prepare_views_for_deconvolution,
    )
    from spim_registration_tpu.ops.fftconv import direct_convolve_np
    from spim_registration_tpu.utils.simulation import render_beads

    rng = np.random.default_rng(0)
    pts = rng.uniform(6, shape[0] - 6, size=(12, 3))
    truth = render_beads(pts, shape, sigma=1.0)
    sigmas = [(2.5, 1.0, 1.0), (1.0, 1.0, 2.5)]
    psfs = [gaussian_psf((9, 9, 9), sigmas[v % 2]) for v in range(n_views)]
    views = [direct_convolve_np(truth, p).astype(np.float32) for p in psfs]
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), shape)
    return prepare_views_for_deconvolution(views, [ident] * n_views, psfs,
                                           bbox)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    from spim_registration_tpu.deconv import DeconvolutionParameters
    from spim_registration_tpu.parallel.mesh import make_mesh
    from spim_registration_tpu.parallel.multihost import (
        host_z_mesh,
        initialize_multihost,
        shard_timepoints,
    )
    from spim_registration_tpu.parallel.sharded import sharded_deconvolve

    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    # per-host timepoint split (cluster-mode analog)
    tps = shard_timepoints(list(range(10)))
    assert tps == list(range(10))[pid::nproc], tps

    # z deep enough that an 8-way split still holds the 9^3 kernel
    # (zl=8 -> 2*zl-1=15 >= 9: no kernel clipping in the sharded path)
    shape = (64, 32, 32)
    prep = tiny_prep(shape)

    # (a) flat 8-way z-sharding across both hosts: interior halo hops at
    # the host boundary cross DCN
    mesh_flat = make_mesh(("z",), (jax.device_count(),), jax.devices())
    out_a = sharded_deconvolve(
        prep, DeconvolutionParameters(num_iterations=2,
                                      psf_type="independent"),
        mesh_flat)

    # (b) mesh ("host", "z"): views data-parallel ACROSS PROCESSES
    # (update factor psum over DCN), z sharded within each host
    mesh_hz = host_z_mesh()
    assert dict(mesh_hz.shape) == {"host": nproc, "z": 4}
    out_b = sharded_deconvolve(
        prep, DeconvolutionParameters(num_iterations=2,
                                      psf_type="independent",
                                      scheme="parallel"),
        mesh_hz, axis_name="z", view_axis="host")

    # (c) z-sharded LOWRANK RL crossing the host boundary (r3: band
    # z-matmuls consume halo rows hopped over DCN)
    out_c = sharded_deconvolve(
        prep, DeconvolutionParameters(num_iterations=2,
                                      psf_type="independent",
                                      conv_backend="lowrank", psf_rank=4,
                                      psf_rank_tol=1e-3, psf_rank_hard=8),
        mesh_flat)

    # (d) output-z-sharded weighted-average fusion across both hosts
    # (ragged depth: pad+crop), gathered back via process_allgather
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.fuse.weighted_avg import FusionParameters
    from spim_registration_tpu.parallel.sharded import sharded_fuse_views
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    scene = make_multiview_scene(
        np.random.default_rng(3), n_views=2, shape=(24, 24, 24),
        n_beads=8, noise=0.002)
    out_d = sharded_fuse_views(
        scene.volumes, scene.models,
        BoundingBox("b", (0, 0, 0), (23, 24, 24)),
        FusionParameters(), mesh=mesh_flat)
    assert out_d.shape == (23, 24, 24)

    # (e) END-TO-END CLI across both hosts (VERDICT r3 next #1): the
    # production entry points (detect/register/deconvolve subcommands)
    # drive the sharded engines over the 2-process 8-device mesh —
    # XML in, deconvolved volume out, identical to a single-process run
    # (asserted by the parent). Only process 0 touches the filesystem;
    # stages are fenced with a global sync (the shared-FS handoff the
    # reference's cluster mode trusts, made explicit).
    from jax.experimental import multihost_utils

    from spim_registration_tpu.cli import main as cli_main

    work = os.path.join(os.path.dirname(out_path), "cli_ds")
    xml = os.path.join(work, "dataset.xml")
    if pid == 0:
        assert cli_main(["simulate", "--out", work, "--views", "2",
                         "--shape", "44", "48", "48",
                         "--beads", "40"]) == 0
    multihost_utils.sync_global_devices("simulated")
    assert cli_main(["detect", xml, "--mesh", "z=8"]) == 0
    multihost_utils.sync_global_devices("detected")
    assert cli_main(["register", xml]) == 0
    multihost_utils.sync_global_devices("registered")
    psi_out = os.path.join(work, "psi.npy")
    assert cli_main(["deconvolve", xml, "--out", psi_out, "--mesh", "z=8",
                     "--set=deconvolution.num_iterations=2"]) == 0
    multihost_utils.sync_global_devices("deconvolved")

    if pid == 0:
        np.savez(out_path, out_a=out_a, out_b=out_b, out_c=out_c,
                 out_d=out_d)
    # all processes must reach here together
    multihost_utils.sync_global_devices("done")
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
