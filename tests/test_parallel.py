"""Sharded-kernel tests on the virtual 8-device CPU mesh.

These validate exactness at shard seams: the sharded result must equal the
single-device result to float tolerance (the reference never had such
tests; SURVEY.md section 4 implication (4)).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spim_registration_tpu.core.dataset import BoundingBox
from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    deconvolve,
    gaussian_psf,
    prepare_views_for_deconvolution,
)
from spim_registration_tpu.ops.fftconv import direct_convolve_np, fft_convolve
from spim_registration_tpu.ops.gaussian import gaussian_blur_3d
from spim_registration_tpu.parallel import (
    halo_exchange_z,
    make_mesh,
    sharded_deconvolve,
    sharded_dog,
    sharded_fft_convolve,
    sharded_gaussian_blur,
)
from spim_registration_tpu.utils.simulation import render_beads


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need the 8-device CPU mesh"
    return make_mesh(("z",), (8,))


def test_halo_exchange_roundtrip(mesh):
    """Each shard's extended block must equal the mirror-padded global
    volume's corresponding window."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from spim_registration_tpu.parallel.sharded import shard_map

    vol = np.arange(32 * 4 * 4, dtype=np.float32).reshape(32, 4, 4)
    h = 2

    def f(x):
        return halo_exchange_z(x, h)

    out = jax.jit(shard_map(f, mesh, in_specs=P("z"),
                            out_specs=P("z")))(
        jax.device_put(jnp.asarray(vol), NamedSharding(mesh, P("z"))))
    out = np.asarray(out)  # (32 + 8*2*2... ) -> concatenated (8*(4+2h))
    out = out.reshape(8, 4 + 2 * h, 4, 4)
    ref = np.pad(vol, ((h, h), (0, 0), (0, 0)), mode="reflect")
    for s in range(8):
        np.testing.assert_array_equal(out[s], ref[s * 4:s * 4 + 4 + 2 * h])


def test_sharded_gaussian_matches_single(mesh, rng):
    vol = rng.normal(size=(64, 24, 24)).astype(np.float32)
    ref = np.asarray(gaussian_blur_3d(jnp.asarray(vol), (1.5, 1.5, 1.5)))
    out = np.asarray(sharded_gaussian_blur(vol, (1.5, 1.5, 1.5), mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_dog_matches_single(mesh, rng):
    vol = rng.normal(size=(64, 24, 24)).astype(np.float32)
    from spim_registration_tpu.ops.gaussian import difference_of_gaussian
    ref = np.asarray(difference_of_gaussian(jnp.asarray(vol), 1.8, 2.2))
    out = np.asarray(sharded_dog(vol, 1.8, 2.2, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sharded_fft_conv_matches_direct(mesh, rng):
    vol = rng.uniform(size=(64, 20, 20)).astype(np.float32)
    kernel = gaussian_psf((7, 7, 7), (1.5, 1.5, 1.5))
    ref = direct_convolve_np(vol, kernel)
    out = np.asarray(sharded_fft_convolve(vol, kernel, mesh))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sharded_deconvolve_matches_single(mesh, rng):
    pts = rng.uniform(8, 56, size=(20, 3))
    truth = render_beads(pts, (64, 32, 32), sigma=1.0)
    psf_a = gaussian_psf((9, 9, 9), (2.5, 1.0, 1.0))
    psf_b = gaussian_psf((9, 9, 9), (1.0, 1.0, 2.5))
    va = direct_convolve_np(truth, psf_a).astype(np.float32)
    vb = direct_convolve_np(truth, psf_b).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (64, 32, 32))
    prep = prepare_views_for_deconvolution([va, vb], [ident, ident],
                                           [psf_a, psf_b], bbox)
    params = DeconvolutionParameters(num_iterations=6)
    ref = deconvolve(prep, params)
    out = sharded_deconvolve(prep, params, mesh)
    # psi after 6 iterations must agree to float tolerance at every voxel,
    # including the 7 shard seams
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_sharded_parallel_scheme_2d_mesh(rng):
    """Parallel-update RL on a (view, z) 2D mesh must equal the
    single-device parallel-scheme result (psum over views + halo z)."""
    from spim_registration_tpu.parallel import make_mesh

    mesh2 = make_mesh(("view", "z"), (2, 4))
    pts = rng.uniform(8, 56, size=(20, 3))
    truth = render_beads(pts, (64, 32, 32), sigma=1.0)
    psfs = [gaussian_psf((9, 9, 9), s) for s in
            ((2.5, 1.0, 1.0), (1.0, 1.0, 2.5), (1.8, 1.2, 1.2),
             (1.2, 1.2, 1.8))]
    views = [direct_convolve_np(truth, p).astype(np.float32) for p in psfs]
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    bbox = BoundingBox("b", (0, 0, 0), (64, 32, 32))
    prep = prepare_views_for_deconvolution(views, [ident] * 4, psfs, bbox)
    params = DeconvolutionParameters(num_iterations=5, scheme="parallel",
                                     psf_type="independent")
    ref = deconvolve(prep, params)
    out = sharded_deconvolve(prep, params, mesh2, axis_name="z",
                             view_axis="view")
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_sharded_view_axis_requires_parallel(rng):
    from spim_registration_tpu.parallel import make_mesh

    mesh2 = make_mesh(("view", "z"), (2, 4))
    pts = rng.uniform(8, 24, size=(5, 3))
    truth = render_beads(pts, (32, 16, 16), sigma=1.0)
    psf = gaussian_psf((7, 7, 7))
    va = direct_convolve_np(truth, psf).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    prep = prepare_views_for_deconvolution(
        [va, va], [ident, ident], [psf, psf],
        BoundingBox("b", (0, 0, 0), (32, 16, 16)))
    with pytest.raises(ValueError, match="parallel"):
        sharded_deconvolve(prep,
                           DeconvolutionParameters(scheme="sequential"),
                           mesh2, view_axis="view")


def test_sharded_detection_matches_single(mesh, rng):
    """Sharded detect must find the same beads as the single-device path,
    including beads sitting ON shard seams."""
    from spim_registration_tpu.detect import DoGParameters, detect_beads
    from spim_registration_tpu.parallel.sharded_detect import (
        sharded_detect_beads,
    )

    # beads deliberately placed near the z=8,16,... seams of an 8-way split
    seam_pts = np.array([[8.0 * k + off, 20.0 + k, 20.0 - k]
                         for k in range(1, 8)
                         for off in (-0.4, 0.3)])
    rand_pts = rng.uniform(6, 58, size=(20, 3))
    pts = np.concatenate([seam_pts, rand_pts])
    vol = render_beads(pts, (64, 40, 40), sigma=1.6)
    vol += rng.normal(0, 0.005, vol.shape).astype(np.float32)

    params = DoGParameters(sigma=1.8, threshold=0.01)
    ref_pts, ref_val = detect_beads(vol, params)
    got_pts, got_val = sharded_detect_beads(vol, params, mesh)

    assert len(got_pts) == len(ref_pts), (len(got_pts), len(ref_pts))
    # same peak set (order may differ)
    d = np.linalg.norm(ref_pts[:, None] - got_pts[None], axis=-1)
    assert d.min(axis=1).max() < 0.05


def test_sharded_detection_with_downsampling(mesh, rng):
    """Downsampled sharded detection == downsampled single-device
    detection (VERDICT r1 item 7: the NotImplementedError path)."""
    from spim_registration_tpu.detect import DoGParameters, detect_beads
    from spim_registration_tpu.parallel.sharded_detect import (
        sharded_detect_beads,
    )

    pts = rng.uniform(10, 110, size=(25, 3))
    pts[:, 1:] = rng.uniform(8, 56, size=(25, 2))
    vol = render_beads(pts, (128, 64, 64), sigma=2.5)
    vol += rng.normal(0, 0.003, vol.shape).astype(np.float32)

    params = DoGParameters(sigma=1.8, threshold=0.008,
                           downsample_xy=2, downsample_z=2)
    ref_pts, _ = detect_beads(vol, params)
    got_pts, _ = sharded_detect_beads(vol, params, mesh)
    assert len(ref_pts) > 15
    assert len(got_pts) == len(ref_pts), (len(got_pts), len(ref_pts))
    d = np.linalg.norm(ref_pts[:, None] - got_pts[None], axis=-1)
    assert d.min(axis=1).max() < 0.05


def test_sharded_detection_anisotropic_sigma(mesh, rng):
    """Per-axis z sigma (explicit or calibration-derived) matches the
    single-device path and itself."""
    from spim_registration_tpu.detect import DoGParameters, detect_beads
    from spim_registration_tpu.detect.dog import effective_sigmas
    from spim_registration_tpu.parallel.sharded_detect import (
        sharded_detect_beads,
    )

    # calibration: z spacing 2x coarser than xy -> z sigma halves
    p_cal = DoGParameters(sigma=1.8, threshold=0.01,
                          calibration_zyx=(2.0, 1.0, 1.0))
    assert effective_sigmas(p_cal) == (0.9, 1.8, 1.8)
    p_exp = DoGParameters(sigma=1.8, threshold=0.01, sigma_z=0.9)
    assert effective_sigmas(p_exp) == effective_sigmas(p_cal)

    # anisotropic beads (narrow in z, like a calibrated acquisition)
    vol = np.zeros((64, 48, 48), np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in vol.shape],
                             indexing="ij")
    for c in rng.uniform(10, 38, size=(12, 3)):
        vol += np.exp(-((zz - c[0]) ** 2 / (2 * 0.9 ** 2)
                        + (yy - c[1]) ** 2 / (2 * 1.8 ** 2)
                        + (xx - c[2]) ** 2 / (2 * 1.8 ** 2))
                      ).astype(np.float32)
    ref_pts, _ = detect_beads(vol, p_cal)
    got_pts, _ = sharded_detect_beads(vol, p_cal, mesh)
    assert len(ref_pts) >= 10
    assert len(got_pts) == len(ref_pts)
    d = np.linalg.norm(ref_pts[:, None] - got_pts[None], axis=-1)
    assert d.min(axis=1).max() < 0.05


def test_sharded_normal_equation_assembly(rng):
    """Correspondence shards assembled per-device and psum-reduced match
    single-device assembly (the distributed-BA reduction)."""
    import jax.numpy as jnp

    from spim_registration_tpu.parallel.mesh import make_mesh
    from spim_registration_tpu.solve.assembly import (
        assemble_normal_equations,
        assemble_normal_equations_sharded,
    )

    N, n_free = 1003, 3  # deliberately not a multiple of 8
    pc = rng.normal(size=(N, 3))
    qc = pc + rng.normal(scale=0.1, size=(N, 3))
    w = rng.uniform(0.5, 1.0, N)
    col_i = rng.integers(-1, n_free, N)
    col_j = rng.integers(-1, n_free, N)

    H0, g0 = assemble_normal_equations(
        "affine", n_free, jnp.asarray(pc, jnp.float32),
        jnp.asarray(qc, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(col_i, jnp.int32), jnp.asarray(col_j, jnp.int32))

    mesh = make_mesh(("corr",))
    H, g = assemble_normal_equations_sharded(
        mesh, "corr", "affine", n_free, pc, qc, w, col_i, col_j)

    np.testing.assert_allclose(np.asarray(H), np.asarray(H0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)


def test_sharded_separable_rl_matches_single_device(rng):
    """z-sharded RL with the separable conv backend (taps-halo exchange)
    matches the single-device separable engine."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.deconv import (
        DeconvolutionParameters,
        deconvolve,
        gaussian_psf,
        prepare_views_for_deconvolution,
    )
    from spim_registration_tpu.ops.fftconv import direct_convolve_np
    from spim_registration_tpu.parallel import make_mesh, sharded_deconvolve
    from synth import render_beads

    shape = (32, 24, 24)
    pts = rng.uniform(6, 18, size=(10, 3)) * np.array([1.5, 1, 1])
    truth = render_beads(pts, shape, sigma=1.1)
    psfs = [gaussian_psf((9, 9, 9), (2.0, 1.0, 1.0)),
            gaussian_psf((9, 9, 9), (1.0, 1.0, 2.0))]
    views = [direct_convolve_np(truth, p).astype(np.float32) for p in psfs]
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    prep = prepare_views_for_deconvolution(
        views, [ident, ident], psfs, BoundingBox("b", (0, 0, 0), shape))
    params = DeconvolutionParameters(num_iterations=4,
                                     psf_type="efficient_bayesian",
                                     conv_backend="separable", psf_rank=2)
    mesh = make_mesh(("z",), (4,))
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    # sharded kernels are clamped to 2*zl-1 taps; seams must still agree
    assert nrmse < 5e-3, nrmse


def _asym_psf(rng, shape=(9, 9, 9)):
    """Asymmetric (rotated-like) PSF: anisotropic Gaussian + a shifted
    lobe, non-separable, exercises true-convolution factor flips."""
    from spim_registration_tpu.deconv import gaussian_psf

    p = gaussian_psf(shape, (2.0, 1.0, 1.4)).astype(np.float64)
    p = p + 0.4 * np.roll(gaussian_psf(shape, (1.2, 1.6, 1.0)),
                          (1, -1, 1), axis=(0, 1, 2))
    return (p / p.sum()).astype(np.float32)


def _lowrank_prep(rng, shape=(32, 24, 24)):
    from synth import render_beads

    pts = rng.uniform(6, 18, size=(10, 3)) * np.array([1.5, 1, 1])
    truth = render_beads(pts, shape, sigma=1.1)
    psfs = [_asym_psf(rng), gaussian_psf((9, 9, 9), (1.0, 1.0, 2.0))]
    views = [direct_convolve_np(truth, p).astype(np.float32) for p in psfs]
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    return prepare_views_for_deconvolution(
        views, [ident, ident], psfs, BoundingBox("b", (0, 0, 0), shape))


def test_sharded_lowrank_rl_matches_single_device(rng):
    """z-sharded RL with the LOWRANK (folded-matmul) backend — band
    z-matrices + halo exchange — matches the single-device lowrank
    engine (VERDICT r2 next #3). No kernel clamping is involved (band
    supports any halo <= Z-1), so the tolerance is tight."""
    prep = _lowrank_prep(rng)
    params = DeconvolutionParameters(num_iterations=4,
                                     psf_type="efficient_bayesian",
                                     conv_backend="lowrank", psf_rank=12,
                                     psf_rank_tol=1e-4, psf_rank_hard=24)
    mesh = make_mesh(("z",), (4,))
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def test_sharded_lowrank_fft_fallback_mix(rng):
    """Kernels that miss the rank tolerance at the hard cap fall back to
    the per-shard exact FFT path — on BOTH engines — and still agree."""
    prep = _lowrank_prep(rng)
    params = DeconvolutionParameters(num_iterations=3,
                                     psf_type="independent",
                                     conv_backend="lowrank", psf_rank=1,
                                     psf_rank_tol=1e-9, psf_rank_hard=1)
    mesh = make_mesh(("z",), (4,))
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 5e-5, nrmse


def test_sharded_lowrank_view_axis_2d_mesh(rng):
    """LOWRANK on the 2D (view, z) mesh (VERDICT r3 next #7): per-view
    ranks bucketed to the max rank, matrices stacked and sharded over
    the view axis, update psum-reduced — matches the single-device
    parallel-scheme lowrank engine."""
    from spim_registration_tpu.parallel import make_mesh as _mk

    prep = _lowrank_prep(rng)
    params = DeconvolutionParameters(
        num_iterations=4, psf_type="efficient_bayesian",
        conv_backend="lowrank", psf_rank=12, psf_rank_tol=1e-4,
        psf_rank_hard=24, scheme="parallel", lowrank_dtype="float32")
    mesh2 = _mk(("view", "z"), (2, 4))
    out_sharded = sharded_deconvolve(prep, params, mesh2, axis_name="z",
                                     view_axis="view")
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def test_sharded_lowrank_view_axis_ragged_bf16(rng):
    """View-axis lowrank at a ragged depth with bf16 dither: runs, stays
    finite, and lands within the usual quantization envelope of the f32
    stacked engine."""
    from spim_registration_tpu.parallel import make_mesh as _mk

    prep = _lowrank_prep(rng, shape=(53, 24, 24))
    base = dict(num_iterations=3, psf_type="independent",
                conv_backend="lowrank", psf_rank=12, psf_rank_tol=1e-4,
                psf_rank_hard=24, scheme="parallel")
    mesh2 = _mk(("view", "z"), (2, 4))
    out32 = sharded_deconvolve(
        prep, DeconvolutionParameters(lowrank_dtype="float32", **base),
        mesh2, axis_name="z", view_axis="view")
    out16 = sharded_deconvolve(
        prep, DeconvolutionParameters(lowrank_dtype="bfloat16", **base),
        mesh2, axis_name="z", view_axis="view")
    nrmse = np.sqrt(np.mean((out16 - out32) ** 2)) \
        / (out32.max() - out32.min())
    assert nrmse < 3e-3, nrmse


def test_sharded_lowrank_view_axis_fft_fallback(rng):
    """A kernel missing the rank tolerance makes the WHOLE view-sharded
    job fall back to the exact FFT backend (never silently less
    accurate) and still match the single-device engine."""
    from spim_registration_tpu.parallel import make_mesh as _mk

    prep = _lowrank_prep(rng)
    params = DeconvolutionParameters(
        num_iterations=3, psf_type="independent", conv_backend="lowrank",
        psf_rank=1, psf_rank_tol=1e-9, psf_rank_hard=1, scheme="parallel")
    mesh2 = _mk(("view", "z"), (2, 4))
    out_sharded = sharded_deconvolve(prep, params, mesh2, axis_name="z",
                                     view_axis="view")
    ref = deconvolve(prep, dataclasses.replace(params,
                                               conv_backend="fft"))
    nrmse = np.sqrt(np.mean((out_sharded - ref) ** 2)) \
        / (ref.max() - ref.min())
    assert nrmse < 5e-4, nrmse


def test_sharded_lowrank_fused_yx_matches_single_device(rng):
    """The sharded lowrank engine with the Pallas fused y/x passes
    (lowrank_fused=True -> interpret mode on CPU; the shard-local y/x
    matmuls are identical to the single-device fused kernel's) matches
    the single-device engine. Local depth 32/2=16 hits the Z%16==0
    fused gate on every shard."""
    prep = _lowrank_prep(rng)
    params = DeconvolutionParameters(num_iterations=3,
                                     psf_type="efficient_bayesian",
                                     conv_backend="lowrank", psf_rank=12,
                                     psf_rank_tol=1e-4, psf_rank_hard=24,
                                     lowrank_fused=True)
    mesh = make_mesh(("z",), (2,))
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(
        prep, dataclasses.replace(params, lowrank_fused=False))
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def test_sharded_rl_ragged_depth_fft(mesh, rng):
    """Sharded RL at a depth NOT divisible by the mesh size (Z=100 on 8
    shards) must equal the single-device engine (VERDICT r3 missing #2):
    the volume is mirror-extended and padded psi/q rows are re-pinned to
    the live mirror continuation after every update, so the true bottom
    edge sees exactly the unsharded mirror semantics."""
    prep = _lowrank_prep(rng, shape=(100, 24, 24))
    params = DeconvolutionParameters(num_iterations=4,
                                     psf_type="efficient_bayesian")
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(prep, params)
    assert out_sharded.shape == out_single.shape
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def test_sharded_rl_ragged_depth_lowrank(mesh, rng):
    """Ragged-depth sharded RL with the LOWRANK backend: the z band
    matrices consume live mirror halos over the padded extension; the
    asymmetric PSF catches any mirror-direction error at the edge."""
    prep = _lowrank_prep(rng, shape=(100, 24, 24))
    params = DeconvolutionParameters(num_iterations=4,
                                     psf_type="independent",
                                     conv_backend="lowrank", psf_rank=12,
                                     psf_rank_tol=1e-4, psf_rank_hard=24)
    out_sharded = sharded_deconvolve(prep, params, mesh)
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def test_sharded_rl_ragged_depth_parallel_2d(rng):
    """Ragged depth + parallel-update scheme on the (view, z) 2D mesh:
    restore runs under both mesh axes with the psum across views."""
    prep = _lowrank_prep(rng, shape=(53, 24, 24))
    params = DeconvolutionParameters(num_iterations=3, scheme="parallel",
                                     psf_type="independent")
    mesh2 = make_mesh(("view", "z"), (2, 4))
    out_sharded = sharded_deconvolve(prep, params, mesh2, axis_name="z",
                                     view_axis="view")
    out_single = deconvolve(prep, params)
    nrmse = np.sqrt(np.mean((out_sharded - out_single) ** 2)) \
        / (out_single.max() - out_single.min())
    assert nrmse < 2e-5, nrmse


def _fusion_scene(rng, shape=(40, 28, 28), n_views=3):
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    scene = make_multiview_scene(
        rng, n_views=n_views, shape=shape, n_beads=20,
        max_perturb_deg=8.0, max_shift=3.0, noise=0.002, bead_sigma=1.3)
    return scene


def test_sharded_fusion_matches_single(rng):
    """Output-z-sharded weighted-average fusion == fuse_views, including
    a RAGGED output depth (not divisible by the mesh) and general-affine
    view transforms (VERDICT r2 missing #2 / weak #8 pattern)."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.fuse.weighted_avg import (
        FusionParameters,
        fuse_views,
    )
    from spim_registration_tpu.parallel import sharded_fuse_views

    scene = _fusion_scene(rng)
    bbox = BoundingBox("b", (0, 0, 0), (37, 28, 28))  # 37 % 8 != 0
    params = FusionParameters()
    ref = fuse_views(scene.volumes, scene.models, bbox, params)
    mesh = make_mesh(("z",), (8,))
    got = sharded_fuse_views(scene.volumes, scene.models, bbox, params,
                             mesh=mesh)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_sharded_fusion_content_based(rng):
    """Content-based weights flow through the sharded fusion path."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.fuse.weighted_avg import (
        FusionParameters,
        fuse_views,
    )
    from spim_registration_tpu.parallel import sharded_fuse_views

    scene = _fusion_scene(rng, n_views=2)
    bbox = BoundingBox("b", (0, 0, 0), (40, 28, 28))
    params = FusionParameters(use_content_based=True)
    ref = fuse_views(scene.volumes, scene.models, bbox, params)
    mesh = make_mesh(("z",), (4,))
    got = sharded_fuse_views(scene.volumes, scene.models, bbox, params,
                             mesh=mesh)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_sharded_fft_conv_ragged_z(mesh, rng):
    """Ragged Z (not divisible by the mesh) and kernel support larger
    than a shard both work and match the unsharded engine exactly
    (VERDICT r2 weak #8)."""
    vol = rng.uniform(size=(37, 20, 20)).astype(np.float32)  # 37 % 8 != 0
    kernel = rng.uniform(size=(11, 7, 7)).astype(np.float32)
    kernel /= kernel.sum()
    ref = np.asarray(fft_convolve(jnp.asarray(vol), jnp.asarray(kernel)))
    got = np.asarray(sharded_fft_convolve(vol, kernel, mesh))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sharded_dom_detection_matches_single(mesh, rng):
    """Z-sharded DoM detection == single-device DoM (VERDICT r4 weak #5:
    `detect --method dom --mesh` must actually shard), incl. beads on
    shard seams, near the global z edges (edge-clamp semantics), and at
    a ragged depth."""
    from spim_registration_tpu.detect.dom import (
        DoMParameters,
        detect_beads_dom,
    )
    from spim_registration_tpu.parallel.sharded_detect import (
        sharded_detect_beads_dom,
    )

    seam_pts = np.array([[8.0 * k + off, 20.0 + k, 20.0 - k]
                         for k in range(1, 7)
                         for off in (-0.4, 0.3)])
    edge_pts = np.array([[2.5, 10.0, 30.0], [57.0, 25.0, 12.0]])
    rand_pts = rng.uniform(6, 54, size=(15, 3))
    pts = np.concatenate([seam_pts, edge_pts, rand_pts])
    for Z in (64, 60):  # aligned + ragged over the 8-way mesh
        vol = render_beads(pts[pts[:, 0] < Z - 2], (Z, 40, 40), sigma=1.6)
        vol += rng.normal(0, 0.003, vol.shape).astype(np.float32)
        params = DoMParameters(radius1=2, radius2=3, threshold=0.003)
        ref_pts, ref_val = detect_beads_dom(vol, params)
        got_pts, got_val = sharded_detect_beads_dom(vol, params, mesh)
        assert len(got_pts) == len(ref_pts), (Z, len(got_pts), len(ref_pts))
        d = np.linalg.norm(ref_pts[:, None] - got_pts[None], axis=-1)
        assert d.min(axis=1).max() < 0.05, Z
