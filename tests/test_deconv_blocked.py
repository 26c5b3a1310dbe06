"""Out-of-core blocked RL: seam-exact parity with the in-memory engine.

VERDICT r1 item 3 / SURVEY.md section 2.8 Block semantics: halos re-read
from the current psi per view-update make the blocked result equal the
in-memory engine (no seams); the psi store doubles as the resume
checkpoint.
"""

import numpy as np
import pytest

from spim_registration_tpu.deconv import (
    DeconvolutionParameters,
    DeconvolutionRunner,
)
from spim_registration_tpu.deconv.blocked import (
    ArrayStore,
    BlockedDeconvolutionInputs,
    BlockedDeconvolutionRunner,
)
from spim_registration_tpu.deconv.prep import DeconvolutionViews

SHAPE = (48, 32, 32)
N_VIEWS = 2


@pytest.fixture(scope="module")
def problem():
    from tests.test_deconv_golden import _random_kernel  # asymmetric
    rng = np.random.default_rng(3)
    psfs = [_random_kernel(rng, (7, 7, 7)) for _ in range(N_VIEWS)]
    truth = np.zeros(SHAPE, np.float64)
    for _ in range(30):
        z, y, x = [rng.integers(4, s - 4) for s in SHAPE]
        truth[z, y, x] = rng.uniform(0.5, 2.0)
    import numpy.fft as nfft
    axes = (0, 1, 2)
    tf = nfft.rfftn(truth, axes=axes)
    views = []
    for p in psfs:
        kp = np.zeros(SHAPE)
        kp[:7, :7, :7] = p
        kp = np.roll(kp, (-3, -3, -3), axis=axes)
        views.append(np.maximum(nfft.irfftn(
            tf * nfft.rfftn(kp, axes=axes), SHAPE, axes=axes), 0.0) + 0.01)
    w = rng.uniform(0.2, 1.0, size=(N_VIEWS,) + SHAPE)
    weights = (w / w.sum(axis=0)).astype(np.float32)
    images = np.stack(views).astype(np.float32)
    return images, weights, [p.astype(np.float32) for p in psfs]


def _params(n_iter=3):
    return DeconvolutionParameters(
        num_iterations=n_iter, psf_type="efficient_bayesian",
        conv_backend="fft", osem_factor=1.6)


def _blocked_inputs(images, weights, psfs):
    return BlockedDeconvolutionInputs(
        image_stores=[ArrayStore(images[v]) for v in range(N_VIEWS)],
        weight_stores=[ArrayStore(weights[v]) for v in range(N_VIEWS)],
        psfs=list(psfs), osem_factor=1.6)


def test_blocked_matches_in_memory(problem):
    """Blocked == in-memory up to FFT-size float noise, and blocking
    itself is SEAM-FREE: a single-block run (no seams possible, but
    different FFT sizes than the in-memory engine) deviates from the
    in-memory engine exactly as much as the multi-block run — measured
    identical 3.9e-4 max over 3 iterations — so block boundaries add
    nothing."""
    images, weights, psfs = problem
    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=1.6)
    ref = np.asarray(DeconvolutionRunner(prep, _params()).run())

    outs = {}
    for bz in (16, SHAPE[0]):  # multi-block vs single block
        psi_store = ArrayStore(np.zeros(SHAPE, np.float32))
        BlockedDeconvolutionRunner(
            _blocked_inputs(images, weights, psfs), psi_store, _params(),
            block_z=bz).run()
        outs[bz] = psi_store.array
    scale = ref.max() - ref.min()
    # engine parity: float-noise level (amplified by 6 multiplicative
    # view-updates across different FFT sizes)
    np.testing.assert_allclose(outs[16], ref, atol=4e-3 * scale)
    # seam-freeness: multi-block no farther from the in-memory engine
    # than the single block that cannot have seams
    d_multi = np.abs(outs[16] - ref).max()
    d_single = np.abs(outs[SHAPE[0]] - ref).max()
    assert d_multi <= d_single * 1.5 + 1e-6, (d_multi, d_single)


def test_blocked_resume_equals_straight_run(problem):
    images, weights, psfs = problem
    inputs = _blocked_inputs(images, weights, psfs)

    s1 = ArrayStore(np.zeros(SHAPE, np.float32))
    BlockedDeconvolutionRunner(inputs, s1, _params(4), block_z=24).run()

    s2 = ArrayStore(np.zeros(SHAPE, np.float32))
    r2 = BlockedDeconvolutionRunner(inputs, s2, _params(4), block_z=24)
    r2.run(num_iterations=2)
    # resume: new runner over the same psi store, no re-init
    r3 = BlockedDeconvolutionRunner(inputs, s2, _params(4), block_z=24)
    r3.run(num_iterations=2, init_psi=False)
    np.testing.assert_allclose(s2.array, s1.array, atol=1e-6)


def test_blocked_on_raw_volume_store(problem, tmp_path):
    """Same parity through the native (or memmap-fallback) disk store."""
    from spim_registration_tpu.native_blocks import RawVolumeStore

    images, weights, psfs = problem
    stores_i, stores_w = [], []
    for v in range(N_VIEWS):
        si = RawVolumeStore(str(tmp_path / f"img{v}.raw"), SHAPE,
                            create=True)
        si.write_block((0, 0, 0), images[v])
        sw = RawVolumeStore(str(tmp_path / f"w{v}.raw"), SHAPE, create=True)
        sw.write_block((0, 0, 0), weights[v])
        stores_i.append(si)
        stores_w.append(sw)
    psi = RawVolumeStore(str(tmp_path / "psi.raw"), SHAPE, create=True)
    inputs = BlockedDeconvolutionInputs(stores_i, stores_w, list(psfs), 1.6)
    BlockedDeconvolutionRunner(inputs, psi, _params(2), block_z=16).run()

    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=1.6)
    ref = np.asarray(DeconvolutionRunner(prep, _params(2)).run())
    got = psi.read_block((0, 0, 0), SHAPE)
    np.testing.assert_allclose(got, ref, atol=4e-3 * (ref.max() - ref.min()))


def _params_lr(n_iter=3, dtype="float32"):
    return DeconvolutionParameters(
        num_iterations=n_iter, psf_type="efficient_bayesian",
        conv_backend="lowrank", psf_rank=12, psf_rank_tol=1e-4,
        psf_rank_hard=24, lowrank_dtype=dtype, osem_factor=1.6)


def test_blocked_lowrank_matches_in_memory(problem):
    """Out-of-core LOWRANK RL (VERDICT r3 next #3): z band matmuls over
    halos re-read from the ping-pong psi store + full-axis folded y/x
    matmuls == the in-memory lowrank engine, at every block size."""
    images, weights, psfs = problem
    inputs = _blocked_inputs(images, weights, psfs)
    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=1.6)
    ref = np.asarray(DeconvolutionRunner(prep, _params_lr()).run())
    for bz in (12, 24, 48):
        psi_store = ArrayStore(np.zeros(SHAPE, np.float32))
        BlockedDeconvolutionRunner(
            inputs, psi_store, _params_lr(), block_z=bz).run()
        nrmse = np.sqrt(np.mean((psi_store.array - ref) ** 2)) \
            / (ref.max() - ref.min())
        assert nrmse < 1e-5, (bz, nrmse)


def test_blocked_lowrank_bf16_close_to_f32(problem):
    """bf16 + dither phases in the blocked engine stay within the usual
    quantization envelope of the float32 result."""
    images, weights, psfs = problem
    inputs = _blocked_inputs(images, weights, psfs)
    psi32 = ArrayStore(np.zeros(SHAPE, np.float32))
    BlockedDeconvolutionRunner(
        inputs, psi32, _params_lr(2), block_z=24).run()
    psi16 = ArrayStore(np.zeros(SHAPE, np.float32))
    BlockedDeconvolutionRunner(
        inputs, psi16, _params_lr(2, dtype="bfloat16"), block_z=24).run()
    nrmse = np.sqrt(np.mean((psi16.array - psi32.array) ** 2)) \
        / (psi32.array.max() - psi32.array.min())
    assert nrmse < 3e-3, nrmse


def test_blocked_lowrank_fft_fallback_mix(problem):
    """A kernel that misses the rank tolerance at the hard cap runs the
    exact FFT path INSIDE the blocked lowrank loop, matching the
    in-memory engine's per-kernel mix."""
    images, weights, psfs = problem
    inputs = _blocked_inputs(images, weights, psfs)
    params = DeconvolutionParameters(
        num_iterations=2, psf_type="independent", conv_backend="lowrank",
        psf_rank=1, psf_rank_tol=1e-9, psf_rank_hard=1, osem_factor=1.6)
    prep = DeconvolutionViews(images=images, weights=weights, psfs=psfs,
                              osem_factor=1.6)
    ref = np.asarray(DeconvolutionRunner(prep, params).run())
    psi_store = ArrayStore(np.zeros(SHAPE, np.float32))
    BlockedDeconvolutionRunner(
        inputs, psi_store, params, block_z=24).run()
    nrmse = np.sqrt(np.mean((psi_store.array - ref) ** 2)) \
        / (ref.max() - ref.min())
    assert nrmse < 1e-5, nrmse


def test_blocked_meshed_matches_single_device(problem):
    """MESH x OUT-OF-CORE (VERDICT r4 next #4): z-blocks round-robined
    across an 8-device mesh (groups run as one sharded program) ==
    the single-device block loop, for BOTH conv backends, including a
    ragged group (4 blocks on 8 devices) and multiple groups."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("z",))
    images, weights, psfs = problem
    inputs = _blocked_inputs(images, weights, psfs)
    for params, tol in ((_params(2), 1e-6), (_params_lr(2), 1e-6)):
        for bz in (12, 6):  # 4 blocks (padded group) / 8 blocks (full)
            s_ref = ArrayStore(np.zeros(SHAPE, np.float32))
            BlockedDeconvolutionRunner(
                inputs, s_ref, params, block_z=bz).run()
            s_got = ArrayStore(np.zeros(SHAPE, np.float32))
            BlockedDeconvolutionRunner(
                inputs, s_got, params, block_z=bz, mesh=mesh).run()
            scale = s_ref.array.max() - s_ref.array.min()
            nrmse = np.sqrt(np.mean(
                (s_got.array - s_ref.array) ** 2)) / scale
            assert nrmse < tol, (params.conv_backend, bz, nrmse)


def test_streamed_prep_matches_in_memory(problem, tmp_path):
    """`prepare_views_streamed` (disk-resident, one source view at a
    time) == `prepare_views_for_deconvolution` voxel-for-voxel,
    including weight normalization and the OSEM factor."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.deconv.prep import (
        prepare_views_for_deconvolution,
    )
    from spim_registration_tpu.deconv.prep_streamed import (
        prepare_views_streamed,
    )

    images, weights, psfs = problem
    rng = np.random.default_rng(9)
    vols = [rng.random((40, 36, 30)).astype(np.float32) + 0.01
            for _ in range(2)]
    models = [np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1),
              np.array([[1, 0, 0, 2.0], [0, 1, 0, -1.5], [0, 0, 1, 0.5]],
                       np.float32)]
    bbox = BoundingBox("b", (0, 0, 0), (38, 36, 30))
    ref = prepare_views_for_deconvolution(vols, models, psfs, bbox)
    got = prepare_views_streamed(lambda v: vols[v], models, psfs, bbox,
                                 str(tmp_path / "ooc"), slab_z=16)
    for v in range(2):
        gi = got.image_stores[v].read_block((0, 0, 0), bbox.shape)
        gw = got.weight_stores[v].read_block((0, 0, 0), bbox.shape)
        np.testing.assert_allclose(gi, ref.images[v], atol=1e-6)
        np.testing.assert_allclose(gw, ref.weights[v], atol=1e-6)
    assert abs(got.osem_factor - ref.osem_factor) < 1e-6


def test_cli_deconvolve_out_of_core_matches_in_memory(tmp_path):
    """`deconvolve --out-of-core` (streamed prep + blocked runner from
    the CLI) ~= the in-memory CLI deconvolution."""
    from spim_registration_tpu.cli import main

    out = str(tmp_path / "ds")
    assert main(["simulate", "--out", out, "--views", "2", "--shape",
                 "40", "36", "36", "--beads", "40"]) == 0
    xml = out + "/dataset.xml"
    assert main(["detect", xml]) == 0
    assert main(["register", xml]) == 0
    mem = tmp_path / "psi_mem.npy"
    ooc = tmp_path / "psi_ooc.npy"
    it = "--set=deconvolution.num_iterations=2"
    assert main(["deconvolve", xml, "--out", str(mem), it]) == 0
    assert main(["deconvolve", xml, "--out", str(ooc), it,
                 "--out-of-core"]) == 0
    a, b = np.load(mem), np.load(ooc)
    assert a.shape == b.shape
    scale = a.max() - a.min()
    nrmse = np.sqrt(np.mean((a - b) ** 2)) / scale
    # blocked engine uses different FFT sizes than the in-memory one;
    # same tolerance class as test_blocked_matches_in_memory
    assert nrmse < 2e-3, nrmse
