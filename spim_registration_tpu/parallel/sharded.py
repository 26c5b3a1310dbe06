"""Sharded (multi-chip) kernels: Gaussian/DoG, FFT convolution, RL deconv.

The distributed compute path (SURVEY.md sections 2.11 P4/P5, 5
long-context row): volumes are z-sharded over the mesh; every convolution
step exchanges PSF-support halos with mesh neighbors over ICI
(`halo_exchange_z`) and computes shard-locally — the reference's
overlapping CUDA blocks, but with live on-device exchange instead of
host-mediated copies. psi in Richardson-Lucy never leaves its shard.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.7 new-style
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from spim_registration_tpu.ops.gaussian import (
    conv_axis_valid,
    gaussian_kernel_1d,
    mirror_pad,
)
from spim_registration_tpu.parallel.halo import halo_exchange_z


# ---------------------------------------------------------------- gaussian

def _local_gaussian(x, kernels, h, axis_name):
    """Blur a local z-shard given per-axis kernels; z needs halo h."""
    xp = halo_exchange_z(x, h, axis_name)
    kz, ky, kx = kernels
    rz = (kz.shape[0] - 1) // 2
    if h > rz:  # trim excess halo so valid conv lands exactly on interior
        xp = xp[h - rz: xp.shape[0] - (h - rz)]
    out = conv_axis_valid(xp, kz, 0)
    out = conv_axis_valid(mirror_pad(out, (ky.shape[0] - 1) // 2, 1), ky, 1)
    out = conv_axis_valid(mirror_pad(out, (kx.shape[0] - 1) // 2, 2), kx, 2)
    return out


@partial(jax.jit, static_argnames=("sigmas", "mesh_holder", "axis_name"))
def _sharded_gaussian_jit(vol, sigmas, mesh_holder, axis_name):
    mesh = mesh_holder.mesh
    ks = tuple(jnp.asarray(gaussian_kernel_1d(float(s)), vol.dtype)
               for s in sigmas)
    h = (ks[0].shape[0] - 1) // 2

    def f(x):
        return _local_gaussian(x, ks, h, axis_name)

    return shard_map(f, mesh, in_specs=P(axis_name), out_specs=P(axis_name))(vol)


class _MeshHolder:
    """Hashable wrapper so a Mesh can be a static jit argument."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((self.mesh.axis_names, self.mesh.devices.tobytes()))

    def __eq__(self, other):
        return (isinstance(other, _MeshHolder)
                and self.mesh.axis_names == other.mesh.axis_names
                and self.mesh.devices.tolist() == other.mesh.devices.tolist())


def sharded_gaussian_blur(vol, sigmas, mesh: Mesh, axis_name: str = "z"):
    """Separable Gaussian blur of a z-sharded volume."""
    vol = jax.device_put(
        vol, NamedSharding(mesh, P(axis_name)))
    return _sharded_gaussian_jit(vol, tuple(float(s) for s in sigmas),
                                 _MeshHolder(mesh), axis_name)


def sharded_dog(vol, sigma1, sigma2, mesh: Mesh, axis_name: str = "z"):
    """Difference-of-Gaussian on a z-sharded volume (detection hot path)."""
    g1 = sharded_gaussian_blur(vol, (sigma1,) * 3, mesh, axis_name)
    g2 = sharded_gaussian_blur(vol, (sigma2,) * 3, mesh, axis_name)
    return g1 - g2


# ---------------------------------------------------------------- fft conv

def _fft_len(n: int) -> int:
    m = max(n, 1)
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1


def _fshape3(z, y, x):
    """Per-shard FFT shape with the deterministic-innermost policy of
    `ops.fftconv.fft_shape_for` (skip innermost sizes whose XLA-TPU c2r
    lowering is nondeterministic on large transforms)."""
    from spim_registration_tpu.ops.fftconv import fft_shape_for

    return fft_shape_for((z, y, x))


def _local_fft_conv(xp, kfft, zl, h, fshape):
    """Convolve an exchanged block (zl+2h, Y, X); crop to the interior.

    Overlap-save: circular wrap artifacts stay within the halo as long as
    the kernel z-half-support <= h, so the cropped interior is exact.
    """
    pads = [(0, fshape[0] - xp.shape[0]),
            (0, fshape[1] - xp.shape[1]),
            (0, fshape[2] - xp.shape[2])]
    xpad = jnp.pad(xp, pads)
    out = jnp.fft.irfftn(jnp.fft.rfftn(xpad) * kfft, s=fshape)
    return out[h:h + zl, :xp.shape[1], :xp.shape[2]].astype(xp.dtype)


def _prepare_local_kernel_fft(kernel, fshape):
    pads = [(0, f - k) for f, k in zip(fshape, kernel.shape)]
    kp = jnp.pad(kernel, pads)
    kp = jnp.roll(kp, [-(k // 2) for k in kernel.shape], axis=(0, 1, 2))
    return jnp.fft.rfftn(kp)


def sharded_fft_convolve(vol, kernel, mesh: Mesh, axis_name: str = "z"):
    """FFT-convolve a z-sharded volume with a (replicated) small kernel.

    Per-shard overlap-save with halo exchange; mirror boundary on the
    global y/x edges via local padding, z edges via halo mirror fix.

    Ragged depths are handled (VERDICT r2 weak #8): when Z is not a
    multiple of the mesh size, the volume is extended by its own mirror
    continuation to nz * ceil((Z+h)/nz) rows — rows within the kernel
    half-support of the TRUE bottom edge then see exactly the mirror
    data the unsharded engine uses, and the synthetic rows are cropped
    from the result. Kernel z-supports larger than a shard are fine too
    (multi-hop halo exchange), up to the mirror limit h <= Z - 1.
    """
    nz = mesh.shape[axis_name]
    Z, Y, X = vol.shape
    kz, ky, kx = kernel.shape
    h = kz // 2
    if h > Z - 1:
        raise ValueError(f"kernel z support {kz} exceeds volume depth {Z}")
    zl = -(-max(Z + h, nz) // nz) if Z % nz else Z // nz
    Zp = zl * nz
    if Zp != Z:
        from spim_registration_tpu.ops.separable import mirror_indices

        src = mirror_indices(Z, Zp - Z)[Zp - Z:]  # rows 0..Zp-1 -> source
        vol = np.asarray(vol)[src] if isinstance(vol, np.ndarray) \
            else jnp.asarray(vol)[jnp.asarray(src)]
    ry, rx = ky // 2, kx // 2
    fshape = _fshape3(zl + 2 * h, Y + 2 * ry, X + 2 * rx)

    kernel = jnp.asarray(kernel, jnp.float32)

    @partial(jax.jit, static_argnames=())
    def run(v, k):
        def f(x, kk):
            xp = halo_exchange_z(x, h, axis_name)
            xp = mirror_pad(mirror_pad(xp, ry, 1), rx, 2)
            kfft = _prepare_local_kernel_fft(kk, fshape)
            out = _local_fft_conv(xp, kfft, zl, h, fshape)
            return out[:, ry:ry + Y, rx:rx + X]

        return shard_map(f, mesh,
                         in_specs=(P(axis_name), P()),
                         out_specs=P(axis_name))(v, k)

    vol = jax.device_put(vol, NamedSharding(mesh, P(axis_name)))
    out = run(vol, kernel)
    return out[:Z] if Zp != Z else out


# ---------------------------------------------------------------- fusion

def sharded_fuse_views(volumes, models, bbox, params=None,
                       mesh: Optional[Mesh] = None, axis_name: str = "z"):
    """Weighted-average fusion with the OUTPUT bounding box z-sharded over
    the mesh (VERDICT r2 missing #2; SURVEY.md section 2.11 P1 — the
    reference's `FusionHelper#divideIntoPortions`/`ImagePortion` thread
    split, as a `shard_map` over the mesh z axis).

    Each shard computes its own output z-slab with the SAME grouped-scan
    program as the single-device `fuse_views` chunk loop: fusion reads
    views (replicated in HBM) and writes disjoint output rows, so no
    cross-shard communication is needed at all — the ideal scaling case.
    Ragged output depths are handled by padding the slab grid up and
    cropping (out-of-range rows fuse to 0 and are dropped), so ANY bbox
    works on ANY mesh size. For views too large to replicate, compose
    with the host-side streaming path (`fuse.streaming`), which feeds
    sub-region blocks through the same kernels.

    Seam-exactness vs `fuse_views` is tested on the 8-virtual-device CPU
    mesh (tests/test_parallel.py).
    """
    from spim_registration_tpu.fuse.weighted_avg import (
        FusionParameters,
        _build_fusion_groups,
        _fuse_chunk,
    )

    if params is None:
        params = FusionParameters()
    if mesh is None:
        raise ValueError("sharded_fuse_views requires a mesh")

    (out_shape, gspecs, gvols, gcw, ginvs, gscales,
     gshifts) = _build_fusion_groups(volumes, models, bbox, params)
    nz = mesh.shape[axis_name]
    Z = out_shape[0]
    zl = -(-Z // nz)  # ceil: ragged depths padded, cropped after
    chunk_shape = (zl, out_shape[1], out_shape[2])

    def f(gv, gc, gi, gs, gt):
        idx = jax.lax.axis_index(axis_name)
        offset = jnp.stack([idx.astype(jnp.float32) * zl,
                            jnp.float32(0), jnp.float32(0)])
        return _fuse_chunk(gv, gc, gi, gs, gt, offset, gspecs, params,
                           chunk_shape)

    run = jax.jit(shard_map(
        f, mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(axis_name)))
    out = run(gvols, gcw, ginvs, gscales, gshifts)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        out = multihost_utils.process_allgather(out, tiled=True)
    return np.asarray(out)[:Z]


# ------------------------------------------------------- lowrank (sharded)

def _z_band_matrices(az: np.ndarray, zl: int) -> np.ndarray:
    """(R, zl, zl+2h) Toeplitz band matrices for the z-shard conv pass.

    Row i: out[i] = sum_j flip(az_r)[j] * xp[i + j] on the halo-extended
    local block xp (zl + 2h rows, h = z half-support). Unlike the
    single-device folded matrices (`ops.separable.folded_conv_matrices`),
    NO mirror is folded in: `halo_exchange_z(boundary="mirror")` already
    delivers true neighbor rows at shard seams and global-mirror rows at
    the volume edges, so the band is translation-invariant and IDENTICAL
    on every shard (no per-shard matrix slicing)."""
    bank = np.asarray(az, np.float64)[:, ::-1]  # flip: true convolution
    R, taps = bank.shape
    T = np.zeros((R, zl, zl + taps - 1), np.float64)
    for i in range(zl):
        T[:, i, i:i + taps] = bank
    return T


def _clamp_kernel_z(k, max_taps):
    """Center-crop a kernel's z support to `max_taps` (odd) and
    renormalize — the lowrank twin of `_fit`'s z clamp (r5 advisor: the
    ragged-depth pad >= h guarantee derives from the _kshape-CLAMPED
    kernel, so a raw PSF wider than 2*Zp - 1 must be clamped before
    decomposition, not silently decomposed at full width)."""
    k = np.asarray(k)
    if k.shape[0] <= max_taps:
        return k, False
    off = (k.shape[0] - max_taps) // 2
    kc = k[off:off + max_taps].copy()
    kc /= max(kc.sum(), 1e-12)
    return kc, True


def _sharded_lowrank_entries(kernels, img_shape, zl, params, factors=None,
                             max_z_taps=None):
    """Per-kernel sharded-lowrank entries mirroring the single-device
    `deconv.lucy_richardson._folded_matrix_banks` contract:
      {"mat": (Tz, My, Mx)} — z Toeplitz band + y/x mirror-folded
        matrices, each with a leading quantization-phase axis, or
      {"kernel": k} — missed `psf_rank_tol` at the escalated cap; the
        caller converts it to the exact per-shard FFT path.
    Returns (entries, rel_errs)."""
    from spim_registration_tpu.deconv.lucy_richardson import (
        _bf16_dither_stack,
    )
    from spim_registration_tpu.ops.separable import (
        decompose_for_rl,
        folded_conv_matrices,
    )

    dt = jnp.bfloat16 if params.lowrank_dtype == "bfloat16" else jnp.float32
    phases = params.lowrank_dither_phases if dt == jnp.bfloat16 else 1
    phases = max(int(phases), 1)
    entries, errs = [], []
    for i, k in enumerate(kernels):
        fac = factors[i] if factors is not None else None
        if max_z_taps is not None:
            k, clamped = _clamp_kernel_z(k, max_z_taps)
            if clamped:  # exact factors no longer match the clamped kernel
                fac = None
        az, ay, ax, err = decompose_for_rl(
            np.asarray(k, np.float64), params.psf_rank,
            max_error=float("inf"), adapt_tol=params.psf_rank_tol,
            rank_hard=params.psf_rank_hard, factors=fac)
        errs.append(float(err))
        if err > params.psf_rank_tol:
            entries.append({"kernel": np.asarray(k, np.float32)})
            continue
        Tz = _z_band_matrices(az, zl)
        _, My, Mx = folded_conv_matrices(az, ay, ax, img_shape,
                                         dtype=np.float64)
        triple = []
        for M in (Tz, My, Mx):
            stack = (_bf16_dither_stack(M, phases) if phases > 1
                     else np.asarray(M, np.float32)[None])
            triple.append(jnp.asarray(stack).astype(dt))
        from spim_registration_tpu.utils.staticleaf import Static

        rads = tuple((f.shape[1] - 1) // 2 for f in (az, ay, ax))
        entries.append({"mat": tuple(triple), "rad": Static(rads)})
    return entries, errs


def _stacked_lowrank_matrices(kernels, img_shape, zl, params,
                              factors=None):
    """Stacked (across views) lowrank conv matrices for VIEW-AXIS
    sharding: per-view adaptive ranks are bucketed to the max rank by
    zero-padding the factor banks (a zero az row contributes exactly 0,
    as in `deconv.lucy_richardson._stack_factor_banks`), and taps are
    zero-padded centered to a common support — so (Tz, My, Mx) stack to
    (V, phases, R, n, p) arrays shardable over the view mesh axis.
    Returns the triple, or None if ANY kernel misses `psf_rank_tol` at
    the escalated cap (caller falls back to the exact FFT backend)."""
    from spim_registration_tpu.deconv.lucy_richardson import (
        _bf16_dither_stack,
    )
    from spim_registration_tpu.ops.separable import (
        decompose_for_rl,
        folded_conv_matrices,
    )

    dt = jnp.bfloat16 if params.lowrank_dtype == "bfloat16" \
        else jnp.float32
    phases = params.lowrank_dither_phases if dt == jnp.bfloat16 else 1
    phases = max(int(phases), 1)
    banks = []
    for i, k in enumerate(kernels):
        fac = factors[i] if factors is not None else None
        az, ay, ax, err = decompose_for_rl(
            np.asarray(k, np.float64), params.psf_rank,
            max_error=float("inf"), adapt_tol=params.psf_rank_tol,
            rank_hard=params.psf_rank_hard, factors=fac)
        if err > params.psf_rank_tol:
            return None
        banks.append([az, ay, ax])
    rmax = max(b[0].shape[0] for b in banks)
    for d in range(3):
        taps = max(b[d].shape[1] for b in banks)
        for b in banks:
            arr = b[d]
            padt = taps - arr.shape[1]
            lo = padt // 2
            b[d] = np.pad(arr, ((0, rmax - arr.shape[0]),
                                (lo, padt - lo)))
    stacks = ([], [], [])
    for az, ay, ax in banks:
        Tz = _z_band_matrices(az, zl)
        _, My, Mx = folded_conv_matrices(az, ay, ax, img_shape,
                                         dtype=np.float64)
        for j, M in enumerate((Tz, My, Mx)):
            stack = (_bf16_dither_stack(M, phases) if phases > 1
                     else np.asarray(M, np.float32)[None])
            stacks[j].append(stack)
    return tuple(jnp.asarray(np.stack(s)).astype(dt) for s in stacks)


# ---------------------------------------------------------------- deconv

def _mirror_restore_z(x, Z_true: int, pad: int, hr: int, axis_name: str):
    """Re-pin the ragged mirror-extension rows (global z >= Z_true) to the
    mirror continuation of the CURRENT data: row Z+d <- row Z-2-d.

    Maintaining this invariant after every psi update (and on every
    quotient before its conv) makes each conv's interior input window
    identical to the unsharded engine's mirror-padded window, so the
    ragged-depth sharded RL is exact at the true bottom edge — the same
    trick `sharded_fft_convolve` uses, extended to an ITERATIVE engine
    where the padded rows must track the evolving estimate. `hr` is the
    halo needed to reach every mirror source row
    (max(1, 2*pad - zl + 1); multi-hop handled by `halo_exchange_z`)."""
    zl = x.shape[0]
    xp = halo_exchange_z(x, hr, axis_name)
    idx = jax.lax.axis_index(axis_name)
    z0 = idx * zl
    g = z0 + jnp.arange(zl)
    src = jnp.where(g >= Z_true, 2 * Z_true - 2 - g, g)
    li = jnp.clip(src - z0 + hr, 0, zl + 2 * hr - 1)
    rows = jnp.take(xp, li, axis=0)
    mask = (g >= Z_true).reshape((zl,) + (1,) * (x.ndim - 1))
    return jnp.where(mask, rows, x)


def sharded_deconvolve(prep, params, mesh: Mesh, axis_name: str = "z",
                       view_axis: Optional[str] = None):
    """Multi-view RL with psi + views z-sharded over the mesh.

    One-shot convenience over `ShardedDeconvolutionRunner` (stage once +
    run once). Same math as `deconv.lucy_richardson.deconvolve` but every
    convolution is per-shard overlap-save with live halo exchange; psi
    stays sharded for the entire run (SURVEY.md section 5: the 70%
    scaling-efficiency target lives here).

    With `view_axis` set (a second mesh axis) the PARALLEL update scheme
    runs views data-parallel: each view-shard convolves its views against
    the (view-replicated, z-sharded) psi and the update factor is
    `psum`-reduced over the view axis — mesh ("view", "z") uses both ICI
    dimensions.
    """
    return sharded_deconvolution_runner(
        prep, params, mesh, axis_name=axis_name, view_axis=view_axis)()


def sharded_deconvolution_runner(prep, params, mesh: Mesh,
                                 axis_name: str = "z",
                                 view_axis: Optional[str] = None,
                                 device_result: bool = False):
    """Stage kernels/inputs on the mesh ONCE and return a zero-arg
    callable executing the sharded RL program — the multi-chip mirror of
    `deconv.lucy_richardson.DeconvolutionRunner`'s staging/run split, so
    repeated runs (production re-runs, scaling measurements) time only
    the device program, not host-side kernel decomposition.

    `device_result`: return the sharded device array instead of a host
    ndarray. The D2H transfer is NOT part of the device program (67 MB
    of psi at 256^3 costs seconds on a remote-tunnel link and polluted
    the r3 scaling model) — benchmarks fence on a scalar instead, and
    pipelines that feed psi to a next device stage skip the round trip
    entirely."""
    from spim_registration_tpu.deconv.lucy_richardson import compound_kernels

    images = np.asarray(prep.images, np.float32)
    weights = np.asarray(prep.weights, np.float32)
    V, Z, Y, X = images.shape
    nz = mesh.shape[axis_name]

    k2s = compound_kernels(prep.psfs, params.psf_type)
    # pad all kernels to one common shape so they stack
    raw = tuple(max(max(p.shape[d] for p in prep.psfs),
                    max(k.shape[d] for k in k2s)) for d in range(3))
    raw = tuple(k if k % 2 else k + 1 for k in raw)

    def _kshape(zloc):
        # kernels may exceed the shard depth: halo exchange is multi-hop
        # and overlap-save only needs h <= Zp - 1 (the global mirror
        # limit) — thin shards do NOT truncate the PSF (a r3 clamp of
        # 2*zl-1 cost 7e-3 nrmse on 17-tap extracted PSFs over 8 shards)
        lim = (2 * nz * zloc - 1, 2 * Y - 1, 2 * X - 1)
        return tuple(min(k, m) for k, m in zip(raw, lim))

    # Ragged depths (real bounding boxes are never multiples of the mesh
    # size): mirror-extend the volume to Zp = nz*zl with pad >= h (kernel
    # z half-support), maintained live by `_mirror_restore_z` — exact at
    # any Z. zl iterates to a fixpoint because the kernel clamp (2*zl-1)
    # loosens as zl grows; the fixpoint guarantees pad >= h.
    if Z % nz == 0:
        zl, pad = Z // nz, 0
    else:
        zl = -(-Z // nz)
        for _ in range(8):
            zl_new = -(-(Z + _kshape(zl)[0] // 2) // nz)
            if zl_new == zl:
                break
            zl = zl_new
        pad = nz * zl - Z
        if pad > Z - 1:
            raise ValueError(
                f"volume depth {Z} too thin to mirror-extend over a "
                f"{nz}-shard mesh (needs {pad} mirror rows)")
    Zp = nz * zl
    kshape = _kshape(zl)

    def _fit(k):
        out = np.zeros(kshape, np.float32)
        sl_src, sl_dst = [], []
        for d in range(3):
            if k.shape[d] <= kshape[d]:
                off = (kshape[d] - k.shape[d]) // 2
                sl_src.append(slice(0, k.shape[d]))
                sl_dst.append(slice(off, off + k.shape[d]))
            else:
                off = (k.shape[d] - kshape[d]) // 2
                sl_src.append(slice(off, off + kshape[d]))
                sl_dst.append(slice(0, kshape[d]))
        out[tuple(sl_dst)] = k[tuple(sl_src)]
        return out / max(out.sum(), 1e-12)

    conv_backend = getattr(params, "conv_backend", "fft")
    lowrank_stacked = False
    if conv_backend == "lowrank" and view_axis is not None:
        # VIEW-AXIS lowrank (VERDICT r3 next #7): per-view adaptive
        # ranks are BUCKETED to the max rank via zero factor rows
        # (contribute exactly 0), making the folded matrices stackable
        # and shardable over the view mesh axis. If any kernel misses
        # the rank tolerance, the whole job runs the exact FFT backend
        # instead (a per-kernel fallback cannot mix inside the stacked
        # program; accuracy is never silently reduced).
        k1 = _stacked_lowrank_matrices(
            [np.asarray(p) for p in prep.psfs], (Z, Y, X), zl, params,
            factors=getattr(prep, "psf_factors", None))
        k2 = _stacked_lowrank_matrices(k2s, (Z, Y, X), zl, params)
        if k1 is None or k2 is None:
            conv_backend = "fft"
        else:
            lowrank_stacked = True
    if lowrank_stacked:
        pass
    elif conv_backend == "separable":
        from spim_registration_tpu.deconv.lucy_richardson import (
            _stack_factor_banks,
        )

        k1 = _stack_factor_banks(
            [_fit(np.asarray(p)) for p in prep.psfs], params.psf_rank,
            params.psf_rank_max_error)
        k2 = _stack_factor_banks(
            [_fit(k) for k in k2s], params.psf_rank,
            params.psf_rank_max_error)
    elif conv_backend == "lowrank":
        factors = getattr(prep, "psf_factors", None)
        k1, errs1 = _sharded_lowrank_entries(
            [np.asarray(p) for p in prep.psfs], (Z, Y, X), zl, params,
            factors=factors, max_z_taps=kshape[0])
        k2, errs2 = _sharded_lowrank_entries(k2s, (Z, Y, X), zl, params,
                                             max_z_taps=kshape[0])
        # kernels that missed the tolerance at the escalated rank cap run
        # on the exact per-shard FFT path (same per-kernel mix as the
        # single-device engine); they use the common fshape/h below
        for entries in (k1, k2):
            for i, e in enumerate(entries):
                if "kernel" in e:
                    entries[i] = {"kernel": _fit(e["kernel"])}
    else:
        k1 = jnp.asarray(np.stack([_fit(np.asarray(p)) for p in prep.psfs]))
        k2 = jnp.asarray(np.stack([_fit(k) for k in k2s]))

    h = kshape[0] // 2
    ry, rx = kshape[1] // 2, kshape[2] // 2
    fshape = _fshape3(zl + 2 * h, Y + 2 * ry, X + 2 * rx)

    if conv_backend == "lowrank" and not lowrank_stacked:
        for entries in (k1, k2):
            for i, e in enumerate(entries):
                if "kernel" in e:
                    entries[i] = {"fft": _prepare_local_kernel_fft(
                        jnp.asarray(e["kernel"]), fshape)}
        k1, k2 = tuple(k1), tuple(k2)

    osem = jnp.float32(params.osem_factor if params.osem_factor is not None
                       else prep.osem_factor)
    lam = jnp.float32(params.tikhonov_lambda)
    use_lam = params.tikhonov_lambda > 0
    wsum = weights.sum(axis=0)
    avg = float((images * weights).sum() / max(wsum.sum(), 1e-9))
    psi0 = np.where(wsum > 1e-9, (images * weights).sum(axis=0)
                    / np.maximum(wsum, 1e-9), avg).astype(np.float32)
    psi0 = np.maximum(psi0, params.min_value * avg)
    minv = jnp.float32(params.min_value * avg)

    if pad:  # mirror-extend data; weights 0 beyond Z (no true signal)
        images = np.pad(images, ((0, 0), (0, pad), (0, 0), (0, 0)),
                        mode="reflect")
        weights = np.pad(weights, ((0, 0), (0, pad), (0, 0), (0, 0)))
        psi0 = np.pad(psi0, ((0, pad), (0, 0), (0, 0)), mode="reflect")
    hr = max(1, 2 * pad - zl + 1) if pad else 0

    def restore(x):
        if pad == 0:
            return x
        return _mirror_restore_z(x, Z, pad, hr, axis_name)

    n_iter = params.num_iterations

    def local_conv(x, kfft):
        xp = halo_exchange_z(x, h, axis_name)
        xp = mirror_pad(mirror_pad(xp, ry, 1), rx, 2)
        return _local_fft_conv(xp, kfft, x.shape[0], h, fshape)[
            :, ry:ry + Y, rx:rx + X]

    scheme = getattr(params, "scheme", "sequential")
    if view_axis is not None and scheme != "parallel":
        raise ValueError("view-axis sharding requires scheme='parallel' "
                         "(sequential OSEM is inherently view-serial)")

    def _f_lowrank(psi, imgs, ws, k1e, k2e):
        """Sharded mirror of the single-device lowrank engine
        (`deconv.lucy_richardson._rl_iterate` lowrank branch): unrolled
        per-view kernels with adaptive ranks, dithered-bf16 phase
        schedule (_i + v), DELTA-form conv2 (1 + K2 (x) (q-1)), and
        per-kernel exact-FFT fallback. The z pass consumes live
        mirror-halo rows (band matrices); y/x passes are the same
        mirror-folded matmuls as single-device, so the sharded result is
        seam-exact vs the single-device engine (tests/test_parallel.py).
        """
        V = imgs.shape[0]
        mats = [e["mat"] for e in list(k1e) + list(k2e) if "mat" in e]
        n_phases = mats[0][0].shape[0] if mats else 1

        def sel(triple, step):
            if n_phases == 1:
                return tuple(M[0] for M in triple)
            p = jnp.mod(step, n_phases)
            return tuple(
                jax.lax.dynamic_index_in_dim(M, p, 0, keepdims=False)
                for M in triple)

        # The y/x passes are shard-local and identical to the
        # single-device fused Pallas kernel's (the z pass differs: band
        # matrices over live halos). On real TPUs with 16-aligned shard
        # depth, fuse them (b/c intermediates stay in VMEM, ~3x the XLA
        # chain — see ops/pallas/lowrank_conv.py).
        from spim_registration_tpu.deconv.lucy_richardson import (
            resolve_lowrank_fused,
        )

        fuse_yx = resolve_lowrank_fused(
            getattr(params, "lowrank_fused", "auto"))
        # explicit True off-TPU = numerics check via interpret mode
        from spim_registration_tpu.utils.backend import is_tpu_backend
        _interp = not is_tpu_backend()

        def conv_mat(x, triple, rads=(None,) * 3):
            Tz, My, Mx = triple
            mid_t = Tz.dtype
            hz = (Tz.shape[-1] - Tz.shape[-2]) // 2
            xp = halo_exchange_z(x, hz, axis_name) if hz > 0 else x
            # x.shape is the LOCAL shard shape at shard_map trace time
            from spim_registration_tpu.ops.pallas.lowrank_conv import (
                plan_fused_sl,
            )

            plan = (plan_fused_sl(*x.shape, itemsize=mid_t.itemsize)
                    if fuse_yx else None)
            if plan is not None:
                from spim_registration_tpu.ops.pallas.lowrank_conv import (
                    fused_sl_apply,
                    fused_sl_reference,
                    plan_zpass_banded,
                    zpass_apply_planned,
                )

                # z-major layout throughout (no transposes; r5 redesign);
                # Tz is a halo band matrix (band center offset hz)
                zp = (None if _interp else
                      plan_zpass_banded(Tz.shape[1], Tz.shape[2],
                                        x.shape[1], x.shape[2], rad=hz,
                                        off=hz, itemsize=mid_t.itemsize))
                if zp is not None:  # copy-free Pallas z pass (see _zpass_call)
                    a = zpass_apply_planned(Tz, xp.astype(mid_t), zp)
                else:
                    a = jnp.einsum("pyx,rnp->rnyx", xp.astype(mid_t), Tz,
                                   preferred_element_type=mid_t)
                if _interp:  # off-TPU: numerics-identical XLA emulation
                    return fused_sl_reference(a, My, Mx).astype(x.dtype)
                tz_, vlim_ = plan
                return fused_sl_apply(a, My, Mx, tz=tz_,
                                      vmem_limit=vlim_, rad_y=rads[1],
                                      rad_x=rads[2]).astype(x.dtype)
            a = jnp.einsum("pyx,rnp->rnyx", xp.astype(mid_t), Tz,
                           preferred_element_type=mid_t)
            b = jnp.einsum("rzpx,rnp->rznx", a, My,
                           preferred_element_type=mid_t)
            c = jnp.einsum("rzyp,rnp->rzyn", b, Mx,
                           preferred_element_type=jnp.float32)
            return jnp.sum(c, axis=0).astype(x.dtype)

        def _rads(entry):
            r = entry.get("rad")
            return r.value if r is not None else (None,) * 3

        def conv_k1(x, entry, step):
            if "mat" in entry:
                return conv_mat(x, sel(entry["mat"], step), _rads(entry))
            return local_conv(x, entry["fft"])

        def conv2_minus_1(q, entry, step):
            q = restore(q)  # quotient pad rows -> live mirror (exact edge)
            if "mat" in entry:
                return conv_mat(q - 1.0, sel(entry["mat"], step),
                                _rads(entry))
            return local_conv(q, entry["fft"]) - 1.0

        def regularize(p):
            if use_lam:
                p = p / (1.0 + lam * p)
            return jnp.maximum(p, minv)

        def view_delta(p, v, step):
            conv1 = conv_k1(p, k1e[v], step)
            q = jnp.clip(imgs[v] / jnp.maximum(conv1, 1e-12), 0.0, 1e4)
            return conv2_minus_1(q, k2e[v], step)

        if scheme == "sequential":
            def iteration(_i, p):
                for v in range(V):
                    d = view_delta(p, v, _i + v)
                    p = restore(regularize(p * (1.0 + osem * ws[v] * d)))
                return p
        else:
            def iteration(_i, p):
                factor = jnp.float32(1.0)
                for v in range(V):
                    factor = factor + ws[v] * view_delta(p, v, _i + v)
                return restore(regularize(p * factor))

        return jax.lax.fori_loop(0, n_iter, iteration, psi)

    def _f_lowrank_stacked(psi, imgs, ws, K1, K2):
        """VIEW-AXIS-sharded lowrank RL (VERDICT r3 next #7): stacked
        per-view matrices (ranks bucketed, `_stacked_lowrank_matrices`)
        on the 2D (view, z) mesh — each view-shard convolves its views
        against the z-sharded psi and the parallel-scheme update factor
        psum-reduces over the view axis. bf16 dither phases advance per
        ITERATION here (the z-only engine advances per view-update;
        both schedules time-average the quantization to zero)."""
        Tz1, My1, Mx1 = K1
        Tz2, My2, Mx2 = K2
        n_phases = Tz1.shape[1]
        hz1 = (Tz1.shape[-1] - Tz1.shape[-2]) // 2
        hz2 = (Tz2.shape[-1] - Tz2.shape[-2]) // 2

        def sel(M, step):
            if n_phases == 1:
                return M[:, 0]
            p = jnp.mod(step, n_phases)
            return jax.lax.dynamic_index_in_dim(M, p, 1, keepdims=False)

        def halo_z_batch(q, hz):
            if hz == 0:
                return q
            qs = jnp.moveaxis(q, 1, 0)      # z leads for the exchange
            qe = halo_exchange_z(qs, hz, axis_name)
            return jnp.moveaxis(qe, 0, 1)

        def restore_batch(q):
            if pad == 0:
                return q
            qs = jnp.moveaxis(q, 1, 0)
            qs = _mirror_restore_z(qs, Z, pad, hr, axis_name)
            return jnp.moveaxis(qs, 0, 1)

        def regularize(p):
            if use_lam:
                p = p / (1.0 + lam * p)
            return jnp.maximum(p, minv)

        def tail(a, My, Mx):
            b = jnp.einsum("vrzpx,vrnp->vrznx", a, My,
                           preferred_element_type=My.dtype)
            c = jnp.einsum("vrzyp,vrnp->vrzyn", b, Mx,
                           preferred_element_type=jnp.float32)
            return jnp.sum(c, axis=1)

        def iteration(_i, p):
            t1 = sel(Tz1, _i)
            xp = halo_exchange_z(p, hz1, axis_name) if hz1 else p
            a = jnp.einsum("pyx,vrnp->vrnyx", xp.astype(t1.dtype), t1,
                           preferred_element_type=t1.dtype)
            conv1 = tail(a, sel(My1, _i), sel(Mx1, _i))  # (Vl, zl, Y, X)
            q = jnp.clip(imgs / jnp.maximum(conv1, 1e-12), 0.0, 1e4)
            q = restore_batch(q) - 1.0                   # delta form
            t2 = sel(Tz2, _i)
            qe = halo_z_batch(q, hz2)
            a2 = jnp.einsum("vpyx,vrnp->vrnyx", qe.astype(t2.dtype), t2,
                            preferred_element_type=t2.dtype)
            delta = tail(a2, sel(My2, _i), sel(Mx2, _i))
            partial_f = jnp.sum(ws * delta, axis=0)
            partial_f = jax.lax.psum(partial_f, view_axis)
            return restore(regularize(p * (1.0 + partial_f)))

        return jax.lax.fori_loop(0, n_iter, iteration, psi)

    def local_conv_sep(x, bank):
        """Sum-of-separable conv on a z-shard: z pass consumes exchanged
        halo rows, y/x passes mirror-pad locally. Factors are flipped so
        the correlation-style `conv_axis_valid` computes true convolution
        (matters for asymmetric/rotated PSFs)."""
        az, ay, ax = (jnp.flip(b, axis=1) for b in bank)  # (R, taps) each
        hz = (az.shape[-1] - 1) // 2
        xp = halo_exchange_z(x, hz, axis_name)

        def one_term(kz, ky, kx):
            out = conv_axis_valid(xp, kz, 0) if hz > 0 else xp * kz[0]
            for ax_i, k in ((1, ky), (2, kx)):
                r = (k.shape[0] - 1) // 2
                out = conv_axis_valid(mirror_pad(out, r, ax_i), k, ax_i) \
                    if r > 0 else out * k[0]
            return out

        return jnp.sum(jax.vmap(one_term)(az, ay, ax), axis=0)

    def f(psi, imgs, ws, k1_, k2_):
        if lowrank_stacked:
            return _f_lowrank_stacked(psi, imgs, ws, k1_, k2_)
        if conv_backend == "lowrank":
            return _f_lowrank(psi, imgs, ws, k1_, k2_)
        if conv_backend == "separable":
            k1f, k2f = k1_, k2_
        else:
            k1f = jax.vmap(
                lambda k: _prepare_local_kernel_fft(k, fshape))(k1_)
            k2f = jax.vmap(
                lambda k: _prepare_local_kernel_fft(k, fshape))(k2_)

        _conv = (local_conv_sep if conv_backend == "separable"
                 else local_conv)

        def quotient_conv(p, img, a, b):
            conv1 = _conv(p, a)
            q = jnp.clip(img / jnp.maximum(conv1, 1e-12), 0.0, 1e4)
            return _conv(restore(q), b)

        def regularize(p):
            if use_lam:
                p = p / (1.0 + lam * p)
            return jnp.maximum(p, minv)

        if scheme == "parallel":
            def iteration(_i, p):
                conv2 = jax.vmap(
                    lambda img, a, b: quotient_conv(p, img, a, b)
                )(imgs, k1f, k2f)
                partial_f = jnp.sum(ws * (conv2 - 1.0), axis=0)
                if view_axis is not None:
                    partial_f = jax.lax.psum(partial_f, view_axis)
                return restore(regularize(p * (1.0 + partial_f)))
        else:
            def view_step(p, inp):
                img, w, a, b = inp
                conv2 = quotient_conv(p, img, a, b)
                return restore(
                    regularize(p * (1.0 + osem * w * (conv2 - 1.0)))), None

            def iteration(_i, p):
                p, _ = jax.lax.scan(view_step, p, (imgs, ws, k1f, k2f))
                return p

        return jax.lax.fori_loop(0, n_iter, iteration, psi)

    vspec = view_axis  # None -> views replicated / local
    sharded = NamedSharding(mesh, P(axis_name))
    sharded_v = NamedSharding(mesh, P(vspec, axis_name))
    psi = jax.device_put(jnp.asarray(psi0), sharded)
    imgs = jax.device_put(jnp.asarray(images), sharded_v)
    ws = jax.device_put(jnp.asarray(weights), sharded_v)

    run = jax.jit(shard_map(
        f, mesh,
        in_specs=(P(axis_name), P(vspec, axis_name), P(vspec, axis_name),
                  P(vspec), P(vspec)),
        out_specs=P(axis_name)))

    def execute():
        out = run(psi, imgs, ws, k1, k2)
        if device_result:
            # sharded device array at the PADDED depth (execute.padded_depth);
            # callers slice [:execute.true_depth] when materializing
            return out
        if jax.process_count() > 1:
            # multi-host: shards live on non-addressable devices; gather
            # the global result to every host over DCN
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(out, tiled=True))[:Z]
        return np.asarray(out)[:Z]

    execute.true_depth = Z
    execute.padded_depth = Zp
    return execute
