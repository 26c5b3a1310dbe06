"""Out-of-core (blocked) multi-view Richardson-Lucy deconvolution.

Reference parity: `Block` / `BlockGeneratorFixedSizePrecise` +
`LRFFT`'s block loop (SURVEY.md section 2.8, section 5 "long-context
analog"): volumes larger than device memory are deconvolved by streaming
z-slab blocks disk<->HBM. Per view-update, each block reads the CURRENT psi
with a halo of the full compound support (r1 + r2, re-read like the
reference re-reads source halos per conv), computes the update for its
interior, and writes it back — so the blocked result equals the
in-memory engine exactly (seam-free), which the tests assert.

IO pattern per iteration: for each view v (OSEM-sequential, matching
`BayesMVDeconvolution`): for each block: read psi(block+r1+r2) +
img_v(block+r2) + w_v(block), one fused device program (overlap-save FFT
conv x2 + multiplicative update), write psi(block). Each view-update
PING-PONGS between the psi store and a scratch store: every block of a
view's update must read the PRE-update psi (the reference convolves the
whole current estimate before updating) — writing in place would leak a
block's update into its successor's halo and print seams. The psi store
on disk doubles as the checkpoint: a crashed run resumes from the last
completed iteration (`init_psi=False`).

Stores: anything with `.shape`, `.read_block(lo, hi)`,
`.write_block(lo, arr)` — the native C++ `RawVolumeStore`
(native/spimblocks.cpp, threaded pread/pwrite), the TensorStore-backed
Zarr volumes, or the in-memory `ArrayStore` below.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.deconv.lucy_richardson import (
    DeconvolutionParameters,
    compound_kernels,
)
from spim_registration_tpu.ops.fftconv import fft_shape_for
from spim_registration_tpu.ops.gaussian import mirror_pad


class ArrayStore:
    """In-memory store with the block-store interface (tests / staging)."""

    def __init__(self, array: np.ndarray):
        self.array = np.asarray(array, np.float32)
        self.shape = tuple(self.array.shape)

    def read_block(self, lo, hi) -> np.ndarray:
        sl = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        return np.array(self.array[sl])

    def write_block(self, lo, data: np.ndarray) -> None:
        sl = tuple(slice(int(a), int(a) + s)
                   for a, s in zip(lo, data.shape))
        self.array[sl] = data


def _read_mirror_z(store, z_lo: int, z_hi: int) -> np.ndarray:
    """Read rows [z_lo, z_hi) of a (Z, Y, X) store, mirror-filling rows
    outside the volume (single-boundary mirror, matching the in-memory
    engine's global boundary handling)."""
    Z = store.shape[0]
    il, ih = max(z_lo, 0), min(z_hi, Z)
    core = store.read_block((il, 0, 0), (ih,) + tuple(store.shape[1:]))
    pl, ph = il - z_lo, z_hi - ih
    if pl or ph:
        core = np.pad(core, ((pl, ph), (0, 0), (0, 0)), mode="reflect")
    return core


def _mirror_q_edges(q, z_lo, z_true):
    """Re-pin quotient rows OUTSIDE the true volume to the mirror of the
    interior quotient: the in-memory engine mirror-pads q itself before
    conv2, while a block near the global edge COMPUTES q on mirror-read
    inputs — not the same thing for asymmetric kernels (conv at a
    mirrored position != mirror of the conv). Exact edge parity needs
    q[Z+d] := q[Z-2-d] (and q[-d] := q[d]); sources always lie inside
    the extended block. `z_lo` is the global row of q[0] (traced, so one
    program serves every block)."""
    n = q.shape[0]
    g = z_lo + jnp.arange(n)
    src = jnp.where(g < 0, -g, g)
    src = jnp.where(src > z_true - 1, 2 * (z_true - 1) - src, src)
    li = jnp.clip(src - z_lo, 0, n - 1)
    outside = (g < 0) | (g > z_true - 1)
    return jnp.where(outside[:, None, None], q[li], q)


@partial(jax.jit, static_argnames=("bz", "h", "r1z", "r2z", "fs1", "fs2",
                                   "ry1", "rx1", "ry2", "rx2", "use_lam"))
def _block_view_update(psi_ext, img_ext, w, k1fft, k2fft, osem, lam, minv,
                       z_lo, z_true,
                       bz, h, r1z, r2z, fs1, fs2, ry1, rx1, ry2, rx2,
                       use_lam):
    """One view's RL update for one z-slab block — a single XLA program.

    psi_ext: (bz + 2h, Y, X) with h = r1z + r2z (z halo re-read from the
    current psi; global z edges pre-mirrored host-side). y/x mirror
    boundaries are applied locally — identical to the in-memory engine,
    which mirrors the full axes.
    """
    Y, X = psi_ext.shape[1], psi_ext.shape[2]

    def conv_os(x, kfft, rz, ry, rx, fshape):
        # overlap-save in z (valid interior), mirror-pad in y/x
        xp = mirror_pad(mirror_pad(x, ry, 1), rx, 2)
        pads = [(0, fshape[0] - xp.shape[0]),
                (0, fshape[1] - xp.shape[1]),
                (0, fshape[2] - xp.shape[2])]
        xp = jnp.pad(xp, pads)
        out = jnp.fft.irfftn(jnp.fft.rfftn(xp) * kfft, s=fshape)
        return out[rz:x.shape[0] - rz, ry:ry + Y, rx:rx + X]

    conv1 = conv_os(psi_ext, k1fft, r1z, ry1, rx1, fs1)  # (bz+2*r2z, Y, X)
    q = jnp.clip(img_ext / jnp.maximum(conv1, 1e-12), 0.0, 1e4)
    q = _mirror_q_edges(q, z_lo, z_true)
    conv2 = conv_os(q, k2fft, r2z, ry2, rx2, fs2)        # (bz, Y, X)
    psi = psi_ext[h:h + bz]
    psi = psi * (1.0 + osem * w * (conv2 - 1.0))
    if use_lam:
        psi = psi / (1.0 + lam * psi)
    return jnp.maximum(psi, minv)


def _lowrank_stage_entries(kernels, n_out, yx, params, factors=None):
    """Per-kernel lowrank entries for ONE conv stage of the blocked loop:
    {"mat": (Tz, My, Mx)} with Tz an (R, n_out, n_out + taps - 1) z band
    matrix consuming the halo rows RE-READ from the psi/q store (the
    blocked mirror of `parallel.sharded._z_band_matrices` over live
    halos), My/Mx the usual full-axis mirror-folded matrices — or None
    for kernels that miss `psf_rank_tol` at the escalated cap (the
    caller falls back to the exact per-block FFT path for those).
    Returns (entries, rel_errs, z_tap_radii)."""
    from spim_registration_tpu.deconv.lucy_richardson import (
        _bf16_dither_stack,
    )
    from spim_registration_tpu.ops.separable import (
        decompose_for_rl,
        folded_conv_matrices,
    )
    from spim_registration_tpu.parallel.sharded import _z_band_matrices

    dt = jnp.bfloat16 if params.lowrank_dtype == "bfloat16" \
        else jnp.float32
    phases = params.lowrank_dither_phases if dt == jnp.bfloat16 else 1
    phases = max(int(phases), 1)
    entries, errs, radii = [], [], []
    for i, k in enumerate(kernels):
        fac = factors[i] if factors is not None else None
        az, ay, ax, err = decompose_for_rl(
            np.asarray(k, np.float64), params.psf_rank,
            max_error=float("inf"), adapt_tol=params.psf_rank_tol,
            rank_hard=params.psf_rank_hard, factors=fac)
        errs.append(float(err))
        if err > params.psf_rank_tol:
            entries.append(None)
            radii.append(0)
            continue
        Tz = _z_band_matrices(az, n_out)
        _, My, Mx = folded_conv_matrices(az, ay, ax, (1,) + tuple(yx),
                                         dtype=np.float64)
        triple = []
        for M in (Tz, My, Mx):
            stack = (_bf16_dither_stack(M, phases) if phases > 1
                     else np.asarray(M, np.float32)[None])
            triple.append(jnp.asarray(stack).astype(dt))
        from spim_registration_tpu.utils.staticleaf import Static

        rads = tuple((f.shape[1] - 1) // 2 for f in (az, ay, ax))
        entries.append({"mat": tuple(triple), "rad": Static(rads)})
        radii.append((az.shape[1] - 1) // 2)
    return entries, errs, radii


@partial(jax.jit, static_argnames=("bz", "h", "r2z", "t1", "t2", "fs1",
                                   "fs2", "ry1", "rx1", "ry2", "rx2",
                                   "use_lam"))
def _block_view_update_lr(psi_ext, img_ext, w, e1, e2, step, osem, lam,
                          minv, z_lo, z_true, *, bz, h, r2z, t1, t2,
                          fs1, fs2, ry1, rx1, ry2, rx2, use_lam):
    """One view's RL update for one z-slab block, LOWRANK backend: the
    z pass is a band matmul over the halo rows re-read from the current
    psi store; y/x passes are the same full-axis mirror-folded matmuls
    as the in-memory engine — so the blocked result equals the in-memory
    lowrank engine up to summation order (seam-free; tested). Entries
    mix per kernel: {"mat": ...} matmul path, {"fft": ...} exact
    overlap-save fallback (same per-kernel mix as the in-memory engine).
    `step` drives the bf16 dither phase schedule (iteration + view,
    matching `_rl_iterate`)."""
    Y, X = psi_ext.shape[1], psi_ext.shape[2]

    def sel(triple):
        n_ph = triple[0].shape[0]
        if n_ph == 1:
            return tuple(M[0] for M in triple)
        p = jnp.mod(step, n_ph)
        return tuple(jax.lax.dynamic_index_in_dim(M, p, 0, keepdims=False)
                     for M in triple)

    def conv_mat(x, triple, trim, rads):
        """Per-block lowrank conv. On real TPUs this routes through the
        same z-major Pallas kernels as the in-memory/sharded engines
        (copy-free banded z pass + rows y/x kernel, r5); off-TPU it
        keeps the numerics-equivalent XLA chain the parity tests
        exercise."""
        Tz, My, Mx = triple
        mid_t = Tz.dtype
        xp = x[trim: x.shape[0] - trim] if trim else x
        from spim_registration_tpu.ops.pallas.lowrank_conv import (
            fused_sl_apply,
            plan_fused_sl,
            plan_zpass_banded,
            zpass_apply_planned,
        )
        from spim_registration_tpu.utils.backend import is_tpu_backend

        n_out = Tz.shape[1]
        # pad the output-row axis to a multiple of 8 so arbitrary block
        # heights hit the kernel's z-block grid (zero band rows produce
        # zero rows, sliced off after)
        n8 = -(-n_out // 8) * 8
        plan = (plan_fused_sl(n8, xp.shape[1], xp.shape[2],
                              itemsize=mid_t.itemsize)
                if is_tpu_backend() else None)
        if plan is not None:
            hz = (Tz.shape[2] - n_out) // 2
            Tzp = (jnp.pad(Tz, ((0, 0), (0, n8 - n_out), (0, 0)))
                   if n8 > n_out else Tz)
            zp = plan_zpass_banded(n8, xp.shape[0], xp.shape[1],
                                   xp.shape[2], rad=hz, off=hz,
                                   itemsize=mid_t.itemsize)
            if zp is not None:
                a = zpass_apply_planned(Tzp, xp.astype(mid_t), zp)
            else:
                a = jnp.einsum("pyx,rnp->rnyx", xp.astype(mid_t), Tzp,
                               preferred_element_type=mid_t)
            tz_, vlim_ = plan
            out = fused_sl_apply(a, My, Mx, tz=tz_, vmem_limit=vlim_,
                                 rad_y=rads[1], rad_x=rads[2])
            return out[:n_out].astype(x.dtype)
        a = jnp.einsum("pyx,rnp->rnyx", xp.astype(mid_t), Tz,
                       preferred_element_type=mid_t)
        b = jnp.einsum("rzpx,rnp->rznx", a, My,
                       preferred_element_type=mid_t)
        c = jnp.einsum("rzyp,rnp->rzyn", b, Mx,
                       preferred_element_type=jnp.float32)
        return jnp.sum(c, axis=0).astype(x.dtype)

    def conv_os(x, kfft, rz, ry, rx, fshape):
        xp = mirror_pad(mirror_pad(x, ry, 1), rx, 2)
        pads = [(0, fshape[0] - xp.shape[0]),
                (0, fshape[1] - xp.shape[1]),
                (0, fshape[2] - xp.shape[2])]
        xp = jnp.pad(xp, pads)
        out = jnp.fft.irfftn(jnp.fft.rfftn(xp) * kfft, s=fshape)
        return out[rz:x.shape[0] - rz, ry:ry + Y, rx:rx + X]

    def _rads(entry):
        r = entry.get("rad")
        return r.value if r is not None else (None,) * 3

    if "mat" in e1:
        conv1 = conv_mat(psi_ext, sel(e1["mat"]), t1, _rads(e1))
    else:
        conv1 = conv_os(psi_ext, e1["fft"], h - r2z, ry1, rx1, fs1)
    q = jnp.clip(img_ext / jnp.maximum(conv1, 1e-12), 0.0, 1e4)
    q = _mirror_q_edges(q, z_lo, z_true)
    if "mat" in e2:  # delta form, matching the in-memory lowrank engine
        conv2m1 = conv_mat(q - 1.0, sel(e2["mat"]), t2, _rads(e2))
    else:
        conv2m1 = conv_os(q, e2["fft"], r2z, ry2, rx2, fs2) - 1.0
    psi = psi_ext[h:h + bz]
    psi = psi * (1.0 + osem * w * conv2m1)
    if use_lam:
        psi = psi / (1.0 + lam * psi)
    return jnp.maximum(psi, minv)


@dataclasses.dataclass
class BlockedDeconvolutionInputs:
    """Disk-resident inputs: per-view image/weight stores on the bbox
    grid (the streamed analog of `DeconvolutionViews`)."""

    image_stores: Sequence
    weight_stores: Sequence
    psfs: List[np.ndarray]
    osem_factor: float
    # optional exact CP factors per PSF (condition_psf/fixtures) — make
    # the lowrank backend's conv exact by construction (see
    # ops.separable.decompose_for_rl)
    psf_factors: Optional[Sequence] = None


class BlockedDeconvolutionRunner:
    """RL deconvolution for volumes that do not fit in device memory.

    psi lives in `psi_store` (disk); each (view, block) update streams
    through HBM. Matches `DeconvolutionRunner` seam-free AND edge-exact
    for both conv backends: "fft" (exact reference semantics) and
    "lowrank" (the fast folded-matmul path — z band matmuls over halos
    re-read from the ping-pong store; VERDICT r3 next #3), including the
    per-kernel exact-FFT fallback and bf16 dither phase schedule.
    """

    def __init__(self, inputs: BlockedDeconvolutionInputs, psi_store,
                 params: DeconvolutionParameters = DeconvolutionParameters(),
                 block_z: Optional[int] = None, scratch_store=None,
                 mesh=None, axis_name: str = "z"):
        if params.conv_backend not in ("fft", "lowrank"):
            raise ValueError("blocked deconvolution supports "
                             "conv_backend 'fft' or 'lowrank'; got "
                             + params.conv_backend)
        if params.scheme != "sequential":
            raise ValueError("blocked deconvolution is OSEM-sequential")
        self.inputs = inputs
        self.params = params
        self.psi_store = psi_store
        self.shape = tuple(psi_store.shape)
        Z, Y, X = self.shape

        k2s = compound_kernels(inputs.psfs, params.psf_type)
        self.r1 = [tuple(s // 2 for s in np.shape(p)) for p in inputs.psfs]
        self.r2 = [tuple(s // 2 for s in np.shape(k)) for k in k2s]
        # COMMON halo/crop radii: the stage-1 crop (hz - r2z) must cover
        # EVERY view's k1 z-radius, so hz = max(r1) + max(r2), not
        # max(r1 + r2) — the latter under-halos a view whose k1 is wide
        # but whose compound k2 is narrow
        self.r1z = max(a[0] for a in self.r1)
        self.r2z = max(b[0] for b in self.r2)
        self.hz = self.r1z + self.r2z

        if block_z is None:
            block_z = max(self.hz * 2, Z // 8)
            while Z % block_z:
                block_z += 1
        if Z % block_z:
            raise ValueError(f"block_z={block_z} must divide Z={Z}")
        self.bz = int(block_z)

        # per-view kernel FFTs at the two block-conv shapes (device-resident
        # for the whole run; complex64 never crosses to the host)
        self.fs1, self.fs2, self.k1f, self.k2f = [], [], [], []
        from spim_registration_tpu.ops.fftconv import prepare_kernel_fft

        for v in range(len(inputs.psfs)):
            r1, r2 = self.r1[v], self.r2[v]
            fs1 = fft_shape_for((self.bz + 2 * self.hz,
                                 Y + 2 * r1[1], X + 2 * r1[2]))
            fs2 = fft_shape_for((self.bz + 2 * self.r2z,
                                 Y + 2 * r2[1], X + 2 * r2[2]))
            self.fs1.append(fs1)
            self.fs2.append(fs2)
            self.k1f.append(prepare_kernel_fft(
                jnp.asarray(inputs.psfs[v], jnp.float32), fs1))
            self.k2f.append(prepare_kernel_fft(
                jnp.asarray(k2s[v], jnp.float32), fs2))

        self.backend = params.conv_backend
        if self.backend == "lowrank":
            n1 = self.bz + 2 * self.r2z  # stage-1 (conv1) output rows
            self.e1, errs1, rad1 = _lowrank_stage_entries(
                [np.asarray(p) for p in inputs.psfs], n1, (Y, X), params,
                factors=getattr(inputs, "psf_factors", None))
            self.e2, errs2, rad2 = _lowrank_stage_entries(
                k2s, self.bz, (Y, X), params)
            self.t1 = [self.r1z - r for r in rad1]
            self.t2 = [self.r2z - r for r in rad2]
            for v in range(len(inputs.psfs)):
                if self.e1[v] is None:  # missed tol: exact FFT fallback
                    self.e1[v] = {"fft": self.k1f[v]}
                if self.e2[v] is None:
                    self.e2[v] = {"fft": self.k2f[v]}

        self.osem = (params.osem_factor if params.osem_factor is not None
                     else inputs.osem_factor)
        self.lam = params.tikhonov_lambda
        self.avg = None  # set by init_psi / resume
        self.scratch_store = (scratch_store if scratch_store is not None
                              else self._make_scratch(psi_store))
        # MESH x OUT-OF-CORE (VERDICT r4 next #4): with a mesh, each
        # group of `mesh.size` consecutive z-blocks runs as ONE sharded
        # device program (blocks round-robined across devices, leading
        # block axis sharded). Grouping preserves the math exactly:
        # every block of a view-update reads the PRE-update psi (the
        # ping-pong contract), so blocks are independent within a
        # view-update — aggregate-mesh HBM bounds the streamed working
        # set instead of one chip's.
        self.mesh = mesh
        self.axis_name = axis_name

    @staticmethod
    def _make_scratch(psi_store):
        """A second store of the same kind for the view-update ping-pong."""
        from spim_registration_tpu.native_blocks import RawVolumeStore

        if isinstance(psi_store, ArrayStore):
            return ArrayStore(np.zeros(psi_store.shape, np.float32))
        if isinstance(psi_store, RawVolumeStore):
            return RawVolumeStore(psi_store.path + ".scratch",
                                  psi_store.shape, create=True)
        raise ValueError(
            "pass scratch_store= explicitly for custom store types")

    # ------------------------------------------------------------------
    def initialize_psi(self) -> float:
        """Two streaming passes: global average, then psi0 blocks."""
        Z, Y, X = self.shape
        s_wi = 0.0
        s_w = 0.0
        for z0 in range(0, Z, self.bz):
            lo, hi = (z0, 0, 0), (z0 + self.bz, Y, X)
            for img_s, w_s in zip(self.inputs.image_stores,
                                  self.inputs.weight_stores):
                img = img_s.read_block(lo, hi)
                w = w_s.read_block(lo, hi)
                s_wi += float((img * w).sum())
                s_w += float(w.sum())
        avg = s_wi / max(s_w, 1e-9)
        floor = self.params.min_value * avg
        init_const = avg if self.params.init == "average" else avg
        for z0 in range(0, Z, self.bz):
            lo, hi = (z0, 0, 0), (z0 + self.bz, Y, X)
            acc = np.zeros((self.bz, Y, X), np.float32)
            wsum = np.zeros((self.bz, Y, X), np.float32)
            for img_s, w_s in zip(self.inputs.image_stores,
                                  self.inputs.weight_stores):
                img = img_s.read_block(lo, hi)
                w = w_s.read_block(lo, hi)
                acc += img * w
                wsum += w
            if self.params.init == "average":
                psi0 = np.where(wsum > 1e-9,
                                acc / np.maximum(wsum, 1e-9), init_const)
            else:
                psi0 = np.full((self.bz, Y, X), init_const, np.float32)
            self.psi_store.write_block(lo, np.maximum(psi0, floor))
        self.avg = avg
        return avg

    # ------------------------------------------------------------------
    def run(self, num_iterations: Optional[int] = None,
            init_psi: bool = True, progress_fn=None):
        """Stream RL iterations; psi_store holds the result (and is the
        resume checkpoint — pass init_psi=False to continue a run)."""
        n = (num_iterations if num_iterations is not None
             else self.params.num_iterations)
        if init_psi or self.avg is None:
            if init_psi:
                self.initialize_psi()
            else:
                self.avg = self._recompute_avg()
        Z, Y, X = self.shape
        minv = jnp.float32(self.params.min_value * self.avg)
        osem = jnp.float32(self.osem)
        lam = jnp.float32(self.lam)
        use_lam = self.lam > 0

        src, dst = self.psi_store, self.scratch_store
        for it in range(n):
            for v in range(len(self.inputs.psfs)):
                if self.mesh is not None:
                    src, dst = self._view_update_meshed(
                        it, v, src, dst, osem, lam, minv, use_lam)
                    continue
                r1, r2 = self.r1[v], self.r2[v]
                # Double-buffered block pipeline: within one view-update
                # every block reads the PRE-update psi (src) and writes
                # dst, so block k+1's host reads + H2D upload can overlap
                # block k's device program + D2H write-back (JAX
                # dispatch is async; np.asarray is the sync point). On
                # PCIe hosts this hides most of the block IO behind
                # compute; at most 2 blocks are in flight so HBM stays
                # bounded.
                pending = []
                for z0 in range(0, Z, self.bz):
                    # halos read from SRC (the pre-update psi) — updates
                    # go to DST so no block sees its predecessor's update
                    psi_ext = _read_mirror_z(
                        src, z0 - self.hz, z0 + self.bz + self.hz)
                    img_ext = _read_mirror_z(
                        self.inputs.image_stores[v],
                        z0 - self.r2z, z0 + self.bz + self.r2z)
                    w = self.inputs.weight_stores[v].read_block(
                        (z0, 0, 0), (z0 + self.bz, Y, X))
                    z_lo = jnp.int32(z0 - self.r2z)  # global row of q[0]
                    z_true = jnp.int32(Z)
                    if self.backend == "lowrank":
                        out = _block_view_update_lr(
                            jnp.asarray(psi_ext), jnp.asarray(img_ext),
                            jnp.asarray(w), self.e1[v], self.e2[v],
                            jnp.int32(it + v), osem, lam, minv,
                            z_lo, z_true,
                            bz=self.bz, h=self.hz, r2z=self.r2z,
                            t1=self.t1[v], t2=self.t2[v],
                            fs1=self.fs1[v], fs2=self.fs2[v],
                            ry1=r1[1], rx1=r1[2], ry2=r2[1], rx2=r2[2],
                            use_lam=use_lam)
                    else:
                        out = _block_view_update(
                            jnp.asarray(psi_ext), jnp.asarray(img_ext),
                            jnp.asarray(w), self.k1f[v], self.k2f[v],
                            osem, lam, minv, z_lo, z_true,
                            bz=self.bz, h=self.hz,
                            r1z=self.hz - self.r2z, r2z=self.r2z,
                            fs1=self.fs1[v], fs2=self.fs2[v],
                            ry1=r1[1], rx1=r1[2], ry2=r2[1], rx2=r2[2],
                            use_lam=use_lam)
                    pending.append((z0, out))
                    if len(pending) > 1:
                        z0p, outp = pending.pop(0)
                        dst.write_block((z0p, 0, 0), np.asarray(outp))
                for z0p, outp in pending:
                    dst.write_block((z0p, 0, 0), np.asarray(outp))
                src, dst = dst, src
            if progress_fn is not None:
                progress_fn(it + 1)
        if src is not self.psi_store:  # odd number of view-updates
            for z0 in range(0, Z, self.bz):
                self.psi_store.write_block(
                    (z0, 0, 0),
                    src.read_block((z0, 0, 0), (z0 + self.bz, Y, X)))
        return self.psi_store

    def _view_update_meshed(self, it, v, src, dst, osem, lam, minv,
                            use_lam):
        """One view-update with z-blocks round-robined across the mesh:
        groups of `mesh.size` blocks run as one sharded device program
        (leading block axis sharded; blocks are independent within a
        view-update because all read the PRE-update psi). Returns the
        swapped (src, dst) pair. Seam-/edge-exact vs the single-device
        block loop (tested on the 8-virtual-device mesh, fft AND
        lowrank)."""
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        Z, Y, X = self.shape
        r1, r2 = self.r1[v], self.r2[v]
        nd = self.mesh.size
        sh = NamedSharding(self.mesh, P(self.axis_name))
        z0s = list(range(0, Z, self.bz))
        z_true = jnp.int32(Z)
        for g0 in range(0, len(z0s), nd):
            grp = z0s[g0:g0 + nd]
            grp_p = grp + [grp[-1]] * (nd - len(grp))  # pad; extras dropped
            psi_b = np.stack([_read_mirror_z(src, z0 - self.hz,
                                             z0 + self.bz + self.hz)
                              for z0 in grp_p])
            img_b = np.stack([_read_mirror_z(self.inputs.image_stores[v],
                                             z0 - self.r2z,
                                             z0 + self.bz + self.r2z)
                              for z0 in grp_p])
            w_b = np.stack([self.inputs.weight_stores[v].read_block(
                (z0, 0, 0), (z0 + self.bz, Y, X)) for z0 in grp_p])
            zlo_b = np.asarray([z0 - self.r2z for z0 in grp_p], np.int32)
            psi_b, img_b, w_b, zlo_b = (
                jax.device_put(a, sh)
                for a in (psi_b, img_b, w_b, zlo_b))
            if self.backend == "lowrank":
                out = jax.vmap(
                    lambda pe, ie, wb, zl: _block_view_update_lr(
                        pe, ie, wb, self.e1[v], self.e2[v],
                        jnp.int32(it + v), osem, lam, minv, zl, z_true,
                        bz=self.bz, h=self.hz, r2z=self.r2z,
                        t1=self.t1[v], t2=self.t2[v], fs1=self.fs1[v],
                        fs2=self.fs2[v], ry1=r1[1], rx1=r1[2],
                        ry2=r2[1], rx2=r2[2], use_lam=use_lam))(
                            psi_b, img_b, w_b, zlo_b)
            else:
                out = jax.vmap(
                    lambda pe, ie, wb, zl: _block_view_update(
                        pe, ie, wb, self.k1f[v], self.k2f[v], osem,
                        lam, minv, zl, z_true, bz=self.bz, h=self.hz,
                        r1z=self.hz - self.r2z, r2z=self.r2z,
                        fs1=self.fs1[v], fs2=self.fs2[v], ry1=r1[1],
                        rx1=r1[2], ry2=r2[1], rx2=r2[2],
                        use_lam=use_lam))(psi_b, img_b, w_b, zlo_b)
            host = np.asarray(out)
            for i, z0 in enumerate(grp):
                dst.write_block((z0, 0, 0), host[i])
        return dst, src

    def _recompute_avg(self) -> float:
        Z, Y, X = self.shape
        s_wi = s_w = 0.0
        for z0 in range(0, Z, self.bz):
            lo, hi = (z0, 0, 0), (z0 + self.bz, Y, X)
            for img_s, w_s in zip(self.inputs.image_stores,
                                  self.inputs.weight_stores):
                img = img_s.read_block(lo, hi)
                w = w_s.read_block(lo, hi)
                s_wi += float((img * w).sum())
                s_w += float(w.sum())
        return s_wi / max(s_w, 1e-9)
