"""Fused y+x passes of the lowrank (folded-matmul) convolution.

The XLA path (`ops.separable.conv_lowrank_folded`) runs three chained
stacked matmuls and materializes BOTH intermediates in HBM:

    a = Mz . vol   (write R*n^3)
    b = My . a     (read + write R*n^3)
    c = Mx . b     (read + write R*n^3)  -> sum_r c

At 256^3 the chain is HBM-bound (arithmetic intensity ~n/4 < the v5e
ridge), so the intermediates dominate. This kernel fuses the y and x
passes: the z pass stays one big XLA matmul (it reads `vol` once), laid
out as a[r, y, z, x]; the kernel then streams (z-block, y_out-block)
tiles of `a` through VMEM, applying My and Mx back-to-back per rank term
and accumulating the rank sum on-chip — b and c never touch HBM, and the
output is written exactly once. Traffic drops from ~6*R*n^3 to
~(1 + Y/yb)*R*n^3 elements (yb = Y at small shapes).

Numerics mirror the XLA path: bf16 (or f32) matrices, f32 matmul
accumulation, intermediate cast back to the matrix dtype between the
two fused matmuls, rank sum in f32. The dithered-quantization phase
axis is selected OUTSIDE (the engine passes already-selected (R, n, n)
matrices).

Kernel variants (`plan_fused_yx` picks block sizes; callers fall back
to the XLA chain when no plan fits VMEM):
- wide: both contractions as single large MXU matmuls via a lane-dim
  collapse — requires X % 128 == 0 (Mosaic's vector reshape rejects
  other collapses: "unsupported shape cast" at 192^3).
- rows: reshape-free static unroll of TZ 2D matmul pairs for
  lane-unaligned X; slower, still skips the HBM round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_yx_kernel_wide(a_ref, my_ref, mxt_ref, o_ref):
    """One (z-block, y_out-block, rank) grid step:
    o[YB, TZ, X'] += Mx-pass(My-pass(a))."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[0]                     # (Y, TZ, X) matrix dtype
    my = my_ref[0]                   # (YB, Y)
    mxt = mxt_ref[0]                 # (X, X_out)
    Y, TZ, X = a.shape
    b = jnp.dot(my, a.reshape(Y, TZ * X),
                preferred_element_type=jnp.float32)
    b = b.astype(a.dtype).reshape(my.shape[0] * TZ, X)
    c = jnp.dot(b, mxt, preferred_element_type=jnp.float32)
    o_ref[:] += c.reshape(my.shape[0], TZ, mxt.shape[1])


def _fused_yx_kernel_rows(a_ref, my_ref, mxt_ref, o_ref):
    """Reshape-free variant for lane-unaligned X: a static unroll of TZ
    2D matmul pairs."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    my = my_ref[0]                   # (YB, Y)
    mxt = mxt_ref[0]                 # (X, X_out)
    TZ = a_ref.shape[2]
    for t in range(TZ):
        a_t = a_ref[0, :, t, :]      # (Y, X) matrix dtype
        b_t = jnp.dot(my, a_t, preferred_element_type=jnp.float32)
        b_t = b_t.astype(a_t.dtype)
        c_t = jnp.dot(b_t, mxt, preferred_element_type=jnp.float32)
        o_ref[:, t, :] += c_t


# empirical scoped-vmem budget (v5e ~16 MB; the 256*16*256 full-Y wide
# config measures right at the edge): units are "bytes" of the resident
# blocks — a bf16 (2/elt) + b f32+bf16 + c f32 + out f32 (14/elt of the
# yb-sized tiles)
_VMEM_BUDGET = 17_000_000


def plan_fused_yx(Z: int, Y: int, X: int):
    """Pick (tz, yb) block sizes for the fused kernel, or None when no
    legal configuration fits scoped VMEM. Blocking Y_out (yb < Y)
    re-reads the full-Y `a` tile per y-block (traffic x Y/yb on the a
    read), which still beats the XLA chain's extra b/c round trips up
    to Y/yb ~ 4 (512^2 cross-sections: measured ~3x)."""
    for tz in (16, 8):
        if Z % tz:
            continue
        yb = Y
        while yb >= 8 and Y % yb == 0:
            cost = 2 * Y * tz * X + 14 * yb * tz * X
            if cost <= _VMEM_BUDGET and Y / yb <= 4:
                return tz, yb
            if (yb // 2) % 8:
                break
            yb //= 2
    return None


def fused_yx_fits_vmem(Y: int, X: int, tz: int = 16) -> bool:
    """Back-compat gate: True when SOME fused plan exists for a volume
    with 16-aligned Z (callers that already checked Z % 16)."""
    return plan_fused_yx(16, Y, X) is not None


@functools.partial(jax.jit, static_argnames=("tz", "yb", "interpret"))
def fused_yx_apply(a: jnp.ndarray, My: jnp.ndarray, Mx: jnp.ndarray,
                   tz: int = 16, yb: int | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Apply the fused y then x folded matmuls + rank sum to a
    z-pass output laid out as a[r, y, z, x]. Returns (Z, Y_out, X_out)
    f32. Requires Z % tz == 0 and Y_out % yb == 0. Shared by the
    single-device fused conv and the z-sharded engine (whose z pass is
    band matmuls over halos — the y/x passes are shard-local and
    identical)."""
    R, Y, Z, X = a.shape
    Yo = My.shape[1]
    if yb is None:
        yb = Yo
    mxt = jnp.swapaxes(Mx, 1, 2)
    kernel = (_fused_yx_kernel_wide if X % 128 == 0
              else _fused_yx_kernel_rows)
    # under shard_map (sharded engine) the out aval must carry the
    # varying-mesh-axes set; outside one this is the empty frozenset
    vma = getattr(jax.typeof(a), "vma", frozenset())
    out = pl.pallas_call(
        kernel,
        grid=(Z // tz, Yo // yb, R),
        in_specs=[
            pl.BlockSpec((1, Y, tz, X), lambda zb, ybi, r: (r, 0, zb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yb, Y), lambda zb, ybi, r: (r, ybi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, mxt.shape[2]), lambda zb, ybi, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((yb, tz, mxt.shape[2]),
                               lambda zb, ybi, r: (ybi, zb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Yo, Z, mxt.shape[2]),
                                       jnp.float32, vma=vma),
        interpret=interpret,
    )(a, My, mxt)
    return jnp.swapaxes(out, 0, 1)


def _zfused_kernel(band_ref, my_ref, mxt_ref, vol_hbm, o_ref, win_ref,
                   sem, *, Z, tz, tzw):
    """FULLY fused z+y+x conv for one (z-block, rank) grid step.

    The volume window (tz + 2*hz rows, clamped to the volume) is DMA'd
    from HBM ONCE per z-block (r == 0) and reused across all ranks —
    the a-array (R, n^3) of the 2-stage formulation never exists, and
    vol is read ~(tzw/tz)/R times less than `a` was. Chain:
      band (tz, tzw) @ win (tzw, Y*X)      [z pass, banded]
      -> swapaxes to (Y, tz, X)            [major-dim VMEM transpose]
      -> My (Yo, Y) @ (Y, tz*X)            [y pass]
      -> (Yo*tz, X) @ MxT (X, Xo)          [x pass]
      -> o (Yo, tz, Xo) += .               [rank accumulation]
    Requires X % 128 == 0 (lane-collapse reshapes, like the wide
    kernel)."""
    zb = pl.program_id(0)
    r = pl.program_id(1)
    s = jnp.clip(zb * tz - (tzw - tz) // 2, 0, Z - tzw)

    @pl.when(r == 0)
    def _():
        pltpu.make_async_copy(vol_hbm.at[pl.ds(s, tzw)], win_ref,
                              sem).start()
        pltpu.make_async_copy(vol_hbm.at[pl.ds(s, tzw)], win_ref,
                              sem).wait()
        o_ref[:] = jnp.zeros_like(o_ref)

    win = win_ref[:]                     # (tzw, Y, X) bf16-family
    band = band_ref[0, 0]                # (tz, tzw)
    my = my_ref[0]                       # (Yo, Y)
    mxt = mxt_ref[0]                     # (X, Xo)
    _, Y, X = win.shape
    a2 = jnp.dot(band, win.reshape(tzw, Y * X),
                 preferred_element_type=jnp.float32)
    a3 = jnp.swapaxes(a2.astype(win.dtype).reshape(tz, Y, X), 0, 1)
    b = jnp.dot(my, a3.reshape(Y, tz * X),
                preferred_element_type=jnp.float32)
    c = jnp.dot(b.astype(win.dtype).reshape(my.shape[0] * tz, X), mxt,
                preferred_element_type=jnp.float32)
    o_ref[:] += c.reshape(my.shape[0], tz, mxt.shape[1])


def plan_fused_zyx(Z: int, Y: int, X: int, hz: int):
    """Pick tz for the fully-fused kernel, or None when it cannot run
    (lane-unaligned X, or the window/compute tiles exceed VMEM)."""
    if X % 128 or Z < 2 * hz + 8:
        return None
    for tz in (16, 8):
        if Z % tz:
            continue
        tzw = tz + 2 * hz
        if tzw > Z:
            continue
        # scoped-vmem model calibrated against the compiler's report
        # (tz=16, hz=17, 256^2 cross-section -> 17.88M): the window
        # plus ~11 bytes/elt of the tz-sized compute/out tiles (Mosaic
        # reuses the chain buffers)
        cost = 2 * tzw * Y * X + 11 * tz * Y * X
        if cost <= 15_500_000:
            return tz
    return None


@functools.partial(jax.jit, static_argnames=("hz", "tz", "interpret"))
def conv_lowrank_folded_zfused(vol: jnp.ndarray, Mz: jnp.ndarray,
                               My: jnp.ndarray, Mx: jnp.ndarray,
                               hz: int, tz: int = 16,
                               interpret: bool = False) -> jnp.ndarray:
    """Fully z+y+x-fused twin of `conv_lowrank_folded`: per-z-block
    volume windows are DMA'd once and reused across ranks, so neither
    the a- nor b-intermediates ever touch HBM. `hz` is the kernel's z
    half-support (the folded Mz rows of a z-block only reference
    columns within the clamped window [zb*tz - hz, zb*tz + tz + hz) —
    mirror folds land inside it)."""
    Z, Y, X = vol.shape
    R = Mz.shape[0]
    Yo = My.shape[1]
    mid = My.dtype
    tzw = tz + 2 * hz
    ZB = Z // tz
    # per-block band slices of the folded z matrix (host-shaped, static)
    starts = np.clip(np.arange(ZB) * tz - hz, 0, Z - tzw)
    bands = jnp.stack([
        jax.lax.dynamic_slice(
            Mz, (0, zb * tz, int(starts[zb])), (R, tz, tzw))
        for zb in range(ZB)])                       # (ZB, R, tz, tzw)
    mxt = jnp.swapaxes(Mx, 1, 2)
    vm = vol.astype(mid)
    vma = getattr(jax.typeof(vol), "vma", frozenset())
    out = pl.pallas_call(
        functools.partial(_zfused_kernel, Z=Z, tz=tz, tzw=tzw),
        grid=(ZB, R),
        in_specs=[
            pl.BlockSpec((1, 1, tz, tzw), lambda zb, r: (zb, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Yo, Y), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, mxt.shape[2]), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # vol stays in HBM
        ],
        out_specs=pl.BlockSpec((Yo, tz, mxt.shape[2]),
                               lambda zb, r: (0, zb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Yo, Z, mxt.shape[2]),
                                       jnp.float32, vma=vma),
        scratch_shapes=[
            pltpu.VMEM((tzw, Y, X), mid),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(bands, My, mxt, vm)
    return jnp.swapaxes(out, 0, 1).astype(vol.dtype)


@jax.jit
def fused_yx_reference(a: jnp.ndarray, My: jnp.ndarray,
                       Mx: jnp.ndarray) -> jnp.ndarray:
    """Numerics-identical XLA emulation of `fused_yx_apply` (f32 matmul
    accumulation, intermediate cast back to the matrix dtype, rank sum
    in f32). Used off-TPU inside shard_map, where interpret-mode Pallas
    trips a JAX vma bug (dynamic_slice varying-axes mismatch); the true
    kernel is interpret-tested single-device in tests/test_separable.py."""
    b = jnp.einsum("ryzx,rny->rnzx", a.astype(jnp.float32),
                   My.astype(jnp.float32))
    b = b.astype(My.dtype)
    c = jnp.einsum("ryzx,rxn->ryzn", b.astype(jnp.float32),
                   jnp.swapaxes(Mx, 1, 2).astype(jnp.float32))
    out = jnp.sum(c, axis=0)            # (Y_out, Z, X_out) f32
    return jnp.swapaxes(out, 0, 1)


@functools.partial(jax.jit, static_argnames=("tz", "yb", "interpret"))
def conv_lowrank_folded_fused(vol: jnp.ndarray, Mz: jnp.ndarray,
                              My: jnp.ndarray, Mx: jnp.ndarray,
                              tz: int = 16, yb: int | None = None,
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in twin of `ops.separable.conv_lowrank_folded` with the y/x
    passes fused in Pallas. Requires Z % tz == 0 (the engine falls back
    to the XLA path otherwise).

    Large volumes chunk the rank axis like the XLA chain does (see
    `ops.separable`): the z-pass `a` array is (R, n^3) bf16 — 5.4 GB at
    512^3 rank 20, which OOMed a 16 GB chip — so above the same voxel
    threshold the z pass + fused y/x run per rank-chunk under a scan,
    capping `a` at chunk size."""
    Z, Y, X = vol.shape
    if Z % tz:
        raise ValueError(f"Z={Z} not divisible by z-block {tz}")
    mid = Mz.dtype
    vm = vol.astype(mid)
    R = Mz.shape[0]

    def zpass_fused(mz, my, mx):
        a = jnp.einsum("rnp,pyx->rynx", mz, vm,
                       preferred_element_type=mid)
        return fused_yx_apply(a, my, mx, tz=tz, yb=yb,
                              interpret=interpret)

    from spim_registration_tpu.ops.separable import (
        _RANK_CHUNK,
        _RANK_CHUNK_MIN_VOXELS,
    )

    if R > _RANK_CHUNK and Z * Y * X >= _RANK_CHUNK_MIN_VOXELS:
        pad = (-R) % _RANK_CHUNK
        if pad:  # zero rank terms contribute exactly zero
            Mz, My, Mx = (jnp.pad(M, ((0, pad), (0, 0), (0, 0)))
                          for M in (Mz, My, Mx))
        n_chunks = (R + pad) // _RANK_CHUNK
        stacks = tuple(M.reshape(n_chunks, _RANK_CHUNK, *M.shape[1:])
                       for M in (Mz, My, Mx))

        def step(acc, ms):
            return acc + zpass_fused(*ms), None

        out, _ = jax.lax.scan(
            step, jnp.zeros((Z, Y, X), jnp.float32), stacks)
        return out.astype(vol.dtype)

    return zpass_fused(Mz, My, Mx).astype(vol.dtype)
