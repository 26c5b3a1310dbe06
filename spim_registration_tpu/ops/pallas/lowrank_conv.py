"""Fused sublane(y)+lane(x) passes of the lowrank (folded-matmul) conv.

The XLA path (`ops.separable.conv_lowrank_folded`) runs three chained
stacked matmuls and materializes BOTH intermediates in HBM:

    a = Mz . vol   (write R*n^3)
    b = My . a     (read + write R*n^3)
    c = Mx . b     (read + write R*n^3)  -> sum_r c

At 256^3 the chain is HBM-bound (arithmetic intensity ~n/4 < the v5e
ridge), so the intermediates dominate. This kernel fuses the y and x
passes: the z pass stays one big XLA matmul (it reads `vol` once); the
kernel streams (rank, z-block) tiles of `a` through VMEM, applying My
and Mx back-to-back per z-row and accumulating the rank sum on-chip —
b and c never touch HBM, and the output is written exactly once.

Layout (round-5 redesign, ZERO transposes end to end): `a` stays in the
NATURAL z-pass matmul output layout (R, Z, Y, X) — the r4 design wanted
(R, Y, Z, X) tiles for one big lane-collapsed y matmul, which forced a
transpose epilogue onto the z pass that measured 1.1 ms/conv at 256^3
(57% of the z pass!), plus an output swapaxes. Instead each z-row slab
a[r, z] is a CONTIGUOUS (Y, X) matrix, so the y pass is a per-row
(Yo, Y) @ (Y, X) dot and the x pass (Yo, X) @ (X, Xo) — both natural,
and the output lands directly in (Z, Yo, Xo). Measured per-dot overhead
of the tz-row unroll is nil (same wall as one collapsed matmul), the
kernel needs NO X % 128 alignment (the r4 wide/rows variant split is
gone), and the end-to-end conv dropped ~30% (PERF.md round 5).

Numerics mirror the XLA path: bf16 (or f32) matrices, f32 matmul
accumulation, intermediate cast back to the matrix dtype between the
two fused matmuls, rank sum in f32 (bit-identical to the r4 kernel,
tested). The dithered-quantization phase axis is selected OUTSIDE (the
engine passes already-selected (R, n, n) matrices).

VMEM: v5e's scoped-vmem DEFAULT limit is 16 MB but the hardware takes
far more (512^2 cross-section tiles measured working at a 64 MB limit,
~37 MB resident) — `plan_fused_sl` sizes the working set and raises
`vmem_limit_bytes` when needed, which removes the r4 "Pallas off at
512^2 cross-sections" capacity gate (VERDICT r4 weak #2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# raised scoped-VMEM ceiling used when a plan exceeds the 16 MB default;
# 512^2 cross-sections measured working on v5e at this limit
_VMEM_RAISED = 64 * 1024 * 1024
# conservative margin under the 16 MB default scoped limit: the model
# underestimates Mosaic's chain buffers by up to ~2 MB (an all-f32
# 256^3 plan measured 16.5 M against a 14.4 M model) — marginal plans
# take the raised limit instead
_VMEM_DEFAULT = 13_500_000
# cap on the z-pass intermediate `a` (R, Z, Y, X); above it the conv
# runs in z-slabs (see conv_lowrank_folded_fused)
_A_SLAB_BYTES = 1 << 30


def _sl_rows_kernel(a_ref, my_ref, mxt_ref, o_ref, *, yplan=None,
                    xplan=None):
    """One (z-block, rank) grid step: per contiguous z-row slab a[t]
    (Y, X), o[t] += (My @ a[t]) @ MxT — rank-accumulated in VMEM.

    With `yplan`/`xplan` (static band blocks from `band_blocks`) the
    y/x contractions run per band window instead of dense — the folded
    matrices are band matrices, so at large axes this is a 3-4x flop
    cut (measured -39% at 512^2 cross-sections; at 256 the sub-dot
    overhead eats the saving, so the plan gates on axis size)."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[0]                     # (TZ, Y, X) matrix dtype, z-major
    my = my_ref[0]                   # (Yo, Y)
    mxt = mxt_ref[0]                 # (X, Xo)
    TZ = a.shape[0]
    for t in range(TZ):
        at = a[t]
        if yplan is None:
            bt = jnp.dot(my, at, preferred_element_type=jnp.float32)
        else:
            blocks, W = yplan
            bt = jnp.concatenate([
                jnp.dot(my[s:s + ln, ws:ws + W], at[ws:ws + W],
                        preferred_element_type=jnp.float32)
                for (s, ln, ws) in blocks], axis=0)
        btc = bt.astype(at.dtype)
        if xplan is None:
            o_ref[t] += jnp.dot(btc, mxt,
                                preferred_element_type=jnp.float32)
        else:
            blocks, W = xplan
            for (s, ln, ws) in blocks:
                o_ref[t, :, s:s + ln] += jnp.dot(
                    btc[:, ws:ws + W], mxt[ws:ws + W, s:s + ln],
                    preferred_element_type=jnp.float32)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def plan_fused_sl(Z: int, Y: int, X: int, itemsize: int = 2):
    """Pick (tz, vmem_limit_bytes) for the fused kernel, or None when no
    legal configuration fits the raised VMEM ceiling. The model counts
    the double-buffered a tile, the resident f32 out tile, the b/c
    intermediates and the matrix tiles, all lane-padded."""
    Xp = _lane_pad(X)
    mats = 2 * itemsize * (Y * Y + X * Xp)
    for tz in (16, 8, 4):
        if Z % tz:
            continue
        cost = (2 * itemsize * tz * Y * Xp      # a tile, double-buffered
                + 4 * tz * Y * Xp               # out tile (f32, resident)
                + (4 + itemsize + 4) * Y * Xp   # b f32 + b cast + c f32
                + mats)
        if cost <= _VMEM_DEFAULT:
            return tz, None
        if cost <= _VMEM_RAISED - 4 * 1024 * 1024:
            return tz, _VMEM_RAISED
    return None


# in-kernel y/x banding pays only when the flop cut beats the sub-dot
# overhead: measured LOSS at 256 (3.14 -> 3.44 ms standalone), -39%
# WIN at 512^2 cross-sections — gate on axis size
_BAND_YX_MIN = 384


@functools.partial(jax.jit,
                   static_argnames=("tz", "vmem_limit", "interpret",
                                    "rad_y", "rad_x"))
def fused_sl_apply(a: jnp.ndarray, My: jnp.ndarray, Mx: jnp.ndarray,
                   tz: int = 16, vmem_limit: int | None = None,
                   interpret: bool = False,
                   rad_y: int | None = None,
                   rad_x: int | None = None) -> jnp.ndarray:
    """Apply the fused y then x folded matmuls + rank sum to a z-pass
    output in its NATURAL layout a[r, z, y, x]. Returns (Z, Y_out, X_out)
    f32. Requires Z % tz == 0. Shared by the single-device fused conv
    and the z-sharded engine (whose z pass is band matmuls over halos —
    the y/x passes are shard-local and identical). `rad_y`/`rad_x`:
    band half-supports of the folded My/Mx — enables in-kernel banding
    on large axes (see `_sl_rows_kernel`)."""
    R, Z, Y, X = a.shape
    Yo = My.shape[1]
    mxt = jnp.swapaxes(Mx, 1, 2)
    yplan = (band_blocks(Yo, Y, rad_y)
             if rad_y is not None and Y >= _BAND_YX_MIN else None)
    xplan = (band_blocks(mxt.shape[2], X, rad_x)
             if rad_x is not None and X >= _BAND_YX_MIN else None)
    # under shard_map (sharded engine) the out aval must carry the
    # varying-mesh-axes set; outside one this is the empty frozenset
    vma = getattr(jax.typeof(a), "vma", frozenset())
    params = {}
    if vmem_limit is not None and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit))
    return pl.pallas_call(
        functools.partial(_sl_rows_kernel, yplan=yplan, xplan=xplan),
        grid=(Z // tz, R),
        in_specs=[
            pl.BlockSpec((1, tz, Y, X), lambda zb, r: (r, zb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Yo, Y), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, mxt.shape[2]), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tz, Yo, mxt.shape[2]),
                               lambda zb, r: (zb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, Yo, mxt.shape[2]),
                                       jnp.float32, vma=vma),
        interpret=interpret,
        **params,
    )(a, My, mxt)


def _zpass_kernel(mz_ref, vm_ref, o_ref):
    """One (y-block, rank, z-block) grid step of the stacked z-pass
    matmul: o[r, nb, yb] = Mz[r, nb] @ vm[:, yb] — the volume tile is
    lane-collapsed to (P, ybs*X), one natural MXU matmul."""
    mz = mz_ref[0]                   # (tn, P)
    vm = vm_ref[:]                   # (P, ybs, X)
    P, ybs, X = vm.shape
    o = jnp.dot(mz, vm.reshape(P, ybs * X),
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype).reshape(mz.shape[0], ybs, X)


def _zpass_banded_kernel(mz_ref, vm_ref, o_ref, *, blocks, W):
    """Banded variant of `_zpass_kernel`: the folded conv matrices are
    BAND matrices (bandwidth = kernel taps; mirror folds stay within the
    half-support), so each output-row block contracts only its W-wide
    K window — one MXU K-tile instead of P/128 (half the executed MACs
    at P=256, 4x fewer at P=512). All slices are static."""
    mz = mz_ref[0]                   # (N, P)
    v = vm_ref[:]                    # (P, ybs, X)
    P, yb, X = v.shape
    v2 = v.reshape(P, yb * X)
    for (s, ln, ws) in blocks:
        o = jnp.dot(mz[s:s + ln, ws:ws + W], v2[ws:ws + W],
                    preferred_element_type=jnp.float32)
        o_ref[0, s:s + ln] = o.astype(o_ref.dtype).reshape(ln, yb, X)


def band_blocks(N: int, P: int, rad: int, off: int = 0,
                min_block: int = 8):
    """Static (out_start, out_len, win_start) blocks + window width for a
    band matrix with half-support `rad` whose band center for output row
    i is column i + off (off = (P - N) // 2 for halo band matrices).
    None when the window would not beat the dense contraction."""
    W = 128
    while W - 2 * rad < min_block:
        W += 128
    if W >= P:
        return None
    bs = (W - 2 * rad) & ~7
    blocks = []
    s = 0
    while s < N:
        ln = min(bs, N - s)
        ws = min(max(s + off - rad, 0), P - W)
        blocks.append((s, ln, ws))
        s += ln
    return tuple(blocks), W


def plan_zpass(N: int, P: int, Y: int, X: int, itemsize: int = 2):
    """Pick (tn, ybs, vmem_limit) for the Pallas z pass, or None
    (callers fall back to the XLA einsum). Requires X % 128 == 0 (lane
    collapse) — the perf shapes are lane-aligned; unaligned shapes (the
    192^3 accuracy gate) keep the XLA path, where the layout copy costs
    only correctness-irrelevant time. Bigger tn amortizes per-step
    overhead (tn=256 measured 14% faster than tn=128 at 256^3)."""
    if X % 128:
        return None
    for tn in (256, 128, 64, 32, 16, 8):
        if N % tn:
            continue
        for ybs in (64, 32, 16, 8):
            if Y % ybs:
                continue
            cost = (2 * itemsize * P * ybs * X     # vm tile, double-buffered
                    + 2 * itemsize * tn * ybs * X  # out tile
                    + 4 * tn * ybs * X             # f32 pre-cast result
                    + 2 * itemsize * tn * P)
            if cost <= _VMEM_RAISED - 8 * 1024 * 1024:
                vlim = None if cost <= _VMEM_DEFAULT else _VMEM_RAISED
                return ("dense", tn, ybs, vlim)
    return None


def plan_zpass_banded(N: int, P: int, Y: int, X: int, rad: int,
                      off: int = 0, itemsize: int = 2):
    """Banded z-pass plan ("banded", blocks, W, ybs, vlim) when the band
    window beats the dense contraction AND the full-N working set fits
    VMEM; falls back to `plan_zpass`. `rad` is the kernel's z
    half-support; `off` the band-center offset ((P - N) // 2 for the
    sharded engine's halo band matrices)."""
    if X % 128:
        return None
    bb = band_blocks(N, P, rad, off)
    if bb is not None:
        blocks, W = bb
        bs = blocks[0][1]
        for ybs in (64, 32, 16, 8):
            if Y % ybs:
                continue
            cost = (2 * itemsize * P * ybs * X    # vm tile, double-buffered
                    + 2 * itemsize * N * ybs * X  # out tile (full N)
                    + 4 * bs * ybs * X            # f32 per-block result
                    + 2 * itemsize * N * P)       # matrix tile
            if cost <= _VMEM_RAISED - 8 * 1024 * 1024:
                vlim = None if cost <= _VMEM_DEFAULT else _VMEM_RAISED
                return ("banded", blocks, W, ybs, vlim)
    return plan_zpass(N, P, Y, X, itemsize=itemsize)


@functools.partial(jax.jit, static_argnames=("plan", "interpret"))
def zpass_apply_planned(Mz: jnp.ndarray, vm: jnp.ndarray, plan,
                        interpret: bool = False) -> jnp.ndarray:
    """Dispatch a `plan_zpass`/`plan_zpass_banded` plan."""
    if plan[0] == "banded":
        _, blocks, W, ybs, vlim = plan
        return _zpass_call(
            functools.partial(_zpass_banded_kernel, blocks=blocks, W=W),
            Mz, vm, Mz.shape[1], ybs, vlim, interpret=interpret)
    _, tn, ybs, vlim = plan
    return _zpass_call(_zpass_kernel, Mz, vm, tn, ybs, vlim,
                       interpret=interpret)


def _zpass_call(kernel, Mz, vm, tn, ybs, vmem_limit, interpret=False):
    """Stacked z-pass matmul a[r, n, y, x] = sum_p Mz[r, n, p] vm[p, y, x]
    as a Pallas kernel. Numerically identical to the XLA einsum (one f32
    MXU accumulation, rounded once to the matrix dtype) — it exists
    because XLA's layout assignment gives the einsum result the
    {3,1,2,0} (y-major) layout and then inserts a FULL LAYOUT COPY
    (1.7 ms/conv at 256^3, 34% of the engine run — xprof, r5) to
    satisfy the fused kernel's row-major operand constraint; barriers
    and 2D-matmul rewrites do not dissuade it. Two custom calls with
    pinned layouts leave `a` row-major end to end."""
    R, N, P = Mz.shape
    _, Y, X = vm.shape
    vma = getattr(jax.typeof(vm), "vma", frozenset())
    params = {}
    if vmem_limit is not None and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit))
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(Y // ybs, R, N // tn),
        in_specs=[
            pl.BlockSpec((1, tn, P), lambda yb, r, nb: (r, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, ybs, X), lambda yb, r, nb: (0, yb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, ybs, X),
                               lambda yb, r, nb: (r, nb, yb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N, Y, X), vm.dtype, vma=vma),
        **params,
    )(Mz, vm)


@functools.partial(jax.jit, static_argnames=("tn", "ybs", "vmem_limit"))
def zpass_apply(Mz: jnp.ndarray, vm: jnp.ndarray, tn: int,
                ybs: int, vmem_limit: int | None = None) -> jnp.ndarray:
    """Dense-contraction z pass (see `_zpass_call`)."""
    return _zpass_call(_zpass_kernel, Mz, vm, tn, ybs, vmem_limit)


@jax.jit
def fused_sl_reference(a: jnp.ndarray, My: jnp.ndarray,
                       Mx: jnp.ndarray) -> jnp.ndarray:
    """Numerics-identical XLA emulation of `fused_sl_apply` (f32 matmul
    accumulation, intermediate cast back to the matrix dtype, rank sum
    in f32). Used off-TPU inside shard_map, where interpret-mode Pallas
    trips a JAX vma bug (dynamic_slice varying-axes mismatch); the true
    kernel is interpret-tested single-device in tests/test_separable.py."""
    b = jnp.einsum("rzyx,rny->rznx", a.astype(jnp.float32),
                   My.astype(jnp.float32))
    b = b.astype(My.dtype)
    c = jnp.einsum("rzyx,rxn->rzyn", b.astype(jnp.float32),
                   jnp.swapaxes(Mx, 1, 2).astype(jnp.float32))
    return jnp.sum(c, axis=0)            # (Z, Y_out, X_out) f32


@functools.partial(jax.jit, static_argnames=("interpret", "rad_z",
                                             "rad_y", "rad_x"))
def conv_lowrank_folded_fused(vol: jnp.ndarray, Mz: jnp.ndarray,
                              My: jnp.ndarray, Mx: jnp.ndarray,
                              interpret: bool = False,
                              rad_z: int | None = None,
                              rad_y: int | None = None,
                              rad_x: int | None = None) -> jnp.ndarray:
    """Drop-in twin of `ops.separable.conv_lowrank_folded` with the y/x
    passes fused in Pallas, all in z-major layout (no transposes; see
    module docstring). Raises when `plan_fused_sl` has no configuration
    (the engine gates on the same plan and falls back to the XLA path).

    Large volumes run the conv in Z-SLABS instead of the XLA chain's
    rank chunks: the z-pass `a` array is (R, n^3) bf16 — 5.4 GB at
    512^3 rank 20, which OOMed a 16 GB chip — so when `a` would exceed
    `_A_SLAB_BYTES` the z pass + fused y/x run per output z-slab at
    FULL rank (the z-pass matrices are sliced to the slab's rows; the
    banded plan's `off` tracks the slab's band-center shift). Unlike
    rank chunking this has NO accumulator round trips (each output
    region is written exactly once — the rank-chunk scan's per-chunk
    f32 (Z,Y,X) accumulator read+write cost ~1.3 ms/chunk/conv at
    512^3), and the per-kernel input reads are identical."""
    Z, Y, X = vol.shape
    plan = plan_fused_sl(Z, Y, X, itemsize=Mz.dtype.itemsize)
    if plan is None:
        raise ValueError(f"no fused plan for shape {vol.shape}")
    tz, vlim = plan
    mid = Mz.dtype
    vm = vol.astype(mid)
    R = Mz.shape[0]

    def zpass_fused(mz, my, mx, off):
        if interpret:
            zp = None
        elif rad_z is not None:  # band half-support known: banded plan
            zp = plan_zpass_banded(mz.shape[1], mz.shape[2], Y, X,
                                   rad_z, off=off, itemsize=mid.itemsize)
        else:
            zp = plan_zpass(mz.shape[1], mz.shape[2], Y, X,
                            itemsize=mid.itemsize)
        if zp is not None:
            a = zpass_apply_planned(mz, vm, zp)
        else:
            a = jnp.einsum("rnp,pyx->rnyx", mz, vm,
                           preferred_element_type=mid)
        return fused_sl_apply(a, my, mx, tz=tz, vmem_limit=vlim,
                              interpret=interpret, rad_y=rad_y,
                              rad_x=rad_x)

    asize = R * Z * Y * X * mid.itemsize
    if asize > _A_SLAB_BYTES:
        sl = max(tz, _A_SLAB_BYTES // (R * Y * X * mid.itemsize)
                 // tz * tz)
        pieces = []
        for s in range(0, Z, sl):
            ln = min(sl, Z - s)          # Z % tz == 0 -> ln % tz == 0
            pieces.append(zpass_fused(Mz[:, s:s + ln, :], My, Mx, s))
        return jnp.concatenate(pieces, axis=0).astype(vol.dtype)

    return zpass_fused(Mz, My, Mx, 0).astype(vol.dtype)


# ----------------------------------------------------------------------
# EXPERIMENTAL fully z+y+x-fused variant (r4): correct but measured 34%
# slower than the 2-stage path at 256^3 — kept with its analysis in
# PERF.md. Uses the r4 (R, Y, Z, X) a-layout internally.
# ----------------------------------------------------------------------

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
    Requires X % 128 == 0 (lane-collapse reshapes)."""
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
