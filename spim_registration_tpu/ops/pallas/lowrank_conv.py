"""Fused y+x passes of the lowrank (folded-matmul) convolution.

The XLA path (`ops.separable.conv_lowrank_folded`) runs three chained
stacked matmuls and materializes BOTH intermediates in HBM:

    a = Mz . vol   (write R*n^3)
    b = My . a     (read + write R*n^3)
    c = Mx . b     (read + write R*n^3)  -> sum_r c

At 256^3 the chain is HBM-bound (arithmetic intensity ~n/4 < the v5e
ridge), so the intermediates dominate. This kernel fuses the y and x
passes: the z pass stays one big XLA matmul (it reads `vol` once), laid
out as a[r, y, z, x]; the kernel then streams z-blocks of `a` through
VMEM, applying My and Mx back-to-back per rank term and accumulating
the rank sum on-chip — b and c never touch HBM, and the output is
written exactly once. Traffic drops from ~6*R*n^3 to ~2*R*n^3 elements.

Numerics mirror the XLA path: bf16 (or f32) matrices, f32 matmul
accumulation, intermediate cast back to the matrix dtype between the
two fused matmuls, rank sum in f32. The dithered-quantization phase
axis is selected OUTSIDE (the engine passes already-selected (R, n, n)
matrices).

Layout note: blocks are (Y, TZ, X) so both fused contractions are
single large MXU matmuls — (Y_out, Y) @ (Y, TZ*X) then
(Y_out*TZ, X) @ (X, X_out) — instead of TZ small per-row products; the
final (Y, Z, X) -> (Z, Y, X) transpose is one fused XLA pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_yx_kernel_wide(a_ref, my_ref, mxt_ref, o_ref):
    """One (z-block, rank) grid step: o[Y, TZ, X] += Mx-pass(My-pass(a)).

    The fast form: both contractions are single large MXU matmuls via a
    (Y, TZ, X) -> (Y, TZ*X) collapse. Mosaic's vector reshape supports
    collapsing into the lane dim only when X is 128-aligned — callers
    must route other shapes to the row kernel below."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[0]                     # (Y, TZ, X) matrix dtype
    my = my_ref[0]                   # (Y_out, Y)
    mxt = mxt_ref[0]                 # (X, X_out)
    Y, TZ, X = a.shape
    b = jnp.dot(my, a.reshape(Y, TZ * X),
                preferred_element_type=jnp.float32)
    b = b.astype(a.dtype).reshape(my.shape[0] * TZ, X)
    c = jnp.dot(b, mxt, preferred_element_type=jnp.float32)
    o_ref[:] += c.reshape(my.shape[0], TZ, mxt.shape[1])


def _fused_yx_kernel_rows(a_ref, my_ref, mxt_ref, o_ref):
    """Reshape-free variant for lane-unaligned X (e.g. 192^3): a static
    unroll of TZ 2D matmul pairs. ~3x slower than the wide kernel's two
    big matmuls but compiles for any 8-padded extent, and still skips
    the HBM round-trips of the XLA chain."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    my = my_ref[0]                   # (Y_out, Y)
    mxt = mxt_ref[0]                 # (X, X_out)
    TZ = a_ref.shape[2]
    for t in range(TZ):
        a_t = a_ref[0, :, t, :]      # (Y, X) matrix dtype
        b_t = jnp.dot(my, a_t, preferred_element_type=jnp.float32)
        b_t = b_t.astype(a_t.dtype)
        c_t = jnp.dot(b_t, mxt, preferred_element_type=jnp.float32)
        o_ref[:, t, :] += c_t


def fused_yx_fits_vmem(Y: int, X: int, tz: int = 16) -> bool:
    """Static VMEM-footprint gate for the fused kernel: the resident
    (Y, tz, X) a/b/c/out blocks fit the ~16 MB scoped-vmem budget up to
    Y*tz*X = 256*16*256 (measured compile boundary on v5e; 512^2
    cross-sections OOM at tz=8 and tz<8 violates the sublane minimum).
    Callers fall back to the XLA chain beyond it."""
    return Y * tz * X <= 256 * 16 * 256


@functools.partial(jax.jit, static_argnames=("tz", "interpret"))
def fused_yx_apply(a: jnp.ndarray, My: jnp.ndarray, Mx: jnp.ndarray,
                   tz: int = 16, interpret: bool = False) -> jnp.ndarray:
    """Apply the fused y then x folded matmuls + rank sum to a
    z-pass output laid out as a[r, y, z, x]. Returns (Z, Y_out, X_out)
    f32. Requires Z % tz == 0. Shared by the single-device fused conv
    and the z-sharded engine (whose z pass is band matmuls over halos —
    the y/x passes are shard-local and identical)."""
    R, Y, Z, X = a.shape
    mxt = jnp.swapaxes(Mx, 1, 2)
    kernel = (_fused_yx_kernel_wide if X % 128 == 0
              else _fused_yx_kernel_rows)
    # under shard_map (sharded engine) the out aval must carry the
    # varying-mesh-axes set; outside one this is the empty frozenset
    vma = getattr(jax.typeof(a), "vma", frozenset())
    out = pl.pallas_call(
        kernel,
        grid=(Z // tz, R),
        in_specs=[
            pl.BlockSpec((1, Y, tz, X), lambda zb, r: (r, 0, zb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, My.shape[1], Y), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, mxt.shape[2]), lambda zb, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((My.shape[1], tz, mxt.shape[2]),
                               lambda zb, r: (0, zb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((My.shape[1], Z, mxt.shape[2]),
                                       jnp.float32, vma=vma),
        interpret=interpret,
    )(a, My, mxt)
    return jnp.swapaxes(out, 0, 1)


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


@functools.partial(jax.jit, static_argnames=("tz", "interpret"))
def conv_lowrank_folded_fused(vol: jnp.ndarray, Mz: jnp.ndarray,
                              My: jnp.ndarray, Mx: jnp.ndarray,
                              tz: int = 16,
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in twin of `ops.separable.conv_lowrank_folded` with the y/x
    passes fused in Pallas. Requires Z % tz == 0 (the engine falls back
    to the XLA path otherwise)."""
    Z, Y, X = vol.shape
    if Z % tz:
        raise ValueError(f"Z={Z} not divisible by z-block {tz}")
    mid = Mz.dtype
    # z pass (XLA): a[r, y, z, x] = sum_p Mz[r, z, p] vol[p, y, x]
    a = jnp.einsum("rnp,pyx->rynx", Mz, vol.astype(mid),
                   preferred_element_type=mid)
    out = fused_yx_apply(a, My, Mx, tz=tz, interpret=interpret)
    return out.astype(vol.dtype)
