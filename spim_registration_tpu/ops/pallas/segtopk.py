"""Per-segment top-R extraction of a sparse score field, one HBM pass.

Reference parity: feeds the peak selection of ImgLib1-style DoG extrema
(SURVEY.md section 2.3) — see `ops.extrema._segmented_compact_topk` for
the selection contract.

The XLA extraction loop reads the full score field once per round
(argmax -> take -> scatter-by-index x `rounds`), ~3.7 ms of the 8.7 ms
detection program at 256^3 (measured r3, jax.profiler). This kernel
streams each (BS, seg) tile block through VMEM once and runs all
`rounds` extraction steps on-chip (VPU max + first-index argmin +
mask-by-index), so HBM traffic drops to a single read of the field plus
tiny (S, rounds) outputs. Per-segment candidate counts come out of the
same pass (the overflow guard's input), saving the separate count pass.

Tie behavior matches `jnp.argmax`: the FIRST maximal index per round is
extracted, and masking is by index, so exact duplicates are handled
identically to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_topk_kernel(s_ref, vals_ref, idx_ref, cnt_ref, *, rounds, seg):
    tiles = s_ref[:]                                   # (BS, seg) f32
    BS = tiles.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BS, seg), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0)[:, 0]
    base = (pl.program_id(0) * BS + row) * seg
    cnt_ref[:] = jnp.sum((tiles > -jnp.inf).astype(jnp.int32), axis=1,
                         keepdims=True)
    for r in range(rounds):
        m = jnp.max(tiles, axis=1)
        hit = tiles == m[:, None]
        am = jnp.min(jnp.where(hit, iota, seg), axis=1)
        am = jnp.minimum(am, seg - 1)                  # all--inf row -> 0
        vals_ref[:, r] = m
        idx_ref[:, r] = base + am
        tiles = jnp.where(iota == am[:, None], -jnp.inf, tiles)


@functools.partial(jax.jit, static_argnames=("seg", "rounds", "block",
                                             "interpret"))
def segment_topk(padded: jnp.ndarray, seg: int = 512, rounds: int = 4,
                 block: int = 256, interpret: bool = False):
    """Extract the top-`rounds` (value, flat index) per `seg`-element
    segment of `padded` (length S*seg, non-candidates -inf), plus the
    per-segment candidate count. Returns (vals (S*rounds,),
    idx (S*rounds,) int32, counts (S,) int32)."""
    n = padded.shape[0]
    S = n // seg
    assert S * seg == n and S % block == 0, (n, seg, block)
    tiles = padded.reshape(S, seg)
    vma = getattr(jax.typeof(padded), "vma", frozenset())

    vals, idx, cnt = pl.pallas_call(
        functools.partial(_seg_topk_kernel, rounds=rounds, seg=seg),
        grid=(S // block,),
        in_specs=[pl.BlockSpec((block, seg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block, rounds), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, rounds), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, rounds), padded.dtype, vma=vma),
            jax.ShapeDtypeStruct((S, rounds), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((S, 1), jnp.int32, vma=vma),
        ],
        interpret=interpret,
    )(tiles)
    return vals.reshape(-1), idx.reshape(-1), cnt[:, 0]
