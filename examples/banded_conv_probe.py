"""Probe: block-banded folded-matmul conv vs the r4 dense formulation.

The folded conv matrices (ops/separable.folded_conv_matrices) are BAND
matrices — bandwidth = kernel taps (19 for the bench PSFs and their
compound kernels) — but every r4 pass multiplies them DENSE: each
(n, n) contraction executes n/128 MXU K-tiles where ceil(W/128) = 1
would do (W = band window). At n=256 that is 2x redundant MXU work on
the z and y passes and ~1.33x on the x pass; at n=512 it is 4x.

Variants measured here (256^3, rank-20 taps-19 matrices, the bench
kernel class):
  dense     — r4 path: XLA z pass + Pallas fused y/x (dense matmuls)
  banded-z  — z pass as block-banded stacked matmuls (XLA gather of
              128-row windows), dense y/x kernel
  banded-yx — dense z pass, banded y/x inside the Pallas kernel
              (static slices of the VMEM-resident matrices/tiles)
  banded    — both

Each is checked against the dense XLA chain (nrmse; banding only skips
structural zeros, so differences are MXU tile-order rounding).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_root))

from spim_registration_tpu.ops.pallas.lowrank_conv import (  # noqa: E402
    fused_yx_apply,
)
from spim_registration_tpu.ops.separable import (  # noqa: E402
    folded_conv_matrices,
)
from spim_registration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def _fence(x):
    return float(jnp.sum(x))


# ---------------------------------------------------------------- banded plan

def banded_plan(n: int, rad: int, min_block: int = 8):
    """Partition n output rows into blocks whose K-windows are one (or
    few) 128-lane MXU tiles. Returns (blocks, W): blocks is a list of
    (out_start, out_len, win_start); None when banding cannot beat the
    dense contraction (window >= n)."""
    W = 128
    while W - 2 * rad < min_block:
        W += 128
    if W >= n:
        return None
    bs = (W - 2 * rad) & ~7          # out rows per block, sublane-aligned
    blocks = []
    s = 0
    while s < n:
        ln = min(bs, n - s)
        ws = min(max(s - rad, 0), n - W)
        blocks.append((s, ln, ws))
        s += ln
    return blocks, W


# ------------------------------------------------------------- banded z pass

def zpass_dense(vm, mz):
    return jnp.einsum("rnp,pyx->rynx", mz, vm,
                      preferred_element_type=vm.dtype)


def zpass_banded(vm, mz, rad):
    Z, Y, X = vm.shape
    plan = banded_plan(Z, rad)
    if plan is None:
        return zpass_dense(vm, mz)
    blocks, W = plan
    # equal-size blocks stack; ragged tail handled by padding mz rows
    idx = np.stack([np.arange(ws, ws + W) for (_, _, ws) in blocks])
    wins = jnp.take(vm, jnp.asarray(idx).reshape(-1), axis=0)
    wins = wins.reshape(len(blocks), W, Y, X)
    bs = blocks[0][1]
    nb = len(blocks)
    R = mz.shape[0]
    # band blocks of mz: (nb, R, bs, W) — rows padded to bs*nb >= Z
    pad = bs * nb - Z
    mzp = jnp.pad(mz, ((0, 0), (0, pad), (0, 0))) if pad else mz
    bands = jnp.stack([
        jax.lax.dynamic_slice(mzp, (0, b * bs, ws), (R, bs, W))
        for b, (_, _, ws) in enumerate(blocks)])
    a = jnp.einsum("brnw,bwyx->rybnx", bands, wins,
                   preferred_element_type=vm.dtype)
    a = a.reshape(R, Y, nb * bs, X)
    return a[:, :, :Z, :] if pad else a


# ------------------------------------------------- banded y/x Pallas kernel

from functools import partial  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _banded_yx_kernel(a_ref, my_ref, mxt_ref, o_ref, *, yplan, xplan):
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[0]                     # (Y, TZ, X)
    my = my_ref[0]                   # (Yo, Y)
    mxt = mxt_ref[0]                 # (X, Xo)
    Y, TZ, X = a.shape
    yblocks, Wy = yplan if yplan else ([(0, my.shape[0], 0)], Y)
    xblocks, Wx = xplan if xplan else ([(0, mxt.shape[1], 0)], X)
    for (ys, yl, yw) in yblocks:
        aw = a[yw:yw + Wy].reshape(Wy, TZ * X)
        b = jnp.dot(my[ys:ys + yl, yw:yw + Wy], aw,
                    preferred_element_type=jnp.float32)
        b = b.astype(a.dtype).reshape(yl * TZ, X)
        for (xs, xl, xw) in xblocks:
            c = jnp.dot(b[:, xw:xw + Wx], mxt[xw:xw + Wx, xs:xs + xl],
                        preferred_element_type=jnp.float32)
            o_ref[ys:ys + yl, :, xs:xs + xl] += c.reshape(yl, TZ, xl)


@partial(jax.jit, static_argnames=("tz", "rads"))
def fused_yx_banded(a, My, Mx, tz=16, rads=(9, 9)):
    R, Y, Z, X = a.shape
    Yo = My.shape[1]
    mxt = jnp.swapaxes(Mx, 1, 2)
    yplan = banded_plan(Yo, rads[0])
    xplan = banded_plan(mxt.shape[2], rads[1])
    out = pl.pallas_call(
        partial(_banded_yx_kernel,
                yplan=_freeze(yplan), xplan=_freeze(xplan)),
        grid=(Z // tz, 1, R),
        in_specs=[
            pl.BlockSpec((1, Y, tz, X), lambda zb, ybi, r: (r, 0, zb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Yo, Y), lambda zb, ybi, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, X, mxt.shape[2]), lambda zb, ybi, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Yo, tz, mxt.shape[2]),
                               lambda zb, ybi, r: (0, zb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Yo, Z, mxt.shape[2]), jnp.float32),
    )(a, My, mxt)
    return jnp.swapaxes(out, 0, 1)


def _freeze(plan):
    if plan is None:
        return None
    blocks, W = plan
    return tuple(blocks), W


# ------------------------------------------------------------------ variants

def make_conv(mode, rads=(9, 9, 9), tz=16):
    rz, ry, rx = rads

    @jax.jit
    def conv(vol, Mz, My, Mx):
        vm = vol.astype(Mz.dtype)
        if mode in ("banded-z", "banded"):
            a = zpass_banded(vm, Mz, rz)
        else:
            a = zpass_dense(vm, Mz)
        a = jnp.swapaxes(a, 0, 1) if a.ndim == 5 else a  # no-op guard
        if mode in ("banded-yx", "banded"):
            out = fused_yx_banded(a, My, Mx, tz=tz, rads=(ry, rx))
        else:
            out = fused_yx_apply(a, My, Mx, tz=tz)
        return out.astype(vol.dtype)

    return conv


def xla_chain(vol, Mz, My, Mx):
    vm = vol.astype(Mz.dtype)
    a = jnp.einsum("pyx,rnp->rnyx", vm, Mz, preferred_element_type=vm.dtype)
    b = jnp.einsum("rzpx,rnp->rznx", a, My, preferred_element_type=vm.dtype)
    c = jnp.einsum("rzyp,rnp->rzyn", b, Mx,
                   preferred_element_type=jnp.float32)
    return jnp.sum(c, axis=0)


def main():
    enable_persistent_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    taps = 19
    rad = (taps - 1) // 2
    shape = (n, n, n)
    rng = np.random.default_rng(0)
    az = rng.standard_normal((R, taps)) * np.exp(-np.arange(R) / 4)[:, None]
    ay = rng.standard_normal((R, taps)) * np.exp(-np.arange(R) / 4)[:, None]
    ax = rng.standard_normal((R, taps)) * np.exp(-np.arange(R) / 4)[:, None]
    Mz, My, Mx = folded_conv_matrices(az, ay, ax, shape)
    Mzb, Myb, Mxb = (jnp.asarray(M).astype(jnp.bfloat16)
                     for M in (Mz, My, Mx))
    vol = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    ref = np.asarray(xla_chain(vol, Mzb, Myb, Mxb), np.float64)
    rn = np.linalg.norm(ref) or 1.0

    N_CONV = 50
    for mode in ("dense", "banded-z", "banded-yx", "banded"):
        conv = make_conv(mode, rads=(rad, rad, rad))
        got = np.asarray(conv(vol, Mzb, Myb, Mxb), np.float64)
        err = np.linalg.norm(got - ref) / rn
        # timed loop: chain N_CONV convs (data-dependent) in one program

        @jax.jit
        def loop(v):
            def body(_, x):
                return conv(x, Mzb, Myb, Mxb) * (1.0 / (1.0 + 1e-9))
            return jax.lax.fori_loop(0, N_CONV, body, v)

        _fence(loop(vol))  # compile+warm
        walls = []
        for _ in range(5):
            t0 = time.time()
            _fence(loop(vol))
            walls.append(time.time() - t0)
        w = float(np.median(walls))
        log(f"{mode:10s}: {1e3 * w / N_CONV:7.3f} ms/conv  "
            f"(walls {['%.3f' % x for x in walls]})  nrmse={err:.2e}")


if __name__ == "__main__":
    main()
