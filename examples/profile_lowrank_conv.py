"""Microbench: lowrank folded-conv formulations at 256^3 (HBM traffic).

Variants of conv_lowrank_folded's pass structure; prints ms/conv for each
and max|diff| vs the current formulation. Tuning tool for ops/separable.py.
"""
import sys
import time
from pathlib import Path

_root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_root))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

N = 256
R = 10
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random((N, N, N), np.float32))
Mz = jnp.asarray(rng.normal(0, 0.1, (R, N, N)).astype(np.float32)
                 .astype(jnp.bfloat16))
My = jnp.asarray(rng.normal(0, 0.1, (R, N, N)).astype(np.float32)
                 .astype(jnp.bfloat16))
Mx = jnp.asarray(rng.normal(0, 0.1, (R, N, N)).astype(np.float32)
                 .astype(jnp.bfloat16))
float(jnp.sum(vol))


@jax.jit
def v_current(vol, Mz, My, Mx):
    mid_t = Mz.dtype
    a = jnp.einsum("pyx,rnp->rnyx", vol.astype(mid_t), Mz,
                   preferred_element_type=mid_t)
    b = jnp.einsum("rzpx,rnp->rznx", a, My, preferred_element_type=mid_t)
    c = jnp.einsum("rzyp,rnp->rzyn", b, Mx,
                   preferred_element_type=jnp.float32)
    return jnp.sum(c, axis=0).astype(vol.dtype)


@jax.jit
def v_fused_last(vol, Mz, My, Mx):
    mid_t = Mz.dtype
    a = jnp.einsum("pyx,rnp->rnyx", vol.astype(mid_t), Mz,
                   preferred_element_type=mid_t)
    b = jnp.einsum("rzpx,rnp->rznx", a, My, preferred_element_type=mid_t)
    # contract r AND p in one dot: no (R,Z,Y,X) f32 materialization
    return jnp.einsum("rzyp,rnp->zyn", b, Mx,
                      preferred_element_type=jnp.float32).astype(vol.dtype)


@jax.jit
def v_fused_last_layout(vol, Mz, My, Mx):
    mid_t = Mz.dtype
    a = jnp.einsum("pyx,rnp->rnyx", vol.astype(mid_t), Mz,
                   preferred_element_type=mid_t)
    # emit b with (z, y, r, x) layout so the final (r,x) contraction is
    # a clean reshape-free matmul
    b = jnp.einsum("rzpx,rnp->znrx", a, My, preferred_element_type=mid_t)
    return jnp.einsum("zyrp,rnp->zyn", b, Mx,
                      preferred_element_type=jnp.float32).astype(vol.dtype)


@jax.jit
def v_yx_then_z(vol, Mz, My, Mx):
    # rank-expand on the LAST (x) axis first, z-contraction last
    mid_t = Mz.dtype
    a = jnp.einsum("zyp,rnp->rzyn", vol.astype(mid_t), Mx,
                   preferred_element_type=mid_t)
    b = jnp.einsum("rzpx,rnp->rznx", a, My, preferred_element_type=mid_t)
    return jnp.einsum("rpyx,rnp->nyx", b, Mz,
                      preferred_element_type=jnp.float32).astype(vol.dtype)


def timeit(name, fn, reps=5):
    out = fn(vol, Mz, My, Mx)
    float(jnp.sum(out))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(vol, Mz, My, Mx)
        float(jnp.sum(out))
        walls.append(time.time() - t0)
    print(f"{name:24s} {min(walls)*1e3:8.2f} ms", file=sys.stderr)
    return out


ref = timeit("current", v_current)
for name, fn in [("fused_last", v_fused_last),
                 ("fused_last_layout", v_fused_last_layout),
                 ("yx_then_z", v_yx_then_z)]:
    out = timeit(name, fn)
    d = float(jnp.max(jnp.abs(out - ref)))
    print(f"  max|diff| vs current: {d:.3e}", file=sys.stderr)
