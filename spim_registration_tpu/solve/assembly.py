"""Device-side assembly of the pose-graph normal equations.

The distributed heart of the solver (SURVEY.md section 2.11 "Distributed
communication backend": psum of J^T J / J^T r): correspondence residual
design blocks are built batched on device and scatter-added into the dense
reduced normal matrix. `assemble_normal_equations` is pure and shardable —
under `shard_map` with correspondences split over a mesh axis, follow it
with `jax.lax.psum` over that axis; the per-shard call is exactly this
function.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _design(model: str, pts: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, P) design matrices; see solve.global_opt._linear_design."""
    n = pts.shape[0]
    z, y, x = pts[:, 0], pts[:, 1], pts[:, 2]
    zero = jnp.zeros_like(z)
    one = jnp.ones_like(z)
    if model == "translation":
        rows = [
            [one, zero, zero],
            [zero, one, zero],
            [zero, zero, one],
        ]
    elif model == "rigid":
        rows = [
            [zero, x, -y, one, zero, zero],
            [-x, zero, z, zero, one, zero],
            [y, -z, zero, zero, zero, one],
        ]
    elif model == "affine":
        rows = [
            [z, y, x] + [zero] * 6 + [one, zero, zero],
            [zero] * 3 + [z, y, x] + [zero] * 3 + [zero, one, zero],
            [zero] * 6 + [z, y, x] + [zero, zero, one],
        ]
    else:
        raise ValueError(model)
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=1)


@partial(jax.jit, static_argnames=("model", "n_free"))
def assemble_normal_equations(model: str, n_free: int,
                              pc: jnp.ndarray, qc: jnp.ndarray,
                              w: jnp.ndarray,
                              col_i: jnp.ndarray, col_j: jnp.ndarray):
    """Assemble H (dim, dim) and g (dim,) for residuals r = pc - qc.

    Args:
      pc, qc: (N, 3) corresponding points already mapped by the current
        tile transforms (the linearization point).
      w: (N,) weights (0 for padding rows).
      col_i, col_j: (N,) free-column index of each side's tile, or -1 for
        fixed tiles (their contribution moves into g only).
    """
    P = {"translation": 3, "rigid": 6, "affine": 12}[model]
    dim = n_free * P
    Xi = _design(model, pc)   # (N, 3, P)
    Xj = _design(model, qc)
    r0 = pc - qc

    XtXi = jnp.einsum("nrp,nrq,n->npq", Xi, Xi, w)
    XtXj = jnp.einsum("nrp,nrq,n->npq", Xj, Xj, w)
    XtXij = jnp.einsum("nrp,nrq,n->npq", Xi, Xj, w)
    gi = jnp.einsum("nrp,nr,n->np", Xi, r0, w)
    gj = jnp.einsum("nrp,nr,n->np", Xj, r0, w)

    H = jnp.zeros((dim, dim), jnp.float64 if pc.dtype == jnp.float64
                  else jnp.float32)
    g = jnp.zeros((dim,), H.dtype)

    p_idx = jnp.arange(P)

    def block_rows(col):
        # (N, P) flat row indices; invalid (col < 0) -> out-of-range (drop)
        base = jnp.where(col >= 0, col * P, dim + 1)
        return base[:, None] + p_idx[None, :]

    ri = block_rows(col_i)  # (N, P)
    rj = block_rows(col_j)

    def scatter_block(H, rows, cols, vals):
        # rows (N,P), cols (N,P), vals (N,P,P)
        rr = jnp.broadcast_to(rows[:, :, None], vals.shape)
        cc = jnp.broadcast_to(cols[:, None, :], vals.shape)
        return H.at[rr, cc].add(vals, mode="drop")

    H = scatter_block(H, ri, ri, XtXi)
    H = scatter_block(H, rj, rj, XtXj)
    H = scatter_block(H, ri, rj, -XtXij)
    H = scatter_block(H, rj, ri, -jnp.swapaxes(XtXij, 1, 2))
    g = g.at[ri].add(gi, mode="drop")
    g = g.at[rj].add(-gj, mode="drop")
    return H, g


def assemble_normal_equations_sharded(mesh, axis: str, model: str,
                                      n_free: int, pc, qc, w,
                                      col_i, col_j):
    """Multi-chip assembly: correspondences sharded over `axis`, per-shard
    dense assembly, `psum` reduction over ICI.

    The distributed-BA reduction of SURVEY.md section 2.11: each device
    assembles the normal equations of its correspondence shard (rows must
    be padded to a multiple of the axis size with w=0 rows) and the
    (dim, dim) H / (dim,) g are summed across the mesh. Inputs are host
    arrays; outputs are replicated device arrays.
    """
    import numpy as np
    from jax.sharding import PartitionSpec as P

    try:  # JAX >= 0.7 new-style
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis]
    N = pc.shape[0]
    pad = (-N) % n_dev

    def _pad(a, fill=0):
        if pad == 0:
            return np.asarray(a)
        widths = ((0, pad),) + ((0, 0),) * (np.ndim(a) - 1)
        return np.pad(np.asarray(a), widths, constant_values=fill)

    pcp = jnp.asarray(_pad(pc), jnp.float32)
    qcp = jnp.asarray(_pad(qc), jnp.float32)
    wp = jnp.asarray(_pad(w), jnp.float32)          # pad weight 0 -> no-op
    cip = jnp.asarray(_pad(col_i, fill=-1), jnp.int32)
    cjp = jnp.asarray(_pad(col_j, fill=-1), jnp.int32)

    spec = P(axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec, spec, spec, spec),
             out_specs=(P(), P()))
    def _shard(pc_s, qc_s, w_s, ci_s, cj_s):
        H, g = assemble_normal_equations(model, n_free, pc_s, qc_s, w_s,
                                         ci_s, cj_s)
        return (jax.lax.psum(H, axis), jax.lax.psum(g, axis))

    return _shard(pcp, qcp, wp, cip, cjp)
