"""Local extremum detection + sub-pixel quadratic localization.

Reference parity: ImgLib1 DoG peak detection (26-neighborhood strict
extremum scan) and `SubpixelLocalization` (iterative 3x3x3 quadratic fit
with re-centering; SURVEY.md section 2.3 / 7.3 "subpixel parity").

TPU-native design (all measured on-chip, see PERF.md):

- Candidate extrema come from a SEPARABLE 3-pass max-pool (z,y,x
  `reduce_window`s compose to the 3x3x3 window max) — memory-bound, ~9x
  cheaper than 26 shifted comparisons. Strictness (center strictly
  greater than all 26 neighbors) is enforced afterwards on the selected
  peaks only, against their gathered 3x3x3 neighborhoods.
- Peak selection exploits candidate SPARSITY: iterative per-segment
  argmax extraction (`_segmented_compact_topk`) — `rounds` cheap
  segmented max-reductions compact every candidate out of the field,
  then one small top_k ranks the survivors. An in-program exactness
  guard (`lax.cond` on per-segment candidate counts) falls back to the
  full top_k if any segment holds more candidates than extraction
  rounds. ~10x cheaper again than the r2 two-stage top_k (kept as
  `_two_stage_topk` for reference).
- Sub-pixel refinement is batched over all peaks: 27 flat 1D gathers per
  iteration + closed-form (Cramer) 3x3 Newton solves; the per-peak
  re-centering loop of the reference becomes a `fori_loop` over the max
  iteration count (idempotent once a peak stops moving).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shifts3():
    return [
        (dz, dy, dx)
        for dz in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if not (dz == 0 and dy == 0 and dx == 0)
    ]


def local_extrema_mask(dog: jnp.ndarray, find_maxima: bool = True,
                       find_minima: bool = False) -> jnp.ndarray:
    """Boolean mask of strict 26-neighborhood extrema (border excluded)."""
    z, y, x = dog.shape
    pad = jnp.pad(dog, 1, mode="edge")
    center = dog
    is_max = jnp.ones_like(dog, dtype=bool)
    is_min = jnp.ones_like(dog, dtype=bool)
    for dz, dy, dx in _shifts3():
        nb = jax.lax.dynamic_slice(pad, (dz + 1, dy + 1, dx + 1), (z, y, x))
        is_max &= center > nb
        is_min &= center < nb
    mask = jnp.zeros_like(dog, dtype=bool)
    if find_maxima:
        mask |= is_max
    if find_minima:
        mask |= is_min
    # exclude the 1-voxel border (reference rejects boundary peaks)
    border = jnp.zeros_like(mask)
    border = border.at[1:-1, 1:-1, 1:-1].set(True)
    return mask & border


def _pool3(vol: jnp.ndarray, op, init) -> jnp.ndarray:
    """3x3x3 window reduce as three separable 1D passes."""
    m = jax.lax.reduce_window(vol, init, op, (3, 1, 1), (1, 1, 1), "SAME")
    m = jax.lax.reduce_window(m, init, op, (1, 3, 1), (1, 1, 1), "SAME")
    return jax.lax.reduce_window(m, init, op, (1, 1, 3), (1, 1, 1), "SAME")


def _interior_mask(shape):
    z = (jnp.arange(shape[0]) >= 1) & (jnp.arange(shape[0]) <= shape[0] - 2)
    y = (jnp.arange(shape[1]) >= 1) & (jnp.arange(shape[1]) <= shape[1] - 2)
    x = (jnp.arange(shape[2]) >= 1) & (jnp.arange(shape[2]) <= shape[2] - 2)
    return z[:, None, None] & y[None, :, None] & x[None, None, :]


def _gather27(flat, base, YX, X):
    """(P, 27) neighborhood values around flat base indices (raster order
    matching a (3,3,3) reshape).

    ONE take of a (P, 27) index matrix: 27 separate takes cost ~3.7 ms
    per call at 2048 peaks on a 16.7M-voxel field (each gather pays the
    random-access latency independently) vs ~1.2 ms fused — and this
    runs once per subpixel iteration, where it dominated the whole
    detection pipeline (measured r3, PERF.md)."""
    offs = jnp.asarray(
        [dz * YX + dy * X + dx
         for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        base.dtype)
    idx = base[:, None] + offs[None, :]
    return jnp.take(flat, idx.reshape(-1), mode="clip").reshape(-1, 27)


def _segmented_compact_topk(score, k, seg=512, rounds=4):
    """Exact top-k of a SPARSE score field (candidates are -inf except at
    extrema) via iterative per-segment argmax extraction.

    The field is viewed as (S, seg) segments; `rounds` passes each take
    every segment's max + argmax and mask it out (by INDEX, so value ties
    are exact). All candidates are extracted provided no segment holds
    more than `rounds` finite entries — guarded in-program: a candidate
    count per segment is computed and `lax.cond` falls back to the exact
    full `top_k` on overflow. For bead-like densities (1 extremum per
    ~10^4-10^5 voxels) overflow never triggers in practice.

    Cost: `rounds` memory-bound segmented reductions over the field plus
    one small top_k over S*rounds survivors — ~10x cheaper than the
    previous two-stage top_k (k1=64 per 4096-row) at 256^3, which was
    ~60% of the whole detection pipeline (PERF.md r2 headroom #1).
    Returns (vals, idx) with vals sorted descending.
    """
    n = score.shape[0]
    S = -(-n // seg)
    padded = jnp.full((S * seg,), -jnp.inf, score.dtype).at[:n].set(score)
    if k > rounds * S:  # static: extraction cannot retain k candidates
        return jax.lax.top_k(padded, k)

    # On real TPUs the extraction runs as ONE Pallas pass over the field
    # (per-segment top-`rounds` + counts in VMEM) instead of `rounds`
    # HBM-read rounds — same selection, same overflow guard
    # (ops/pallas/segtopk.py; ~3.7 ms -> ~0.3 ms at 256^3, measured r3).
    # NOTE: `is_tpu_backend()` inspects the DEFAULT backend at trace
    # time, not where the operand lives — detection must run on the
    # default backend (an array device_put to CPU while the default is
    # TPU would trace the non-interpret Pallas call). The production
    # paths all satisfy this; see utils/backend.py.
    from spim_registration_tpu.utils.backend import is_tpu_backend

    if is_tpu_backend() and S % 256 == 0:
        from spim_registration_tpu.ops.pallas.segtopk import segment_topk

        va, ia, counts = segment_topk(padded, seg=seg, rounds=rounds)
        # reorder (S, rounds) segment-major -> round-major to match the
        # XLA fast path's concat layout: exact-value TIES then break in
        # the same row order on TPU and CPU (cross-backend determinism)
        va = va.reshape(S, rounds).T.reshape(-1)
        ia = ia.reshape(S, rounds).T.reshape(-1)
        overflow = jnp.any(counts > rounds)

        def fast_p(_):
            v2, sel = jax.lax.top_k(va, k)
            return v2, jnp.take(ia, sel)

        def exact_p(_):
            v, i = jax.lax.top_k(padded, k)
            return v, i

        return jax.lax.cond(overflow, exact_p, fast_p, operand=None)

    tiles = padded.reshape(S, seg)
    counts = jnp.sum(tiles > -jnp.inf, axis=1)
    overflow = jnp.any(counts > rounds)

    def fast(tiles):
        rows = jnp.arange(S, dtype=jnp.int32)
        base = rows * seg
        vals, idxs = [], []
        for _ in range(rounds):
            am = jnp.argmax(tiles, axis=1).astype(jnp.int32)
            v = jnp.take_along_axis(tiles, am[:, None], axis=1)[:, 0]
            vals.append(v)
            idxs.append(base + am)
            tiles = tiles.at[rows, am].set(-jnp.inf)
        va = jnp.concatenate(vals)
        ia = jnp.concatenate(idxs)
        v2, sel = jax.lax.top_k(va, k)
        return v2, jnp.take(ia, sel)

    def exact(tiles):
        v, i = jax.lax.top_k(tiles.reshape(-1), k)
        return v, i

    return jax.lax.cond(overflow, exact, fast, tiles)


def _two_stage_topk(score, k, k1=64, row=4096):
    """Exact top-k of `score` (1D) via per-row prefilter with an overflow
    guard (falls back to the full top_k when a row holds > k1 candidates).
    Returns (vals, idx)."""
    n = score.shape[0]
    rows = -(-n // row)
    padded = jnp.full((rows * row,), -jnp.inf, score.dtype).at[:n].set(score)
    if k > rows * k1:  # static: prefilter cannot retain k candidates
        return jax.lax.top_k(padded, k)
    tiles = padded.reshape(rows, row)
    counts = jnp.sum(jnp.isfinite(tiles), axis=1)
    overflow = jnp.any(counts > k1)

    def fast(_):
        v1, i1 = jax.lax.top_k(tiles, k1)
        g1 = i1 + (jnp.arange(rows, dtype=i1.dtype) * row)[:, None]
        v2, i2 = jax.lax.top_k(v1.reshape(-1), k)
        return v2, jnp.take(g1.reshape(-1), i2)

    def exact(_):
        v, i = jax.lax.top_k(padded, k)
        return v, i

    return jax.lax.cond(overflow, exact, fast, operand=None)


@partial(jax.jit, static_argnames=("max_peaks", "find_minima", "hot_k",
                                   "return_count"))
def find_peaks(dog: jnp.ndarray, threshold: float, max_peaks: int = 4096,
               find_minima: bool = False, hot_k: int = 2048,
               return_count: bool = False):
    """Top-`max_peaks` strict extrema with |response| >= threshold.

    Returns (coords (P,3) int32, response (P,), valid (P,) bool) — static
    shapes; invalid rows are zero. With `return_count`, appends the
    PRE-strictness candidate count (int32 scalar): rows are sorted by
    |response|, so all valid rows sit within the first `count` rows —
    the bound the truncated-transfer detection path needs.

    `hot_k`: candidate rows are sorted descending, so when the candidate
    COUNT fits in `hot_k`, the strictness 27-gather runs on that slice
    only (random gathers on a 16M-element field are latency-bound; bead
    scenes hold a few hundred candidates in an 8192-row budget). An
    in-program `lax.cond` falls back to the full-budget gather whenever
    the count exceeds `hot_k` — results are exact either way.
    """
    z, y, x = dog.shape
    n = z * y * x
    cand = (dog >= _pool3(dog, jax.lax.max, -jnp.inf))
    if find_minima:
        cand |= (dog <= _pool3(dog, jax.lax.min, jnp.inf))
    cand &= (jnp.abs(dog) >= threshold) & _interior_mask(dog.shape)
    score = jnp.where(cand, jnp.abs(dog), -jnp.inf).reshape(-1)

    k = min(max_peaks, n)
    vals, idx = _segmented_compact_topk(score, k)
    if k < max_peaks:
        vals = jnp.pad(vals, (0, max_peaks - k), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, max_peaks - k))
    valid = (vals >= threshold) & jnp.isfinite(vals)
    cand_count = jnp.sum(valid.astype(jnp.int32))

    # strictness: center strictly greater (smaller) than all 26 neighbors
    flat = dog.reshape(-1)
    idx = jnp.clip(idx, 0, n - 1)

    def strict_of(rows_idx):
        nb = _gather27(flat, rows_idx, y * x, x)
        center = nb[:, 13]
        others = jnp.concatenate([nb[:, :13], nb[:, 14:]], axis=1)
        s = jnp.all(center[:, None] > others, axis=1)
        if find_minima:
            s |= jnp.all(center[:, None] < others, axis=1)
        return s

    kh = min(hot_k, max_peaks)
    if kh < max_peaks:
        strict = jax.lax.cond(
            cand_count <= kh,
            lambda: jnp.pad(strict_of(idx[:kh]), (0, max_peaks - kh)),
            lambda: strict_of(idx))
    else:
        strict = strict_of(idx)
    valid &= strict

    zz, yy, xx = jnp.unravel_index(idx, dog.shape)
    coords = jnp.stack([zz, yy, xx], axis=-1).astype(jnp.int32)
    resp = jnp.take(flat, idx)
    coords = jnp.where(valid[:, None], coords, 0)
    resp = jnp.where(valid, resp, 0.0)
    if return_count:
        return coords, resp, valid, cand_count
    return coords, resp, valid


def _refine_from(dog, c0, valid, first, max_iterations, max_offset,
                 compact_budget=None):
    """The re-centering loop of `subpixel_localize`, seeded with a
    PRECOMPUTED first fit (off, val) at c0 — the fused detection path
    reuses the strictness 27-gather as the first fit's neighborhood, so
    the common converge-immediately case costs ONE gather total.

    `compact_budget` (r5): rows are INDEPENDENT and a non-moving row's
    refit at an unchanged center is idempotent, so only rows whose
    first fit steps need the walk at all. When at most `compact_budget`
    rows move, the walk runs on that compacted subset (27-gathers
    shrink from P rows to B) and scatters back — EXACT either way (the
    over-budget case falls back to the full walk). On the bench scene
    only tens of ridge rows re-center out of 2048."""
    z, y, x = dog.shape
    flat = dog.reshape(-1)
    YX = y * x
    hi = jnp.asarray([z - 2, y - 2, x - 2], jnp.int32)

    def step_mask(off, v):
        s = jnp.where(jnp.abs(off) > max_offset,
                      jnp.sign(off).astype(jnp.int32), 0)
        return s * v[:, None].astype(jnp.int32)

    def walk(c1, off0, val0, v):
        """The re-centering while_loop on one row set (full or compact)."""
        def fit_at(c):
            base = c[:, 0] * YX + c[:, 1] * x + c[:, 2]
            nb = _gather27(flat, base, YX, x)
            off, val = _quadratic_step_batched(nb)
            return off, val, step_mask(off, v)

        def cond(state):
            i, _c, _o, _v, moved = state
            return (i < max_iterations) & moved

        def body(state):
            i, c, _o, _v, _m = state
            off, val, step = fit_at(c)
            c2 = jnp.clip(c + step, 1, hi)
            return i + 1, c2, off, val, jnp.any(c2 != c)

        init = (jnp.int32(1), c1, off0, val0, jnp.any(step_mask(off0, v)
                                                      != 0))
        _, c, off, val, _ = jax.lax.while_loop(cond, body, init)
        return c, off, val

    off0, val0 = first
    c0 = jnp.clip(c0, 1, hi)
    step0 = step_mask(off0, valid)
    c1 = jnp.clip(c0 + step0, 1, hi)

    P = c0.shape[0]
    B = compact_budget
    if B is not None and B < P:
        need = jnp.any(c1 != c0, axis=1)
        count = jnp.sum(need.astype(jnp.int32))
        order = jnp.argsort(jnp.where(need, 0, 1), stable=True)
        ridx = order[:B]
        sel = (jnp.arange(B) < count)

        def compact():
            cB, offB, valB = walk(c1[ridx], off0[ridx], val0[ridx],
                                  valid[ridx] & sel)
            m = sel[:, None]
            c_ = c1.at[ridx].set(jnp.where(m, cB, c1[ridx]))
            o_ = off0.at[ridx].set(jnp.where(m, offB, off0[ridx]))
            v_ = val0.at[ridx].set(jnp.where(sel, valB, val0[ridx]))
            return c_, o_, v_

        def full():
            return walk(c1, off0, val0, valid)

        c, off, val = jax.lax.cond(count <= B, compact, full)
    else:
        c, off, val = walk(c1, off0, val0, valid)

    pos = c.astype(dog.dtype) + off
    shape = jnp.asarray(dog.shape, dog.dtype)
    ok = valid & jnp.all(jnp.abs(off) < 1.0, axis=-1) & jnp.all(
        (pos >= 0) & (pos <= shape - 1.0), axis=-1)
    pos = jnp.where(ok[:, None], pos, 0.0)
    val = jnp.where(ok, val, 0.0)
    return pos, val, ok


def find_peaks_localized(dog: jnp.ndarray, threshold: float,
                         max_peaks: int, find_minima: bool = False,
                         hot_k: int = 2048, max_iterations: int = 4,
                         max_offset: float = 0.5):
    """Fused `find_peaks` + `subpixel_localize` (VERDICT r3 next #8):
    ONE 27-neighborhood gather serves both the strictness check and the
    first quadratic fit — on bead scenes (where refinement converges on
    the first fit for nearly all peaks) this halves the latency-bound
    random-gather passes of the peak stage. Semantics identical to the
    unfused pair. Returns (pos (P,3), val (P,), ok (P,), cand_count)."""
    z, y, x = dog.shape
    n = z * y * x
    cand = (dog >= _pool3(dog, jax.lax.max, -jnp.inf))
    if find_minima:
        cand |= (dog <= _pool3(dog, jax.lax.min, jnp.inf))
    cand &= (jnp.abs(dog) >= threshold) & _interior_mask(dog.shape)
    score = jnp.where(cand, jnp.abs(dog), -jnp.inf).reshape(-1)
    k = min(max_peaks, n)
    vals, idx = _segmented_compact_topk(score, k)
    if k < max_peaks:
        vals = jnp.pad(vals, (0, max_peaks - k), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, max_peaks - k))
    valid = (vals >= threshold) & jnp.isfinite(vals)
    cand_count = jnp.sum(valid.astype(jnp.int32))
    flat = dog.reshape(-1)
    idx = jnp.clip(idx, 0, n - 1)

    def run_rows(idx_r, valid_r):
        nb = _gather27(flat, idx_r, y * x, x)
        center = nb[:, 13]
        others = jnp.concatenate([nb[:, :13], nb[:, 14:]], axis=1)
        s = jnp.all(center[:, None] > others, axis=1)
        if find_minima:
            s |= jnp.all(center[:, None] < others, axis=1)
        valid_s = valid_r & s
        zz, yy, xx = jnp.unravel_index(idx_r, dog.shape)
        c0 = jnp.stack([zz, yy, xx], axis=-1).astype(jnp.int32)
        off0, val0 = _quadratic_step_batched(nb)
        return _refine_from(dog, c0, valid_s, (off0, val0),
                            max_iterations, max_offset,
                            compact_budget=256)

    P = max_peaks
    kh = min(hot_k, P)
    if kh < P:
        def small():
            p_, v_, o_ = run_rows(idx[:kh], valid[:kh])
            pad = P - kh
            return (jnp.pad(p_, ((0, pad), (0, 0))),
                    jnp.pad(v_, (0, pad)), jnp.pad(o_, (0, pad)))

        pos, val, ok = jax.lax.cond(cand_count <= kh, small,
                                    lambda: run_rows(idx, valid))
    else:
        pos, val, ok = run_rows(idx, valid)
    return pos, val, ok, cand_count


def _quadratic_step_batched(nb):
    """Batched Newton step on (P, 27) 3x3x3 neighborhoods.

    Gradient by central differences, Hessian by the standard 27-point
    stencils, offset = -H^-1 g via closed-form (Cramer) 3x3 inverse —
    LAPACK-style batched solves are ~10 ms for 8k peaks on TPU, the
    closed form fuses into the surrounding elementwise program.
    """
    nb = nb.reshape(nb.shape[0], 3, 3, 3)
    c = nb[:, 1, 1, 1]
    gz = 0.5 * (nb[:, 2, 1, 1] - nb[:, 0, 1, 1])
    gy = 0.5 * (nb[:, 1, 2, 1] - nb[:, 1, 0, 1])
    gx = 0.5 * (nb[:, 1, 1, 2] - nb[:, 1, 1, 0])
    hzz = nb[:, 2, 1, 1] - 2 * c + nb[:, 0, 1, 1]
    hyy = nb[:, 1, 2, 1] - 2 * c + nb[:, 1, 0, 1]
    hxx = nb[:, 1, 1, 2] - 2 * c + nb[:, 1, 1, 0]
    hzy = 0.25 * (nb[:, 2, 2, 1] - nb[:, 2, 0, 1]
                  - nb[:, 0, 2, 1] + nb[:, 0, 0, 1])
    hzx = 0.25 * (nb[:, 2, 1, 2] - nb[:, 2, 1, 0]
                  - nb[:, 0, 1, 2] + nb[:, 0, 1, 0])
    hyx = 0.25 * (nb[:, 1, 2, 2] - nb[:, 1, 0, 2]
                  - nb[:, 1, 2, 0] + nb[:, 1, 0, 0])
    hzz = hzz + 1e-12
    hyy = hyy + 1e-12
    hxx = hxx + 1e-12
    # adjugate / determinant of the symmetric 3x3 Hessian
    A = hyy * hxx - hyx * hyx
    B = hyx * hzx - hzy * hxx
    C = hzy * hyx - hyy * hzx
    det = hzz * A + hzy * B + hzx * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    E = hzz * hxx - hzx * hzx
    F = hzy * hzx - hzz * hyx
    I = hzz * hyy - hzy * hzy
    oz = -(A * gz + B * gy + C * gx) / det
    oy = -(B * gz + E * gy + F * gx) / det
    ox = -(C * gz + F * gy + I * gx) / det
    off = jnp.stack([oz, oy, ox], axis=-1)
    g = jnp.stack([gz, gy, gx], axis=-1)
    val = c + 0.5 * jnp.sum(g * off, axis=-1)
    return off, val


@partial(jax.jit, static_argnames=("max_iterations",))
def subpixel_localize(dog: jnp.ndarray, coords: jnp.ndarray,
                      valid: jnp.ndarray, max_iterations: int = 4,
                      max_offset: float = 0.5):
    """Iteratively re-centered quadratic refinement (batched over peaks).

    Follows the reference semantics: if any |offset| component > 0.5 the
    integer center moves one voxel that way and the fit repeats (up to
    `max_iterations`); peaks whose final offset still exceeds ~1 voxel or
    that walk outside the volume are invalidated.
    """
    z, y, x = dog.shape
    flat = dog.reshape(-1)
    YX = y * x
    hi = jnp.asarray([z - 2, y - 2, x - 2], jnp.int32)
    c0 = jnp.clip(coords.astype(jnp.int32), 1, hi)

    def fit_at(c):
        base = c[:, 0] * YX + c[:, 1] * x + c[:, 2]
        nb = _gather27(flat, base, YX, x)
        off, val = _quadratic_step_batched(nb)
        step = jnp.where(jnp.abs(off) > max_offset,
                         jnp.sign(off).astype(jnp.int32), 0)
        # INVALID rows (padded budget slots, coords clipped to (1,1,1))
        # fit garbage neighborhoods and would keep "moving", pinning the
        # convergence flag below at max_iterations; their outputs are
        # masked at the end regardless, so freeze them.
        step = step * valid[:, None].astype(step.dtype)
        return off, val, step

    def cond(state):
        i, _c, _off, _val, moved = state
        return (i < max_iterations) & moved

    def body(state):
        i, c, _off, _val, _moved = state
        off, val, step = fit_at(c)
        c2 = jnp.clip(c + step, 1, hi)
        # re-fit only while at least one peak re-centered: the loop exits
        # as soon as every offset is within +-max_offset (typically after
        # 1-2 fits — a fixed fori_loop paid for max_iterations gathers;
        # the fixpoint is identical because converged fits are idempotent)
        moved = jnp.any(c2 != c)
        return i + 1, c2, off, val, moved

    p = coords.shape[0]
    # NOTE: derive the zero carries from `flat` so their sharding "varying"
    # axes match the body outputs under shard_map.
    zero = jnp.zeros((), dog.dtype) * flat[0]
    init = (jnp.int32(0) + (zero * 0).astype(jnp.int32), c0,
            jnp.zeros((p, 3), dog.dtype) + zero,
            jnp.zeros((p,), dog.dtype) + zero,
            jnp.bool_(True) | (zero > 0))
    i, c, off, val, _ = jax.lax.while_loop(cond, body, init)
    # off/val carried out of `body` are the fit at the center the loop
    # settled on (converged => the last step was 0 and c is unchanged),
    # exactly what the fixed-count loop produced after its idempotent
    # trailing iterations. Peaks still moving at max_iterations keep the
    # pre-move fit — the fixed-count loop's behavior too — and are
    # typically invalidated by the |off| < 1 check below.

    pos = c.astype(dog.dtype) + off
    shape = jnp.asarray(dog.shape, dog.dtype)
    ok = valid & jnp.all(jnp.abs(off) < 1.0, axis=-1) & jnp.all(
        (pos >= 0) & (pos <= shape - 1.0), axis=-1)
    pos = jnp.where(ok[:, None], pos, 0.0)
    val = jnp.where(ok, val, 0.0)
    return pos, val, ok
