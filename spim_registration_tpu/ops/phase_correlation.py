"""Phase correlation for translation initialization.

BASELINE config #3 ("phase-correlation init + bead BA") and the reference
ecosystem's stitching initializer: the normalized cross-power spectrum
peak gives the integer shift between two volumes; a 3x3x3 quadratic fit
(reusing the detection subpixel machinery) refines it.

TPU-native: two rfftns + one irfftn + top-k — all XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.ops.extrema import _quadratic_step_batched


@partial(jax.jit, static_argnames=())
def _pcm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    fa = jnp.fft.rfftn(a)
    fb = jnp.fft.rfftn(b)
    cross = fa * jnp.conj(fb)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    return jnp.fft.irfftn(cross, s=a.shape)


@partial(jax.jit, static_argnames=("num_peaks",))
def _peaks(pcm: jnp.ndarray, num_peaks: int):
    flat = pcm.reshape(-1)
    vals, idx = jax.lax.top_k(flat, num_peaks)
    coords = jnp.stack(jnp.unravel_index(idx, pcm.shape), axis=-1)
    return vals, coords


def phase_correlation_shift(a: np.ndarray, b: np.ndarray,
                            num_peaks: int = 5, subpixel: bool = True):
    """Estimate the translation t such that b(x) ~= a(x - t).

    Checks the `num_peaks` strongest correlation peaks under each of the
    2^3 wrap-around interpretations and returns the one maximizing real
    overlap correlation (the standard stitching disambiguation).
    Returns (shift (3,) float, peak_correlation float).
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    pcm = _pcm(a, b)
    vals, coords = _peaks(pcm, num_peaks)
    shape = np.asarray(a.shape)
    an = np.asarray(a)
    bn = np.asarray(b)

    best = None
    for v, c in zip(np.asarray(vals), np.asarray(coords)):
        for alt in _wrap_alternatives(c, shape):
            score = _overlap_corr(an, bn, alt)
            if best is None or score > best[1]:
                best = (alt.astype(np.float64), score)
    shift, score = best

    if subpixel:
        # quadratic refine around the winning (unwrapped) peak
        c = np.asarray(coords)[0]
        nb = np.asarray(jax.lax.dynamic_slice(
            jnp.pad(pcm, 1, mode="wrap"), (int(c[0]), int(c[1]), int(c[2])),
            (3, 3, 3)))
        off, _val = _quadratic_step_batched(jnp.asarray(nb).reshape(1, 27))
        off = off[0]
        off = np.clip(np.asarray(off), -1.0, 1.0)
        shift = shift + off
    return shift, float(score)


def _wrap_alternatives(c, shape):
    outs = []
    for mask in range(8):
        alt = c.astype(np.int64).copy()
        for d in range(3):
            if mask >> d & 1:
                alt[d] = alt[d] - shape[d]
        outs.append(alt)
    return outs


def _overlap_corr(a: np.ndarray, b: np.ndarray, shift) -> float:
    """Correlation of a and b over the overlap implied by integer shift
    (b shifted by +shift aligns with a)."""
    s = np.round(shift).astype(int)
    sl_a, sl_b = [], []
    for d in range(3):
        if s[d] >= 0:
            n = a.shape[d] - s[d]
            if n <= 2:
                return -np.inf
            sl_a.append(slice(s[d], s[d] + n))
            sl_b.append(slice(0, n))
        else:
            n = a.shape[d] + s[d]
            if n <= 2:
                return -np.inf
            sl_a.append(slice(0, n))
            sl_b.append(slice(-s[d], -s[d] + n))
    aa = a[tuple(sl_a)].ravel()
    bb = b[tuple(sl_b)].ravel()
    if aa.std() < 1e-9 or bb.std() < 1e-9:
        return -np.inf
    n_vox = aa.size
    if n_vox < 27:
        return -np.inf
    r = float(np.corrcoef(aa, bb)[0, 1])
    # weight by overlap size a little so tiny overlaps don't win on noise
    return r * min(1.0, n_vox / (0.05 * a.size))


def translation_from_shift(shift) -> np.ndarray:
    """(3,4) affine moving view B onto A given the phase-corr shift."""
    return np.concatenate([np.eye(3), np.asarray(shift, float)[:, None]],
                          axis=1)
