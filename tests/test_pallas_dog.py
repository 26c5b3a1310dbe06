"""Pallas fused DoG kernel vs the XLA reference path (interpreter mode on
CPU; the compiled path is exercised on TPU by bench/verify runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spim_registration_tpu.ops.gaussian import difference_of_gaussian
from spim_registration_tpu.ops.pallas.dog import dog_pallas


def test_pallas_dog_matches_xla(rng):
    vol = rng.normal(size=(40, 50, 60)).astype(np.float32)
    ref = np.asarray(difference_of_gaussian(jnp.asarray(vol), 1.8, 2.26))
    out = np.asarray(dog_pallas(jnp.asarray(vol), 1.8, 2.26,
                                interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_dog_anisotropic_and_odd_sizes(rng):
    vol = rng.normal(size=(21, 33, 47)).astype(np.float32)
    s1 = (1.2, 1.8, 1.8)
    s2 = (1.5, 2.2, 2.2)
    ref = np.asarray(difference_of_gaussian(jnp.asarray(vol), s1, s2))
    out = np.asarray(dog_pallas(jnp.asarray(vol), s1, s2, bz=8, by=16,
                                interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_segment_topk_matches_xla_extraction(rng):
    """The one-pass Pallas per-segment extraction == the XLA round loop:
    same survivors, same first-index tie handling, same counts."""
    import jax

    from spim_registration_tpu.ops.pallas.segtopk import segment_topk

    seg, rounds, S = 128, 4, 512
    n = S * seg
    score = np.full(n, -np.inf, np.float32)
    # sparse candidates, some sharing a segment, plus an exact duplicate
    # value inside one segment (tie -> first index wins)
    pos = rng.choice(n, size=300, replace=False)
    score[pos] = rng.random(300).astype(np.float32) + 0.1
    score[5 * seg + 3] = 0.7
    score[5 * seg + 90] = 0.7
    padded = jnp.asarray(score)

    va, ia, cnt = segment_topk(padded, seg=seg, rounds=rounds, block=64,
                               interpret=True)
    va, ia, cnt = np.asarray(va), np.asarray(ia), np.asarray(cnt)

    tiles = score.reshape(S, seg)
    np.testing.assert_array_equal(cnt, (tiles > -np.inf).sum(axis=1))
    for s in range(S):
        row = tiles[s]
        want_v, got = [], row.copy()
        for _ in range(rounds):
            am = int(np.argmax(got))
            want_v.append((got[am], s * seg + am if np.isfinite(got[am])
                           else s * seg + am))
            got[am] = -np.inf
        have = sorted(zip(va[s * rounds:(s + 1) * rounds],
                          ia[s * rounds:(s + 1) * rounds]),
                      key=lambda t: (-t[0], t[1]))
        want = sorted(want_v, key=lambda t: (-t[0], t[1]))
        for (hv, hi), (wv, wi) in zip(have, want):
            if np.isfinite(wv):
                assert hv == wv and hi == wi, (s, have, want)
