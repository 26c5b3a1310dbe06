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
