"""Profile the detection pipeline sub-stages on the real chip.

Times (steady-state, forced-sync scalar readback): DoG conv, candidate
mask+score, two-stage top-k, strictness gather, subpixel refine, full
fused program, and the packed transfer. Not part of the bench; a tuning
tool for ops/extrema.py.
"""
import sys
import time
from functools import partial
from pathlib import Path

_root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_root))

import jax
import jax.numpy as jnp
import numpy as np

from spim_registration_tpu.detect.dog import DoGParameters, _detect_device
from spim_registration_tpu.ops.extrema import (
    _gather27, _interior_mask, _pool3, _two_stage_topk, find_peaks,
    subpixel_localize)
from spim_registration_tpu.ops.gaussian import difference_of_gaussian

print("devices:", jax.devices(), file=sys.stderr)

SHAPE = (256, 256, 256)
rng = np.random.default_rng(5)
from spim_registration_tpu.utils.simulation import render_beads
pts = rng.uniform(8, SHAPE[0] - 8, size=(400, 3))
vol = render_beads(pts, SHAPE, sigma=1.5) \
    + rng.normal(0, 0.005, SHAPE).astype(np.float32)
vd = jnp.asarray(vol)
float(jnp.sum(vd))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    s = float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        s = float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        walls.append(time.time() - t0)
    print(f"{name:34s} {min(walls)*1e3:8.2f} ms", file=sys.stderr)
    return out


@jax.jit
def stage_dog(v):
    return difference_of_gaussian(v, (1.8,) * 3, (2.14,) * 3)


@jax.jit
def stage_score(dog):
    cand = (dog >= _pool3(dog, jax.lax.max, -jnp.inf))
    cand &= (jnp.abs(dog) >= 0.004) & _interior_mask(dog.shape)
    return jnp.where(cand, jnp.abs(dog), -jnp.inf).reshape(-1)


@partial(jax.jit, static_argnames=("k",))
def stage_topk(score, k=8192):
    return _two_stage_topk(score, k)


@jax.jit
def stage_strict(dog, idx):
    flat = dog.reshape(-1)
    nb = _gather27(flat, idx, dog.shape[1] * dog.shape[2], dog.shape[2])
    center = nb[:, 13]
    others = jnp.concatenate([nb[:, :13], nb[:, 14:]], axis=1)
    return jnp.all(center[:, None] > others, axis=1)


params = DoGParameters(sigma=1.8, threshold=0.004)

import os
STAGES = os.environ.get("STAGES", "topk,find,sub,full").split(",")

dog = stage_dog(vd)
float(jnp.sum(dog))
if "dog" in STAGES:
    dog = timeit("dog conv", stage_dog, vd)
score = stage_score(dog)
float(jnp.sum(score))
if "score" in STAGES:
    score = timeit("candidate mask+score", stage_score, dog)
if "topk" in STAGES:
    vals_idx = timeit("two-stage topk k=8192", stage_topk, score)
else:
    vals_idx = stage_topk(score)
idx = vals_idx[1]
if "strict" in STAGES:
    timeit("strictness gather27", stage_strict, dog, idx)

coords = jnp.stack(jnp.unravel_index(jnp.clip(idx, 0, None), dog.shape),
                   -1).astype(jnp.int32)
valid = jnp.isfinite(vals_idx[0])
if "sub" in STAGES:
    timeit("subpixel_localize", subpixel_localize, dog, coords, valid)
if "find" in STAGES:
    timeit("find_peaks fused", lambda d: find_peaks(d, 0.004, 8192), dog)
if "full" in STAGES:
    timeit("FULL _detect_device", lambda v: _detect_device(v, params), vd)

# host transfer of the packed result
if "full" in STAGES:
    packed = _detect_device(vd, params)
    float(jnp.sum(packed))
    walls = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(_detect_device(vd, params))
        walls.append(time.time() - t0)
    print(f"{'FULL + packed np.asarray':34s} {min(walls)*1e3:8.2f} ms",
          file=sys.stderr)
