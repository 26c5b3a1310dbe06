"""End-to-end two-view demo: simulate -> detect -> match -> report.

BASELINE config #1 (2-view synthetic bead stack): recovers a known view
transform to sub-pixel accuracy. Run:

    env -u PYTHONPATH JAX_PLATFORMS=cpu python examples/two_view_demo.py
"""

import sys
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_root))
sys.path.insert(0, str(_root / "tests"))

import jax.numpy as jnp  # noqa: E402

from spim_registration_tpu.detect import DoGParameters, detect_beads  # noqa: E402
from spim_registration_tpu.match import PairwiseParameters, match_pair  # noqa: E402
from spim_registration_tpu.models.affine import apply_affine  # noqa: E402
from synth import make_two_view_scene  # noqa: E402


def main():
    rng = np.random.default_rng(1)
    t0 = time.time()
    scene = make_two_view_scene(rng, shape=(128, 128, 128), n_beads=120,
                                max_angle_deg=10.0)
    print(f"[{time.time()-t0:6.2f}s] simulated 2 views of 128^3, 120 beads")

    params = DoGParameters(sigma=1.8, threshold=0.004)
    pts_a, _ = detect_beads(scene["vol_a"], params)
    pts_b, _ = detect_beads(scene["vol_b"], params)
    print(f"[{time.time()-t0:6.2f}s] detected {len(pts_a)} / {len(pts_b)} beads")

    res = match_pair(pts_b, pts_a, PairwiseParameters(model="affine",
                                                      max_points=256))
    print(f"[{time.time()-t0:6.2f}s] matched: {res}")

    true_A = scene["b_to_world"]
    tp = scene["view_b_points"].astype(np.float32)
    mapped = np.asarray(apply_affine(jnp.asarray(res.model, jnp.float32),
                                     jnp.asarray(tp)))
    err = np.linalg.norm(mapped - (tp @ true_A[:, :3].T + true_A[:, 3]), axis=1)
    print(f"transform error vs ground truth: mean={err.mean():.3f}px "
          f"max={err.max():.3f}px")
    assert res.valid and err.mean() < 0.5
    print("OK")


if __name__ == "__main__":
    main()
