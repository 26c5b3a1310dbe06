"""xprof device-time comparison of the DoG detection program, f32 vs
bf16 conv (VERDICT r4 weak #6: the r4 bf16 measurement compared
transfer-dominated batch WALLS, not the device program the bf16 conv
was built to speed up).

Prints per-op device self-times for both dtypes at the bench scene
shape, plus steady walls. Decides the `conv_dtype` default from the
conv-stage device time, not tunnel noise.

    python examples/profile_rl_engine.py  # RL twin of this tool
    python examples/profile_detect_dtype.py [n=256] [views=8]
"""
import dataclasses
import glob
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_root))


def log(m):
    print(m, file=sys.stderr, flush=True)


def summarize(outdir, top=10):
    import tensorflow.tsl.profiler.protobuf.xplane_pb2 as xplane_pb2

    tot = defaultdict(float)
    for p in glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if plane.name != "/device:TPU:0":
                continue
            md = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = md[ev.metadata_id].name
                    if name.startswith("%while"):
                        continue
                    tot[name.split(" = ")[0].split(".")[0]] += \
                        ev.duration_ps / 1e9
    total = sum(tot.values())
    log(f"  device total {total:.1f} ms")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        log(f"    {v:8.2f} ms {100 * v / total:5.1f}%  {k}")
    return total, dict(tot)


def main():
    import jax.numpy as jnp

    from spim_registration_tpu.detect.dog import (
        DoGParameters,
        _detect_device_batch,
    )
    from spim_registration_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    from spim_registration_tpu.utils.simulation import render_beads

    enable_persistent_cache()
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(5)
    pts = rng.uniform(8, n - 8, size=(400, 3))
    vol = render_beads(pts, (n, n, n), sigma=1.5) \
        + rng.normal(0, 0.005, (n, n, n)).astype(np.float32)
    vols = jnp.asarray(np.stack([vol] * V))

    results = {}
    for dtype in ("float32", "bfloat16"):
        params = DoGParameters(sigma=1.8, threshold=0.006,
                               conv_dtype=dtype)
        out = _detect_device_batch(vols, params)
        float(jnp.sum(out[0]))
        walls = []
        for _ in range(5):
            t0 = time.time()
            out = _detect_device_batch(vols, params)
            float(jnp.sum(out[0]))
            walls.append(time.time() - t0)
        log(f"{dtype}: steady batch wall {np.median(walls) * 1e3:.1f} ms "
            f"({['%.0f' % (w * 1e3) for w in walls]})")
        outdir = tempfile.mkdtemp(prefix=f"dog_{dtype}_")
        jax.profiler.start_trace(outdir)
        out = _detect_device_batch(vols, params)
        float(jnp.sum(out[0]))
        jax.profiler.stop_trace()
        log(f"{dtype}: trace {outdir}")
        results[dtype] = summarize(outdir)

    t_f32, t_bf16 = results["float32"][0], results["bfloat16"][0]
    log(f"DEVICE-TIME VERDICT: f32 {t_f32:.1f} ms vs bf16 {t_bf16:.1f} ms "
        f"({t_f32 / max(t_bf16, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
