"""xprof self-time table of the lowrank RL engine (the tool that drove
the r4 +32% chunk fix and the r5 z-major layout work).

Captures a jax.profiler trace of one steady-state 20-iteration engine
run on the bench fixtures and prints per-op device self-times summed
from the xplane protobuf (TPU op lines), ranked. Usage:

    python examples/profile_rl_engine.py [backend=lowrank] [shape=256]
"""
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


def capture(run, outdir):
    import jax
    import jax.numpy as jnp

    jax.profiler.start_trace(outdir)
    out = run()
    float(jnp.sum(out))
    jax.profiler.stop_trace()


def summarize(outdir, top=25):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    tot = defaultdict(float)
    for p in glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                if "XLA Op" not in line.name and "Ops" not in line.name \
                        and line.name != "XLA TraceMe":
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    tot[(line.name, name)] += ev.duration_ps / 1e9  # ms
    by_line = defaultdict(lambda: defaultdict(float))
    for (ln, name), ms in tot.items():
        key = name.split(".")[0].split("%")[-1]
        by_line[ln][key] += ms
    for ln, d in by_line.items():
        total = sum(d.values())
        log(f"--- line '{ln}' total {total:.1f} ms ---")
        for name, ms in sorted(d.items(), key=lambda kv: -kv[1])[:top]:
            log(f"  {ms:9.2f} ms  {100*ms/total:5.1f}%  {name}")


def main():
    import bench
    from spim_registration_tpu.deconv.lucy_richardson import (
        DeconvolutionRunner,
    )
    from spim_registration_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    backend = sys.argv[1] if len(sys.argv) > 1 else "lowrank"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    psfs, factors = bench.load_psf_fixtures()
    order = list(np.argsort([-1] * 8))  # keep bench's first-4 selection
    psfs = [np.asarray(psfs[i], np.float32) for i in range(4)]
    factors = [factors[i] for i in range(4)]
    prep = bench._make_rl_prep((n, n, n), psfs, factors)
    runner = DeconvolutionRunner(prep, bench._rl_params(backend, 20))
    import jax.numpy as jnp
    float(jnp.sum(runner.run()))  # compile + warm
    t0 = time.time()
    float(jnp.sum(runner.run()))
    log(f"steady wall: {time.time() - t0:.3f}s")
    outdir = tempfile.mkdtemp(prefix="rlprof_")
    capture(runner.run, outdir)
    log(f"trace in {outdir}")
    summarize(outdir)


if __name__ == "__main__":
    main()
