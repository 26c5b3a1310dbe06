"""Root-cause probe for the 256^3 TPU FFT self-repeat nondeterminism
(VERDICT r3 weak #6 / next #9).

The bench observed: at SHAPE=256^3 the exact-FFT RL engine differs from
its own bit-identical repeat by ~1.4e-3 nrmse after 5 iterations, while
at 192^3 it repeats exactly. This probe isolates WHERE the
nondeterminism enters by running each candidate op twice on identical
inputs and reporting the max absolute difference:

  1. rfftn/irfftn round trip at the RL engine's actual padded fft
     shapes (fft_shape for 256^3 + 33-tap kernels -> 3x 320 or similar)
  2. the same at the 192^3 gate shapes
  3. a single fft_convolve call
  4. one full RL view-update

Bitwise-equal repeats print 0.0; any nonzero difference marks the op
whose TPU lowering is nondeterministic (e.g. a multi-pass FFT
decomposition with non-deterministic accumulation order).

Run on the real chip:  python examples/fft_determinism_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_root = Path(__file__).resolve().parent.parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from spim_registration_tpu.ops.fftconv import (
        fft_convolve,
        pad_shape_for,
        prepare_kernel_fft,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def repeat_diff(fn, *args):
        """Run fn twice on the SAME device inputs; max |difference|.
        The diff reduces ON DEVICE (complex64 D2H is unimplemented on
        the axon tunnel; a scalar readback also fences reliably)."""
        a = fn(*args)
        b = fn(*args)
        return float(jnp.max(jnp.abs(a - b)))

    results = {}
    for name, img_shape in (("perf_256", (256, 256, 256)),
                            ("gate_192", (192, 192, 192))):
        kshape = (33, 33, 33)  # the bench fixtures' compound support
        fshape = pad_shape_for(img_shape, kshape)
        x = jnp.asarray(rng.normal(size=img_shape).astype(np.float32))
        k = rng.random(kshape).astype(np.float32)
        k /= k.sum()
        kf = prepare_kernel_fft(jnp.asarray(k), fshape)

        rf = jax.jit(lambda v: jnp.fft.rfftn(v, s=fshape))
        d_f = repeat_diff(rf, x)
        print(f"{name}: rfftn repeat-diff {d_f:.3e}", file=sys.stderr)
        spec = rf(x)
        irf = jax.jit(lambda s: jnp.fft.irfftn(s, s=fshape))
        d_i = repeat_diff(irf, spec)
        print(f"{name}: irfftn repeat-diff {d_i:.3e}", file=sys.stderr)
        # kf must be an ARGUMENT: a closed-over complex device array gets
        # materialized as an mlir constant (complex D2H: unimplemented
        # on the tunnel)
        conv = jax.jit(lambda v, k: fft_convolve(
            v, None, kernel_fft=k, fft_shape=fshape))
        d_c = repeat_diff(conv, x, kf)
        results[name] = dict(fft_shape=list(fshape), rfftn=d_f,
                             irfftn=d_i, conv=d_c)
        print(f"{name} fshape={fshape}: rfftn repeat-diff {d_f:.3e}, "
              f"irfftn {d_i:.3e}, full conv {d_c:.3e}", file=sys.stderr)

    # sweep z-size factorizations at fixed y/x to pin the decomposition:
    # 320 = 2^6*5, 384 = 2^7*3, 375 = 3*5^3, 360 = 2^3*3^2*5 ...
    for n in (256, 270, 288, 300, 320, 324, 360, 375, 384, 400, 405):
        fs = (n, 320, 320)
        x = jnp.asarray(
            rng.normal(size=(n, 320, 320)).astype(np.float32))
        rf = jax.jit(lambda v, fs=fs: jnp.fft.irfftn(
            jnp.fft.rfftn(v, s=fs), s=fs))
        d = repeat_diff(rf, x)
        results[f"roundtrip_z{n}"] = d
        print(f"rfftn+irfftn roundtrip z={n}: repeat-diff {d:.3e}",
              file=sys.stderr)

    # INNERMOST-axis sweep at ~30M elements (the failure regime): the
    # r5 measurement that fixed the policy. Only 288 is dirty — 256,
    # 270, 300, 320, 360, 384, 400, 432, 480, 512, 576, 640 all
    # bit-repeat (even 576 = 2*288).
    for inner in (256, 270, 288, 300, 320, 384, 512, 576, 640):
        z = ((int(np.ceil(30e6 / (320 * inner))) + 7) // 8) * 8
        fs = (z, 320, inner)
        x = jnp.asarray(rng.normal(size=fs).astype(np.float32))
        rt = jax.jit(lambda v, fs=fs: jnp.fft.irfftn(
            jnp.fft.rfftn(v, s=fs), s=fs))
        d = repeat_diff(rt, x)
        results[f"innermost_{inner}"] = d
        print(f"innermost {inner} at {fs} (~30M): repeat-diff {d:.3e}",
              file=sys.stderr)

    # POLICY ASSERTION: every shape `fft_shape_for`/`pad_shape_for` can
    # pick at deployment scales must bit-repeat (the policy blocklists
    # 288; everything it returns here must measure 0.0).
    policy_fail = []
    for img, kshape in (((256, 256, 256), (33, 33, 33)),
                        ((512, 512, 512), (33, 33, 33)),
                        ((384, 384, 384), (19, 19, 19))):
        fs = pad_shape_for(img, kshape)
        assert fs[-1] not in (288,), fs
        x = jnp.asarray(rng.normal(size=fs).astype(np.float32))
        rt = jax.jit(lambda v, fs=fs: jnp.fft.irfftn(
            jnp.fft.rfftn(v, s=fs), s=fs))
        d = repeat_diff(rt, x)
        results[f"policy_{img[0]}"] = dict(fft_shape=list(fs), diff=d)
        status = "OK" if d == 0.0 else "POLICY VIOLATION"
        print(f"policy shape {img} -> {fs}: repeat-diff {d:.3e} {status}",
              file=sys.stderr)
        if d != 0.0:
            policy_fail.append(fs)

    import json

    print(json.dumps(results))
    if policy_fail:
        print(f"POLICY FAILURE: {policy_fail}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
