"""Backend/platform introspection helpers.

Trace-time code (kernel selection in `ops.extrema`, the lowrank fused
conv) must decide between Pallas TPU kernels and XLA fallbacks. The
naive `jax.devices()[0].platform` is wrong under
`jax.default_device(cpu)` on a TPU-attached process (a common pattern:
run small fixture prep on the host CPU backend while the chip holds the
real workload) — the computation runs on CPU but the check still says
TPU, and the Pallas call fails with "Only interpret mode is supported
on CPU backend".
"""

from __future__ import annotations


def effective_platform() -> str:
    """The platform jit-traced computations will actually target: the
    `jax.default_device` override's platform when set, else the default
    backend's."""
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        p = getattr(dev, "platform", dev)
        return str(p)
    return jax.devices()[0].platform


def is_tpu_backend() -> bool:
    return effective_platform() in ("tpu", "axon")
