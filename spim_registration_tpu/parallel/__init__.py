"""Multi-chip parallelism: mesh, halo exchange, sharded kernels.

The layer the reference lacks entirely (SURVEY.md sections 2.8/2.11/5):
its CUDA `Block`/`BlockGenerator` + per-timepoint cluster jobs become a
`jax.sharding.Mesh` with z-sharded volumes, `ppermute` halo exchange over
ICI, and `psum` reductions — the ring-attention analog for huge volumes.
"""

from spim_registration_tpu.parallel.halo import halo_exchange_z  # noqa: F401
from spim_registration_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_from_spec,
)
from spim_registration_tpu.parallel.sharded_detect import (  # noqa: F401
    sharded_detect_beads,
)
from spim_registration_tpu.parallel.sharded import (  # noqa: F401
    sharded_deconvolution_runner,
    sharded_deconvolve,
    sharded_dog,
    sharded_fft_convolve,
    sharded_fuse_views,
    sharded_gaussian_blur,
)
