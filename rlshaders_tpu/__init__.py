"""rlshaders_tpu — a TPU-native physically-based shading + rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the rlShaders
Arnold plugin (reference: /root/reference): GGX microfacet BRDF/BSDF with VNDF
importance sampling, the Disney principled BRDF, and Burley normalized-diffusion
BSSRDF skin shading — plus the full renderer stack the reference delegated to
the Arnold SDK host (scene parsing, BVH ray tracing, light sampling with MIS,
a wavefront path-tracing integrator, EXR I/O, and a golden-image testsuite).

Design: everything inside the render loop is pure, batched, jit-compiled JAX
operating on SoA buffers; hot kernels are fused Pallas TPU kernels; multi-chip
scaling is data-parallel sharding of the path/pixel batch over a
`jax.sharding.Mesh` (see `rlshaders_tpu.parallel`).
"""

import os as _os

# The fused render programs embed Pallas trace kernels inside larger jitted
# stages; Mosaic's compile-time scoped-vmem ACCOUNTING (not actual VMEM use —
# ray/output blocks stream per grid step) rejects those embeddings at the
# default 16MB. Raise the limit before the TPU backend initializes; harmless
# on CPU. Appended (not overwritten) so user-provided flags survive.
_flags = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "xla_tpu_scoped_vmem_limit_kib" not in _flags:
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _flags + " --xla_tpu_scoped_vmem_limit_kib=131072"
    ).strip()
del _os, _flags

__version__ = "0.1.0"
