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

__version__ = "0.1.0"
